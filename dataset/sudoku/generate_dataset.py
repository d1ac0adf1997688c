"""Generate the sudoku OCR-RL dataset: solved grids + masked clue puzzles.

Original generator (the reference ships an equivalent script): build valid
solutions by pattern + band/stack shuffling, mask cells down to a clue
count, render the CLUE grid as a PNG (the conditioning image), and emit
jsonl records {prompt, image, clue, puzzle, solution}. The OCR reward then
checks the generated image against `solution`.

    python dataset/sudoku/generate_dataset.py --n 6 --clues 30 75 --out dataset/sudoku
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def make_solution(rng: np.random.Generator) -> np.ndarray:
    base = 3
    side = base * base

    def pattern(r, c):
        return (base * (r % base) + r // base + c) % side

    rows = [g * base + r for g in rng.permutation(base) for r in rng.permutation(base)]
    cols = [g * base + c for g in rng.permutation(base) for c in rng.permutation(base)]
    nums = rng.permutation(np.arange(1, side + 1))
    return np.array([[nums[pattern(r, c)] for c in cols] for r in rows])


def mask_to_clues(sol: np.ndarray, clues: int, rng: np.random.Generator) -> np.ndarray:
    puzzle = sol.copy()
    drop = rng.permutation(81)[: 81 - clues]
    puzzle.flat[drop] = 0
    return puzzle


def render_grid(puzzle: np.ndarray, path: str, cell: int = 16) -> None:
    from PIL import Image, ImageDraw

    side = 9 * cell
    img = Image.new("RGB", (side + 1, side + 1), "white")
    d = ImageDraw.Draw(img)
    for i in range(10):
        w = 2 if i % 3 == 0 else 1
        d.line([(0, i * cell), (side, i * cell)], fill="black", width=w)
        d.line([(i * cell, 0), (i * cell, side)], fill="black", width=w)
    for r in range(9):
        for c in range(9):
            v = int(puzzle[r, c])
            if v:
                d.text((c * cell + cell // 3, r * cell + 2), str(v), fill="black")
    img.save(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--clues", type=int, nargs="+", default=[30, 75])
    ap.add_argument("--out", default=os.path.dirname(__file__) or ".")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(os.path.join(args.out, "assets"), exist_ok=True)
    records = []
    for i in range(args.n):
        clues = int(args.clues[i % len(args.clues)])
        sol = make_solution(rng)
        puz = mask_to_clues(sol, clues, rng)
        fname = f"assets/clue{clues}_{i:04d}.png"
        render_grid(puz, os.path.join(args.out, fname))
        records.append({
            "prompt": "Generate an image showing the solved Sudoku grid, "
                      "with all cells filled with legible digits 1-9.",
            "image": fname,
            "clue": clues,
            "puzzle": "".join(str(int(v)) for v in puz.flat),
            "solution": "".join(str(int(v)) for v in sol.flat),
        })
    n_test = max(1, args.n // 3)
    with open(os.path.join(args.out, "train.jsonl"), "w") as f:
        for r in records[:-n_test]:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(args.out, "test.jsonl"), "w") as f:
        for r in records[-n_test:]:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(records)} records to {args.out}")


if __name__ == "__main__":
    main()
