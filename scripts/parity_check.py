"""L1-L4 parity harness CLI (reference parity_testing.md methodology).

One command per family:

    # golden regression (CI): record once, check on every change
    python scripts/parity_check.py --model-type sd3-5 --path tiny \
        --record tests/goldens/sd35.npz
    python scripts/parity_check.py --model-type sd3-5 --path tiny \
        --check tests/goldens/sd35.npz

    # upstream parity (when real diffusers weights exist):
    python scripts/parity_check.py --model-type sd3-5 \
        --path /ckpts/stable-diffusion-3.5-medium \
        --record /tmp/ours.npz
    # then on a torch box: scripts/dump_reference_activations.py writes
    # /tmp/theirs.npz from the upstream pipeline on the same probe inputs;
    python scripts/parity_check.py --compare /tmp/ours.npz /tmp/theirs.npz

Levels: 1=config, 2=component forwards, 3=seed-matched single step,
4=full-loop generation. Exit code 0 = pass.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_config(model_type: str, path: str, resolution: int = 32,
                steps: int = 4, strict_import: bool = False):
    from flow_factory_tpu.hparams.args import Arguments

    return Arguments.from_dict({
        "data": {"dataset_dir": os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "fixtures", "tiny_prompts")},
        "model": {"model_type": model_type, "model_name_or_path": path,
                  "finetune_type": "lora", "lora_rank": 2, "lora_alpha": 4,
                  "attn_backend": "native", "master_dtype": "float32",
                  "inference_dtype": "float32",
                  "strict_import": strict_import},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": steps - 1,
                      "sde_steps": list(range(steps - 1))},
        "train": {"trainer_type": "grpo", "resolution": resolution,
                  "num_inference_steps": steps, "guidance_scale": 1.0,
                  "per_device_batch_size": 1, "group_size": 1,
                  "unique_sample_num_per_epoch": 1,
                  "latent_storage_dtype": "fp32", "seed": 0},
        "log": {"run_name": "parity"},
        "rewards": [],
    })


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-type", help="adapter registry key (e.g. sd3-5)")
    ap.add_argument("--path", default="tiny",
                    help="'tiny' (seeded random init) or a diffusers checkpoint dir")
    ap.add_argument("--levels", default="1,2,3,4")
    ap.add_argument("--resolution", type=int, default=32)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--record", metavar="OUT.npz", help="record goldens")
    ap.add_argument("--check", metavar="GOLDEN.npz", help="check against goldens")
    ap.add_argument("--compare", nargs=2, metavar=("A.npz", "B.npz"),
                    help="compare two recorded npz files (no model build)")
    ap.add_argument("--tol-l2", type=float, default=None)
    ap.add_argument("--tol-l3", type=float, default=None)
    ap.add_argument("--tol-l4", type=float, default=None)
    ap.add_argument("--lax-import", action="store_true",
                    help="allow key-map gaps when loading a real checkpoint "
                         "(default for checkpoint dirs is STRICT: any "
                         "unmatched key / init-left leaf aborts with the "
                         "actionable list)")
    args = ap.parse_args()

    import jax

    # goldens must be backend-stable: run on CPU unless explicitly requested
    # (PARITY_BACKEND=tpu for real-chip comparisons)
    if os.environ.get("PARITY_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    tols = {}
    for lvl, v in (("L2", args.tol_l2), ("L3", args.tol_l3), ("L4", args.tol_l4)):
        if v is not None:
            tols[lvl] = v

    if args.compare:
        import numpy as np

        from flow_factory_tpu.parity import compare_records
        from flow_factory_tpu.parity.harness import DEFAULT_TOLERANCES

        a = dict(np.load(args.compare[0]))
        b = dict(np.load(args.compare[1]))
        t = dict(DEFAULT_TOLERANCES)
        t.update(tols)
        rep = compare_records(a, b, t)
        print(rep.summary())
        return 0 if rep.passed else 1

    if not args.model_type:
        ap.error("--model-type required unless --compare")

    from flow_factory_tpu.models import load_adapter
    from flow_factory_tpu.parallel.dist import set_world_size_override
    from flow_factory_tpu.parity import ParityHarness

    set_world_size_override(1)
    strict = os.path.isdir(args.path) and not args.lax_import
    config = make_config(args.model_type, args.path, args.resolution,
                         args.steps, strict_import=strict)
    adapter = load_adapter(config)
    levels = tuple(int(x) for x in args.levels.split(","))
    harness = ParityHarness(adapter, levels=levels)

    if args.record:
        harness.save(args.record)
        print(f"recorded goldens → {args.record}")
        return 0
    if args.check:
        rep = harness.check(args.check, tolerances=tols)
        print(rep.summary())
        return 0 if rep.passed else 1
    ap.error("one of --record/--check/--compare required")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
