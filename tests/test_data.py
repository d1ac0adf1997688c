"""Dataset loading + fingerprint-cached preprocessing."""
import os

import numpy as np
import pytest

from flow_factory_tpu.data import (
    GeneralDataset,
    collate,
    compute_fingerprint,
    load_raw_records,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_load_txt_and_jsonl(tmp_path):
    recs = load_raw_records(os.path.join(FIXTURES, "tiny_prompts", "train.txt"))
    assert len(recs) == 6 and recs[0]["prompt"].startswith("a photo")

    p = tmp_path / "d.jsonl"
    p.write_text('{"prompt": "x", "negative_prompt": "y"}\n"bare string"\n')
    recs = load_raw_records(str(p))
    assert recs[0]["negative_prompt"] == "y" and recs[1]["prompt"] == "bare string"

    recs = load_raw_records(str(p), cutoff=1)
    assert len(recs) == 1


def test_fingerprint_sensitivity():
    f = lambda b: b
    g = lambda b: {**b}
    fp1 = compute_fingerprint("d", "train", None, f, {"a": 1})
    assert fp1 == compute_fingerprint("d", "train", None, f, {"a": 1})
    assert fp1 != compute_fingerprint("d", "train", None, f, {"a": 2})
    assert fp1 != compute_fingerprint("d", "test", None, f, {"a": 1})
    assert fp1 != compute_fingerprint("d", "train", None, g, {"a": 1})
    assert fp1 != compute_fingerprint("d", "train", None, f, {"a": 1}, extra=("m2",))


def test_preprocess_cache_roundtrip(tmp_path):
    calls = {"n": 0}

    def pre(batch):
        calls["n"] += 1
        return {
            "emb": np.stack([np.full((3,), len(p), np.float32) for p in batch["prompt"]]),
            "tag": [p[:1] for p in batch["prompt"]],
        }

    ds = GeneralDataset(os.path.join(FIXTURES, "tiny_prompts", "train.txt"))
    out = ds.preprocess(pre, str(tmp_path), process_index=0, process_count=1, batch_size=3)
    assert calls["n"] == 2
    item = out[0]
    assert item["emb"].shape == (3,) and item["tag"] == item["prompt"][0]
    assert item["emb"][0] == len(item["prompt"])

    # cache hit: no new calls
    ds2 = GeneralDataset(os.path.join(FIXTURES, "tiny_prompts", "train.txt"))
    out2 = ds2.preprocess(pre, str(tmp_path), process_index=0, process_count=1, batch_size=3)
    assert calls["n"] == 2
    np.testing.assert_array_equal(out2[3]["emb"], out[3]["emb"])


def test_collate_ragged_aware():
    items = [
        {"a": np.ones((2, 2)), "p": "x", "r": np.ones((2,))},
        {"a": np.zeros((2, 2)), "p": "y", "r": np.ones((3,))},
    ]
    out = collate(items)
    assert out["a"].shape == (2, 2, 2)
    assert out["p"] == ["x", "y"]
    assert isinstance(out["r"], list)  # ragged stays a list


def test_distributed_shard_consolidate_and_crash_resume(tmp_path):
    """Two simulated processes build shards; consolidation + crash resume."""
    calls = {"n": 0}

    def pre(batch):
        calls["n"] += 1
        return {"emb": np.stack([np.full((2,), len(p), np.float32) for p in batch["prompt"]])}

    path = os.path.join(FIXTURES, "tiny_prompts", "train.txt")
    # process 1 builds its part first (no consolidation: rank != 0 path)
    ds1 = GeneralDataset(path)
    try:
        ds1.preprocess(pre, str(tmp_path), process_index=1, process_count=2, batch_size=4)
    except Exception:
        pass  # barrier/consolidation may not complete without process 0
    calls_after_p1 = calls["n"]
    assert calls_after_p1 > 0

    # process 0 reuses p1's part file (crash resume) and consolidates
    ds0 = GeneralDataset(path)
    out = ds0.preprocess(pre, str(tmp_path), process_index=0, process_count=2, batch_size=4)
    assert len(out) == 6
    for i in range(6):
        assert out[i]["emb"][0] == len(out[i]["prompt"])

    # cache hit afterwards: no new preprocessing calls
    n = calls["n"]
    ds2 = GeneralDataset(path)
    ds2.preprocess(pre, str(tmp_path), process_index=0, process_count=2, batch_size=4)
    assert calls["n"] == n


def test_media_loading_from_jsonl(tmp_path):
    """Image-path records resolve to canonical arrays for preprocess_func
    (the bundled multi_ref_image dataset ships real asset files)."""
    seen = {}

    def pre(batch):
        seen["images"] = batch["images"]
        return {}

    ds = GeneralDataset(
        os.path.join(os.path.dirname(__file__), "..", "dataset", "multi_ref_image", "train.jsonl")
    )
    ds.preprocess(pre, str(tmp_path), process_index=0, process_count=1, batch_size=4)
    assert "images" in seen and len(seen["images"]) >= 1
    img = np.asarray(seen["images"][0][0])  # first record, first reference
    assert img.ndim == 3 and img.shape[0] == 3  # (3, H, W) canonical
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0


def test_sequential_loader_pads_to_replica_multiple():
    """Eval loader: PROCESS-strided slices, tail batch padded by repeating
    the last row up to the local-replica multiple (so `shard_batch` always
    divides on a multi-device mesh); `_num_pad` tells the caller how many
    trailing duplicates to drop."""
    from flow_factory_tpu.data import SequentialLoader

    class _DS(list):
        pass

    ds = _DS({"prompt": f"p{i}"} for i in range(5))
    # 1 process feeding 4 local replicas, per-device batch 1 → batch 4
    loader = SequentialLoader(ds, batch_size=4, rank=0, world=1, pad_to=4)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["_num_pad"] == 0 and len(batches[0]["_indices"]) == 4
    # tail: 1 real row + 3 pad duplicates of it
    assert batches[1]["_num_pad"] == 3
    assert batches[1]["_indices"] == [4, 4, 4, 4]
    assert batches[1]["prompt"] == ["p4"] * 4
    # 2-process stride: disjoint coverage of the dataset
    got = []
    for r in (0, 1):
        for b in SequentialLoader(ds, batch_size=4, rank=r, world=2, pad_to=4):
            got += [i for i in b["_indices"][: len(b["_indices"]) - b["_num_pad"]]]
    assert sorted(got) == [0, 1, 2, 3, 4]
