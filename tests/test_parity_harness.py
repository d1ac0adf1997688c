"""Golden-regression parity checks (L1-L4 harness; docs/parity.md).

Each family's goldens under ``tests/goldens/`` were recorded from the
deterministic seeded tiny adapter via::

    python scripts/parity_check.py --model-type <key> --path tiny \
        --record tests/goldens/<name>.npz

Any change to a transformer graph, scheduler formula, VAE graph, encoder,
or the rollout scan produces a nonzero max-abs-diff here. After an
INTENTIONAL change, re-record and commit the golden.

Only a fast subset runs in CI (one image family, one video, one AV); the
harness itself is exercised for record→check round-trip exactness.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

FAMILIES = [
    ("sd3-5", "sd35.npz"),
    ("wan2-t2v", "wan2_t2v.npz"),
    ("ltx2-t2av", "ltx2_t2av.npz"),
    # conditioned families (probe condition media — harness.py
    # probe_condition_kwargs): one image-conditioned, one video-conditioned
    ("flux1-kontext", "flux1_kontext.npz"),
    ("wan2-v2v", "wan2_v2v.npz"),
]


def _harness(model_type):
    from parity_check import make_config

    from flow_factory_tpu.models import load_adapter
    from flow_factory_tpu.parity import ParityHarness

    config = make_config(model_type, "tiny")
    adapter = load_adapter(config)
    return ParityHarness(adapter)


@pytest.mark.parametrize("model_type,golden", FAMILIES)
def test_family_matches_committed_golden(model_type, golden):
    path = os.path.join(GOLDENS, golden)
    if not os.path.exists(path):
        pytest.skip(f"no golden recorded for {model_type}")
    h = _harness(model_type)
    report = h.check(path)
    assert report.passed, report.summary()
    # CPU XLA is deterministic for these graphs: goldens must match exactly
    assert all(d == 0.0 for d in report.max_diffs.values()), report.summary()


def test_compare_records_flags_mismatch():
    from flow_factory_tpu.parity import compare_records

    g = {"L2/x": np.zeros(4, np.float32), "L3/y": np.ones(3, np.float32)}
    ok = compare_records(g, {k: v.copy() for k, v in g.items()}, {"L2": 1e-4, "L3": 1e-3})
    assert ok.passed
    bad = {**g, "L2/x": np.full(4, 1e-2, np.float32)}
    rep = compare_records(g, bad, {"L2": 1e-4, "L3": 1e-3})
    assert not rep.passed and any("L2/x" in f for f in rep.failures)
    rep2 = compare_records(g, {"L2/x": g["L2/x"]}, {"L2": 1e-4})
    assert not rep2.passed and rep2.missing == ["L3/y"]
