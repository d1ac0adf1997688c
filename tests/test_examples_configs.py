"""Every shipped example YAML must parse through the typed config system
(schema, per-algorithm argument subclasses, geometry alignment)."""
import glob
import os

import pytest

from flow_factory_tpu.hparams.args import Arguments

ROOT = os.path.join(os.path.dirname(__file__), "..", "examples")
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "**", "*.yaml"), recursive=True))


def test_examples_exist():
    assert len(CONFIGS) >= 98, f"expected >=98 example configs, found {len(CONFIGS)}"


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, ROOT))
def test_example_config_parses(path):
    cfg = Arguments.load_from_yaml(path)
    assert cfg.model_args.model_type
    assert cfg.training_args.trainer_type
    # geometry invariant enforced by _align_batch_geometry
    ta = cfg.training_args
    assert ta.unique_sample_num_per_epoch > 0 and ta.group_size > 0
