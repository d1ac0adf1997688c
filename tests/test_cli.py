"""fft-train CLI end-to-end: overrides, training, final checkpoint."""
import os

from flow_factory_tpu.cli import train_cli


def test_cli_one_epoch(tmp_path):
    save_dir = str(tmp_path / "saves")
    train_cli([
        "tests/fixtures/smoke_grpo.yaml",
        "--set", "train.max_epochs=1",
        "--set", f"data.cache_dir={tmp_path / 'cache'}",
        "--set", f"log.save_dir={save_dir}",
        "--set", "log.save_freq=1",
        "--set", "log.run_name=cli_smoke",
    ])
    assert os.path.exists(os.path.join(save_dir, "cli_smoke", "final", "adapter_config.json"))
    assert os.path.exists(os.path.join(save_dir, "cli_smoke", "final", "lora_transformer.safetensors"))
    assert os.path.exists(os.path.join(save_dir, "cli_smoke", "metrics.jsonl"))
