"""Post-training consumption: generate with a trained LoRA checkpoint.

Counterpart of the reference's ``inference/example_lora.py``: load the
adapter, restore the LoRA tree saved by ``trainer.save_checkpoint``, and
sample deterministically (eval mode → ODE).

    python inference/example_lora.py --config examples/grpo/lora/sd3_5/default.yaml \
        --checkpoint saves/<run>/final --prompt "a red fox in the snow" --out fox.png
"""
from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--prompt", required=True)
    parser.add_argument("--out", default="sample.png")
    parser.add_argument("--steps", type=int, default=28)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from flow_factory_tpu.hparams.args import Arguments
    from flow_factory_tpu.models import load_adapter
    from flow_factory_tpu.utils.media import to_pil_image

    config = Arguments.load_from_yaml(args.config)
    adapter = load_adapter(config)
    adapter.load_checkpoint(args.checkpoint)
    adapter.eval()  # deterministic ODE sampling
    samples = adapter.inference(
        prompt=[args.prompt],
        num_inference_steps=args.steps,
        compute_log_prob=False,
        trajectory_indices=None,
        seed=args.seed,
    )
    to_pil_image(samples[0].image).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
