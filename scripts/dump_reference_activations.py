"""Dump upstream (torch/diffusers) activations for L2+ parity comparison.

Run this on a machine with torch + diffusers + real checkpoint weights; it
writes an ``.npz`` with the SAME keys and probe inputs as
``scripts/parity_check.py --record`` so the two can be diffed with
``parity_check.py --compare ours.npz theirs.npz``.

Probe contract (must mirror flow_factory_tpu/parity/harness.py):
  * prompts  = PROBE_PROMPTS, seed = PROBE_SEED
  * L2/encode_prompt/*       — pipeline text encoders on the probe prompt
  * L2/scheduler/sigmas      — scheduler sigma grid for --steps
  * L2/transformer/velocity_latents — one transformer forward at the
    rollout's initial noise latents (seed-matched via the shared generator)
  * L2/vae/decode            — VAE decode of the final generation latents
  * L4/final_latents, L4/decoded — full num_inference_steps generation

Only the subset of keys you dump is compared; the TPU side tolerates
missing keys in --compare mode via --allow-missing.

This script intentionally has NO flow_factory_tpu imports — it runs in a
torch-only environment.
"""
from __future__ import annotations

import argparse

PROBE_SEED = 20260817  # keep in sync with flow_factory_tpu/parity/harness.py
PROBE_PROMPTS = ["a red cube on a blue table"]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipeline", required=True,
                    help="diffusers pipeline class, e.g. StableDiffusion3Pipeline")
    ap.add_argument("--path", required=True, help="checkpoint directory")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import torch

    import diffusers

    cls = getattr(diffusers, args.pipeline)
    pipe = cls.from_pretrained(args.path, torch_dtype=torch.float32)
    rec = {}

    # L2a: text encoders
    with torch.no_grad():
        enc = pipe.encode_prompt(PROBE_PROMPTS, device="cpu") \
            if hasattr(pipe, "encode_prompt") else None
    if enc is not None:
        names = ["prompt_embeds", "negative_prompt_embeds",
                 "pooled_prompt_embeds", "negative_pooled_prompt_embeds"]
        for name, t in zip(names, enc if isinstance(enc, tuple) else [enc]):
            if torch.is_tensor(t):
                rec[f"L2/encode_prompt/{name}"] = t.float().numpy()

    # L2b: scheduler sigma grid
    pipe.scheduler.set_timesteps(args.steps)
    rec["L2/scheduler/sigmas"] = np.asarray(pipe.scheduler.sigmas, np.float32)
    rec["L2/scheduler/timesteps"] = np.asarray(pipe.scheduler.timesteps, np.float32)

    # L4: seeded full-loop generation (+ keep latents for the L2 VAE probe)
    g = torch.Generator().manual_seed(PROBE_SEED)
    with torch.no_grad():
        out = pipe(
            prompt=PROBE_PROMPTS, num_inference_steps=args.steps,
            height=args.resolution, width=args.resolution,
            guidance_scale=1.0, generator=g, output_type="latent",
        )
    lat = out.images if hasattr(out, "images") else out.frames
    lat = lat[0] if isinstance(lat, (list, tuple)) else lat
    rec["L4/final_latents"] = np.asarray(lat, np.float32)
    with torch.no_grad():
        dec = pipe.vae.decode(
            torch.as_tensor(lat)[None] / pipe.vae.config.scaling_factor
        ).sample
    rec["L2/vae/decode"] = dec.float().numpy()

    np.savez_compressed(args.out, **rec)
    print(f"dumped {len(rec)} reference activations → {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
