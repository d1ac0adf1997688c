"""LTX-2 image→audio-video adapter.

TPU-native re-design of the reference I2AV adapter
(``src/flow_factory/models/ltx2/ltx2_i2av.py``), matching its conditioning
mechanism token-for-token in the packed sequence domain:

* the condition image is VAE-encoded and PLANTED in the first-latent-frame
  tokens of the initial latents (reference ``prepare_latents(image=...)``),
* the transformer sees a per-token video timestep — conditioned tokens
  modulate at t=0 (reference ``video_ts = ts·(1 − conditioning_mask)``,
  ``ltx2_i2av.py:858-866``; exact for the binary mask via t/0 embedding
  interpolation in the transformer),
* the video SDE step runs ONLY on generated tokens: conditioned tokens are
  frozen by ``sde_step(token_mask=...)`` and excluded from the log-prob
  (reference frame-slicing, ``ltx2_i2av.py:983-1032``: the scheduler steps
  frames 1: and frame 0 is re-concatenated),
* token replacement inside every forward keeps the conditioned tokens
  exactly clean under storage-dtype round trips.

Everything else (joint scan, dual schedulers, guidance, decode) is
inherited from the T2AV adapter.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import I2AVSample
from ...utils.media import standardize_image_batch
from ..abc import finish_rollout
from .video_vae import LTXVideoVAE
from .t2av import LTX2T2AVAdapter

logger = logging.getLogger(__name__)


class LTX2I2AVAdapter(LTX2T2AVAdapter):
    sample_class = I2AVSample
    embed_keys = (
        "prompt_embeds",
        "negative_prompt_embeds",
        "video_ids",
        "audio_ids",
        "cond_mask",
        "cond_tokens",
    )

    def encode_first_frame(self, images: Sequence[Any], height: int, width: int,
                           num_frames: int) -> np.ndarray:
        """Images → video tokens for the first latent frame, zero elsewhere."""
        arr = standardize_image_batch(list(images), output_type="np")  # (B,3,H,W)
        videos = jnp.asarray(arr[:, None], jnp.float32)  # (B,1,3,H,W)

        def _encode(params, v):
            v = jnp.transpose(v, (0, 2, 1, 3, 4)) * 2.0 - 1.0
            return self.modules["vae"].apply(
                {"params": params}, v, None, False, method=LTXVideoVAE.encode
            ).astype(jnp.float32)

        lat = np.asarray(jax.device_get(jax.jit(_encode)(self.params["vae"], videos)))
        tl, h, w = self.video_token_geometry(height, width, num_frames)
        B = lat.shape[0]
        tokens = np.zeros((B, tl * h * w, self.video_latent_channels), np.float32)
        first = lat[:, 0].reshape(B, h * w, -1)[..., : self.video_latent_channels]
        tokens[:, : h * w] = first
        mask = np.zeros((B, tl * h * w, 1), np.float32)
        mask[:, : h * w] = 1.0
        return tokens, mask

    def _joint_velocity(self, merged, v_lat, a_lat, t, embeds, guidance_scale, do_cfg):
        if "cond_tokens" in embeds:
            # hard-condition the planted tokens every forward; keep
            # cond_mask in embeds — the transformer uses it for the
            # per-token t=0 modulation and sde_step for frame freezing.
            # Replacement is all-or-nothing even for fractional modulation
            # masks (reference frame preservation is all-or-nothing);
            # cond_tokens already carry any noise_scale blend, so rollout
            # and replay see identical values at conditioned positions.
            m = (embeds["cond_mask"] > 0.0).astype(jnp.float32)
            v_lat = v_lat * (1.0 - m) + embeds["cond_tokens"] * m
            embeds = {k: v for k, v in embeds.items() if k != "cond_tokens"}
        return super()._joint_velocity(merged, v_lat, a_lat, t, embeds, guidance_scale, do_cfg)

    def inference(self, images=None, cond_tokens=None, cond_mask=None, **kwargs):
        ta = self.training_args
        height = kwargs.get("height") or ta.height
        width = kwargs.get("width") or ta.width
        num_frames = kwargs.get("num_frames") or int(getattr(ta, "num_frames", 5))
        extra = kwargs.pop("extra_embeds", None) or {}
        if cond_tokens is None and images is not None:
            cond_tokens, cond_mask = self.encode_first_frame(images, height, width, num_frames)
        if cond_tokens is None:
            raise ValueError("LTX2I2AVAdapter.inference needs images or cond_tokens")
        cm_np = np.asarray(cond_mask, np.float32)
        clean_tokens = np.asarray(cond_tokens, np.float32)
        planted_tokens = clean_tokens
        fractional = not np.all((cm_np == 0.0) | (cm_np == 1.0))
        if fractional:
            # Fractional (noise_scale-style) masks require the exact per-token
            # timestep embedding — the t/0 modulation interpolation is only
            # exact for binary masks. Auto-switch rather than silently
            # approximate; refuse if the user explicitly pinned the fast path.
            if not self.per_token_time:
                if self.training_args.extra_kwargs.get("per_token_time") is False:
                    raise ValueError(
                        "Non-binary cond_mask with `per_token_time: false`: "
                        "the t/0 modulation interpolation is only exact for "
                        "binary masks. Remove the explicit `per_token_time: "
                        "false` (or binarize the mask) to proceed."
                    )
                logger.warning(
                    "Non-binary cond_mask: auto-enabling per_token_time "
                    "(exact per-token timestep embedding — reference "
                    "noise_scale semantics, ltx2_i2av.py:858-866). "
                    "CAVEATS (ADVICE r3): (1) samples rolled out EARLIER in "
                    "this run were traced under the binary t/0 path and will "
                    "replay under per_token_time — numerically equivalent "
                    "for their binary masks but not guaranteed bit-identical; "
                    "if a replay buffer holds pre-switch samples, expect a "
                    "possible replay-ratio!=1 blip on those. Set "
                    "`per_token_time: true` up front to avoid mixing. "
                    "(2) jax.clear_caches() drops EVERY compiled executable "
                    "process-wide — through a remote-compile relay the "
                    "re-compiles can take minutes."
                )
                self.training_args.extra_kwargs["per_token_time"] = True
                # per_token_time selects a trace-time code path keyed on
                # `self`; compiled binary-mask traces must not be reused
                jax.clear_caches()
            # Reference noise_scale semantics (prepare_latents with mask
            # value = 1 - noise_scale): the conditioned tokens are planted —
            # and frozen — at clean·cm + noise·(1-cm). Blend host-side with
            # seed-deterministic noise so rollout and training replay both
            # see the identical planted values at conditioned positions.
            rng = np.random.default_rng(
                np.uint64(int(kwargs.get("seed") or self.training_args.seed or 0) + 0x12A5)
            )
            noise = rng.standard_normal(clean_tokens.shape).astype(np.float32)
            planted_tokens = np.where(
                cm_np > 0.0, clean_tokens * cm_np + noise * (1.0 - cm_np), 0.0
            ).astype(np.float32)
        extra["cond_tokens"] = jnp.asarray(planted_tokens, jnp.float32)
        extra["cond_mask"] = jnp.asarray(cm_np, jnp.float32)
        out = super().inference(extra_embeds=extra, **kwargs)

        def _post(samples):
            for i, s in enumerate(samples):
                s.extra_kwargs["cond_mask"] = np.asarray(cm_np[i], np.float32)
                if images is not None:
                    s.images = [standardize_image_batch([images[i]], output_type="np")[0]]
                    s._unique_id = None
                # identity (group key) hashes the CLEAN conditioning tokens —
                # the noise_scale blend is per-seed and must not split groups;
                # replay (embed_keys) reads the planted tokens
                s.extra_kwargs["cond_tokens"] = clean_tokens[i]
                s.unique_id  # force + cache before swapping in planted tokens
                s.extra_kwargs["cond_tokens"] = planted_tokens[i]
            return samples

        return finish_rollout(out, _post)

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out = super().preprocess_func(batch, **kwargs)
        images = batch.get("images") or batch.get("image")
        if images is not None:
            ta = self.training_args
            flat = [im[0] if isinstance(im, list) else im for im in images]
            out["cond_tokens"], out["cond_mask"] = self.encode_first_frame(
                flat, ta.height, ta.width, int(getattr(ta, "num_frames", 5))
            )
        return out
