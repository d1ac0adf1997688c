"""FLUX.1-Kontext adapter (image→image editing RL).

TPU-native re-design of the reference Kontext adapter
(``src/flow_factory/models/flux/flux1_kontext.py``): condition image(s) are
VAE-encoded, packed, and CONCATENATED to the target token sequence; their
RoPE ids carry a distinct first-axis coordinate so attention can tell target
from condition tokens; the velocity is read off the target slice only.

Supports multi-reference conditioning (``images`` lists — the
``multi_ref_image`` dataset contract) by concatenating every condition
image's packed tokens.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import I2ISample
from ...utils.media import standardize_image_batch
from ..abc import finish_rollout
from ..vae import AutoencoderKL
from .adapter import Flux1Adapter

logger = logging.getLogger(__name__)

def _pad_cond_rows(lat_rows, id_rows):
    """Pad ragged per-record condition token sequences to the batch max.

    XLA needs static shapes; records with fewer reference images get
    zero tokens with ids[:, 0] = -1 (a coordinate no real token uses).
    """
    import numpy as np

    max_len = max(r.shape[0] for r in lat_rows)
    lats, ids = [], []
    for lat, rid in zip(lat_rows, id_rows):
        pad = max_len - lat.shape[0]
        if pad:
            lat = np.concatenate([lat, np.zeros((pad, lat.shape[1]), lat.dtype)], axis=0)
            pad_ids = np.full((pad, 3), -1.0, np.float32)
            rid = np.concatenate([rid, pad_ids], axis=0)
        lats.append(lat)
        ids.append(rid)
    return np.stack(lats), np.stack(ids)


class Flux1KontextAdapter(Flux1Adapter):
    sample_class = I2ISample
    embed_keys = (
        "prompt_embeds",
        "pooled_prompt_embeds",
        "img_ids",
        "txt_ids",
        "cond_latents",
        "cond_ids",
    )

    # ------------------------------------------------------------------
    # Condition-image encoding (stage-1 preprocessing)
    # ------------------------------------------------------------------
    def encode_image(self, images_nchw: np.ndarray) -> np.ndarray:
        """(B, 3, H, W) in [0,1] → packed latent tokens (B, L, 4c), fp32."""
        def _encode(params, img):
            z = self.modules["vae"].apply(
                {"params": params}, img * 2.0 - 1.0, None, sample=False,
                method=AutoencoderKL.encode,
            )
            z = jnp.transpose(z, (0, 2, 3, 1)).astype(jnp.float32)
            return self.pack_latents(z)

        out = jax.jit(_encode)(self.params["vae"], jnp.asarray(images_nchw, jnp.float32))
        return np.asarray(jax.device_get(out))

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out = super().preprocess_func(batch, **kwargs)
        images = batch.get("images") or batch.get("image")
        if images is not None:
            # each record may hold ONE or MANY reference images
            lat_rows, id_rows = [], []
            for per_record in images:
                refs = per_record if isinstance(per_record, list) else [per_record]
                toks, ids = [], []
                for r_i, ref in enumerate(refs):
                    arr = standardize_image_batch(ref, output_type="np")  # (1,3,H,W)
                    lat = self.encode_image(arr)[0]  # (L, C)
                    h = arr.shape[2] // self.vae_downscale
                    w = arr.shape[3] // self.vae_downscale
                    rid = self.latent_image_ids(h, w).copy()
                    rid[:, 0] = 1.0 + r_i  # condition stream coordinate
                    toks.append(lat)
                    ids.append(rid)
                lat_rows.append(np.concatenate(toks, axis=0))
                id_rows.append(np.concatenate(ids, axis=0).astype(np.float32))
            out["cond_latents"], out["cond_ids"] = _pad_cond_rows(lat_rows, id_rows)
        return out

    # ------------------------------------------------------------------
    # Velocity: concat condition tokens, slice target velocity
    # ------------------------------------------------------------------
    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        model = self.modules["transformer"]
        dt = self.component_configs["transformer"].compute_dtype
        B, L, _ = latents.shape
        guidance = jnp.broadcast_to(jnp.asarray(guidance_scale, jnp.float32), (B,))
        img_ids = embeds["img_ids"]
        img_ids = img_ids[0] if img_ids.ndim == 3 else img_ids
        txt_ids = embeds["txt_ids"]
        txt_ids = txt_ids[0] if txt_ids.ndim == 3 else txt_ids

        x = latents
        if "cond_latents" in embeds:
            cond = embeds["cond_latents"].astype(latents.dtype)
            cond_ids = embeds["cond_ids"]
            cond_ids = cond_ids[0] if cond_ids.ndim == 3 else cond_ids
            x = jnp.concatenate([latents, cond], axis=1)
            img_ids = jnp.concatenate([img_ids, cond_ids], axis=0)

        v = model.apply(
            {"params": merged},
            x.astype(dt),
            t,
            embeds["prompt_embeds"],
            embeds["pooled_prompt_embeds"],
            img_ids,
            txt_ids,
            guidance,
        )
        return v[:, :L].astype(jnp.float32)

    # ------------------------------------------------------------------
    def inference(self, images=None, cond_latents=None, cond_ids=None, **kwargs):
        """Rollout with condition tokens threaded through ``extra embeds``."""
        extra_embeds = {}
        if cond_latents is None and images is not None:
            pre = self.preprocess_func({"images": images})
            cond_latents, cond_ids = pre["cond_latents"], pre["cond_ids"]
        if cond_latents is not None:
            extra_embeds["cond_latents"] = jnp.asarray(cond_latents, jnp.float32)
            extra_embeds["cond_ids"] = jnp.asarray(
                cond_ids if cond_ids is not None else 0.0, jnp.float32
            )
        out = super().inference(extra_embeds=extra_embeds, **kwargs)
        if cond_latents is None:
            return out

        def _post(samples):
            for i, s in enumerate(samples):
                s.extra_kwargs["cond_latents"] = np.asarray(cond_latents[i], np.float32)
                s.extra_kwargs["cond_ids"] = np.asarray(cond_ids[i], np.float32)
                if images is not None:
                    per = images[i] if isinstance(images[i], list) else [images[i]]
                    s.images = [standardize_image_batch(p, output_type="np")[0] for p in per]
                    s._unique_id = None  # recompute with condition identity
            return samples

        return finish_rollout(out, _post)
