"""Qwen-Image-Edit-Plus adapter (multi-reference image editing).

TPU-native re-design of the reference adapter
(``src/flow_factory/models/qwen_image/qwen_image_edit_plus.py``): condition
images are VAE-encoded, packed, and concatenated to the target token
sequence with offset RoPE ids (same mechanism as FLUX-Kontext); text
conditioning comes from the Qwen VLM hidden states. The reference
additionally feeds the condition images through the VLM's vision tower; the
latent-concat path carries the visual conditioning here (vision-tower tokens
are a weight-porting follow-up, noted for parity tracking).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import I2ISample
from ...utils.media import standardize_image_batch
from ..vae import AutoencoderKL
from .adapter import QwenImageAdapter

logger = logging.getLogger(__name__)

from ..flux.kontext import _pad_cond_rows


class QwenImageEditPlusAdapter(QwenImageAdapter):
    sample_class = I2ISample
    embed_keys = (
        "prompt_embeds",
        "negative_prompt_embeds",
        "img_ids",
        "txt_ids",
        "cond_latents",
        "cond_ids",
    )

    def encode_image(self, images_nchw: np.ndarray) -> np.ndarray:
        def _encode(params, img):
            z = self.modules["vae"].apply(
                {"params": params}, img * 2.0 - 1.0, None, sample=False,
                method=AutoencoderKL.encode,
            )
            z = jnp.transpose(z, (0, 2, 3, 1)).astype(jnp.float32)
            return self.pack_latents(z)

        out = jax.jit(_encode)(self.params["vae"], jnp.asarray(images_nchw, jnp.float32))
        return np.asarray(jax.device_get(out))

    def _build_cond(self, images: Sequence[Any]):
        lat_rows, id_rows = [], []
        for per_record in images:
            refs = per_record if isinstance(per_record, list) else [per_record]
            toks, ids = [], []
            for r_i, ref in enumerate(refs):
                arr = standardize_image_batch(ref, output_type="np")
                lat = self.encode_image(arr)[0]
                h = arr.shape[2] // self.vae_downscale
                w = arr.shape[3] // self.vae_downscale
                rid = self.latent_image_ids(h, w).copy()
                rid[:, 0] = 1.0 + r_i
                toks.append(lat)
                ids.append(rid)
            lat_rows.append(np.concatenate(toks, axis=0))
            id_rows.append(np.concatenate(ids, axis=0).astype(np.float32))
        return _pad_cond_rows(lat_rows, id_rows)

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out = super().preprocess_func(batch, **kwargs)
        images = batch.get("images") or batch.get("image")
        if images is not None:
            out["cond_latents"], out["cond_ids"] = self._build_cond(images)
        return out

    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        L = latents.shape[1]
        if "cond_latents" in embeds:
            cond = embeds["cond_latents"].astype(latents.dtype)
            cond_ids = embeds["cond_ids"]
            cond_ids = cond_ids[0] if cond_ids.ndim == 3 else cond_ids
            img_ids = embeds["img_ids"]
            img_ids = img_ids[0] if img_ids.ndim == 3 else img_ids
            latents = jnp.concatenate([latents, cond], axis=1)
            embeds = {
                **{k: v for k, v in embeds.items() if k not in ("cond_latents", "cond_ids")},
                "img_ids": jnp.concatenate([img_ids, cond_ids], axis=0),
            }
        v = super()._velocity(merged, latents, t, embeds, guidance_scale, do_cfg)
        return v[:, :L]

    def inference(self, images=None, cond_latents=None, cond_ids=None, **kwargs):
        extra = kwargs.pop("extra_embeds", None) or {}
        if cond_latents is None and images is not None:
            cond_latents, cond_ids = self._build_cond(images)
        if cond_latents is not None:
            extra["cond_latents"] = jnp.asarray(cond_latents, jnp.float32)
            extra["cond_ids"] = jnp.asarray(cond_ids, jnp.float32)
        samples = super().inference(extra_embeds=extra, **kwargs)
        if cond_latents is not None:
            for i, s in enumerate(samples):
                s.extra_kwargs["cond_latents"] = np.asarray(cond_latents[i], np.float32)
                s.extra_kwargs["cond_ids"] = np.asarray(cond_ids[i], np.float32)
                if images is not None:
                    per = images[i] if isinstance(images[i], list) else [images[i]]
                    s.images = [standardize_image_batch(p, output_type="np")[0] for p in per]
                    s._unique_id = None
        return samples
