"""Qwen-Image-Edit-Plus adapter (multi-reference image editing).

TPU-native re-design of the reference adapter
(``src/flow_factory/models/qwen_image/qwen_image_edit_plus.py``). Both
conditioning channels of the reference are implemented:

* **latent concat** — condition images are VAE-encoded, packed, and
  concatenated to the target token sequence with offset RoPE ids (same
  mechanism as FLUX-Kontext; reference ``prepare_latents``),
* **vision-tower conditioning** — condition images (aspect-preserving
  resize to the 384² encode area, reference ``CONDITION_IMAGE_SIZE_FOR_
  ENCODE``) run through the Qwen2.5-VL vision tower; the resulting tokens
  are merged into the LM's input stream at image-pad positions with
  M-RoPE (t, h, w) position ids, and the LM hidden states become
  ``prompt_embeds`` (reference ``_get_qwen_prompt_embeds``,
  ``qwen_image_edit_plus.py:163-190``). Negative prompts are encoded with
  the same images, as upstream does.

Tokenizer note: with real Qwen weights the chat template/processor drives
token layout; under the deterministic ``HashTokenizer`` fallback the
sequence is [image-pad tokens][text tokens] — the vision embeddings replace
the pad embeddings either way, so the conditioning signal is the same.
"""
from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import I2ISample
from ...utils.base import derive_key
from ...utils.media import standardize_image_batch
from ..text_encoders.vl_vision import (
    VLVisionConfig,
    VLVisionTower,
    preprocess_vision_image,
    rot_pos_ids,
    window_layout,
)
from ..abc import finish_rollout
from ..vae import AutoencoderKL
from .adapter import QwenImageAdapter

logger = logging.getLogger(__name__)

from ..flux.kontext import _pad_cond_rows

#: reference CONDITION_IMAGE_SIZE_FOR_ENCODE — the vision-tower input area
CONDITION_ENCODE_AREA = 384 * 384


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

    # ------------------------------------------------------------------
    # Vision tower component
    # ------------------------------------------------------------------
    def load_models(self) -> None:
        super().load_models()
        ma = self.model_args
        lmcfg = self.component_configs["text_encoder"]
        tiny = lmcfg.hidden_dim < 256
        if tiny:
            # tiny LM head_dim=8 → M-RoPE halved sections sum to 4
            import dataclasses as _dc

            self.component_configs["text_encoder"] = lmcfg = _dc.replace(
                lmcfg, mrope_sections=(2, 1, 1))
            self.modules["text_encoder"] = type(self.modules["text_encoder"])(lmcfg)
            vcfg = VLVisionConfig.tiny(out_dim=lmcfg.hidden_dim, dtype=lmcfg.dtype)
        else:
            import dataclasses as _dc

            self.component_configs["text_encoder"] = lmcfg = _dc.replace(
                lmcfg, mrope_sections=(16, 24, 24))
            self.modules["text_encoder"] = type(self.modules["text_encoder"])(lmcfg)
            vcfg = VLVisionConfig.qwen25_vl(out_dim=lmcfg.hidden_dim, dtype=lmcfg.dtype)
        if "text_encoder" in self.params:
            tower = VLVisionTower(vcfg)
            key = derive_key("qwen_vl_vision_init", self.training_args.seed)
            g = (1, 2 * vcfg.merge_size, 2 * vcfg.merge_size)
            perm, inv, mask = window_layout(g, vcfg)
            with self.init_device_context():
                p = tower.init(
                    key,
                    jnp.zeros((g[1] * g[2], vcfg.patch_dim)),
                    jnp.asarray(rot_pos_ids(g, vcfg.merge_size)),
                    jnp.asarray(perm), jnp.asarray(mask), jnp.asarray(inv),
                )["params"]
            self.modules["vision_tower"] = tower
            self.params["vision_tower"] = jax.tree.map(
                lambda x: x.astype(self.inference_dtype) if x.dtype == jnp.float32 else x, p
            )
            self.component_configs["vision_tower"] = vcfg
        self._vision_jit: Dict[Tuple[int, int, int], Any] = {}
        self._vl_encode_jit = None
        # fixed padded text+vision length: one compile, stackable samples
        self.condition_encode_area = int(
            getattr(ma, "condition_encode_area", CONDITION_ENCODE_AREA)
            or CONDITION_ENCODE_AREA
        )
        factor = vcfg.patch_size * vcfg.merge_size
        max_vis = math.ceil(self.condition_encode_area / factor**2) + 8
        max_refs = int(getattr(ma, "max_condition_images", 3) or 3)
        self.vl_total_length = self.max_length + max_vis * max_refs

    def pretrained_component_maps(self):
        maps = super().pretrained_component_maps()
        vcfg = self.component_configs.get("vision_tower")
        if vcfg is not None and "vision_tower" in self.params:
            from ...utils.checkpoint import (
                qwen_vl_vision_key_map,
                qwen_vl_vision_preprocess,
            )

            km, rm = qwen_vl_vision_key_map(vcfg.depth)
            # the tower ships inside the text_encoder checkpoint directory;
            # it only claims the visual.* keys (LM keys belong to the
            # text_encoder component's own import)
            maps["vision_tower"] = ("text_encoder", km, rm,
                                    qwen_vl_vision_preprocess, r"^visual\.")
        return maps

    # ------------------------------------------------------------------
    # Vision-tower conditioning (reference _get_qwen_prompt_embeds)
    # ------------------------------------------------------------------
    def _vision_forward(self, flat: np.ndarray, grid: Tuple[int, int, int]) -> np.ndarray:
        """(L, patch_dim) patches of ONE image → (L/merge², D) embeds."""
        if grid not in self._vision_jit:
            vcfg: VLVisionConfig = self.component_configs["vision_tower"]
            perm, inv, mask = window_layout(grid, vcfg)
            pos = rot_pos_ids(grid, vcfg.merge_size)
            tower = self.modules["vision_tower"]

            def fwd(params, patches):
                return tower.apply(
                    {"params": params}, patches, jnp.asarray(pos),
                    jnp.asarray(perm), jnp.asarray(mask), jnp.asarray(inv),
                ).astype(jnp.float32)

            self._vision_jit[grid] = jax.jit(fwd)
        place = self.encoder_input_place(self.params["vision_tower"])
        out = self._vision_jit[grid](self.params["vision_tower"], place(flat))
        return np.asarray(jax.device_get(out))

    def _encode_rows_with_vision(
        self, prompts: Sequence[str], images: Sequence[Any]
    ) -> np.ndarray:
        """Per-record [image pads][text] → LM hidden states, fixed length."""
        vcfg: VLVisionConfig = self.component_configs["vision_tower"]
        lmcfg = self.component_configs["text_encoder"]
        L_total = self.vl_total_length
        pad_id = lmcfg.vocab_size - 1
        B = len(prompts)
        ids = np.zeros((B, L_total), np.int64)
        mask = np.zeros((B, L_total), np.float32)
        vis_mask = np.zeros((B, L_total), bool)
        pos_ids = np.zeros((B, 3, L_total), np.float32)
        max_lv = 1
        vis_embeds_rows: List[np.ndarray] = []
        for bi, (prompt, per_record) in enumerate(zip(prompts, images)):
            refs = per_record if isinstance(per_record, list) else [per_record]
            embs, grids = [], []
            for ref in refs:
                arr = standardize_image_batch(ref, output_type="np")[0]  # (3,H,W)
                flat, grid = preprocess_vision_image(arr, vcfg, self.condition_encode_area)
                embs.append(self._vision_forward(flat, grid))
                grids.append(grid)
            v = np.concatenate(embs, axis=0) if embs else np.zeros((0, lmcfg.hidden_dim))
            lv = v.shape[0]
            enc = self.tokenizer([prompt], max_length=self.max_length)
            t_ids = np.asarray(enc["input_ids"][0])
            t_mask = np.asarray(enc["attention_mask"][0])
            n_text = int(t_mask.sum())
            total = min(lv + n_text, L_total)
            ids[bi, :lv] = pad_id
            ids[bi, lv:total] = t_ids[: total - lv]
            mask[bi, :total] = 1.0
            vis_mask[bi, :lv] = True
            # M-RoPE ids (upstream get_rope_index for leading images):
            # image i gets t=st, h=st+row, w=st+col; st advances by
            # max(hm, wm); text continues sequentially after.
            st, off = 0, 0
            for grid in grids:
                _, h, w = grid
                hm, wm = h // vcfg.merge_size, w // vcfg.merge_size
                lm_i = hm * wm
                rows = np.repeat(np.arange(hm), wm)
                cols = np.tile(np.arange(wm), hm)
                pos_ids[bi, 0, off : off + lm_i] = st
                pos_ids[bi, 1, off : off + lm_i] = st + rows
                pos_ids[bi, 2, off : off + lm_i] = st + cols
                st += int(max(hm, wm))
                off += lm_i
            text_pos = st + np.arange(L_total - lv)
            pos_ids[bi, :, lv:] = text_pos[None]
            vis_embeds_rows.append(v)
            max_lv = max(max_lv, max(lv, 1))
        vis = np.zeros((B, max_lv, lmcfg.hidden_dim), np.float32)
        for bi, v in enumerate(vis_embeds_rows):
            vis[bi, : v.shape[0]] = v

        if self._vl_encode_jit is None:
            enc_mod = self.modules["text_encoder"]

            def fwd(params, ids, mask, vis, vis_mask, pos):
                # per-row M-RoPE ids → vmap the whole row encode
                def one(i, m, v, vm, p):
                    return enc_mod.apply(
                        {"params": params}, i[None], m[None],
                        vision_embeds=v[None], vision_mask=vm[None], position_ids=p,
                    )[0]

                return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
                    ids, mask, vis, vis_mask, pos
                ).astype(jnp.float32)

            self._vl_encode_jit = jax.jit(fwd)
        place = self.encoder_input_place(self.params["text_encoder"])
        emb = self._vl_encode_jit(
            self.params["text_encoder"], place(ids), place(mask),
            place(vis), place(vis_mask), place(pos_ids),
        )
        return np.asarray(jax.device_get(emb), np.float32)

    def encode_prompt(self, prompts: Sequence[str], images: Optional[Sequence[Any]] = None,
                      **kw) -> Dict[str, np.ndarray]:
        if images is None or "vision_tower" not in self.params:
            return super().encode_prompt(prompts, **kw)
        if isinstance(prompts, str):
            prompts = [prompts]
        return {"prompt_embeds": self._encode_rows_with_vision(list(prompts), images)}

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
        images = batch.get("images") or batch.get("image")
        out: Dict[str, Any] = {}
        if batch.get("prompt") is not None:
            # vision-tower conditioning: positives AND negatives see the
            # condition images (reference encode_prompt(images=...))
            out.update(self.encode_prompt(batch["prompt"], images=images))
            neg = batch.get("negative_prompt") or [" "] * len(batch["prompt"])
            out["negative_prompt_embeds"] = self.encode_prompt(
                neg, images=images)["prompt_embeds"]
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
        # vision-tower prompt encoding (positives + negatives share images)
        if images is not None and kwargs.get("prompt_embeds") is None \
                and kwargs.get("prompt") is not None:
            kwargs["prompt_embeds"] = self.encode_prompt(
                kwargs["prompt"], images=images)["prompt_embeds"]
            ta = self.training_args
            g = float(kwargs.get("guidance_scale") or ta.guidance_scale)
            if g > 1.0 and kwargs.get("negative_prompt_embeds") is None:
                neg = kwargs.get("negative_prompt") or [" "] * len(kwargs["prompt"])
                kwargs["negative_prompt_embeds"] = self.encode_prompt(
                    list(neg), images=images)["prompt_embeds"]
        if cond_latents is None and images is not None:
            cond_latents, cond_ids = self._build_cond(images)
        if cond_latents is not None:
            extra["cond_latents"] = jnp.asarray(cond_latents, jnp.float32)
            extra["cond_ids"] = jnp.asarray(cond_ids, jnp.float32)
        out = super().inference(extra_embeds=extra, **kwargs)
        if cond_latents is None:
            return out

        def _post(samples):
            for i, s in enumerate(samples):
                s.extra_kwargs["cond_latents"] = np.asarray(cond_latents[i], np.float32)
                s.extra_kwargs["cond_ids"] = np.asarray(cond_ids[i], np.float32)
                if images is not None:
                    per = images[i] if isinstance(images[i], list) else [images[i]]
                    s.images = [standardize_image_batch(p, output_type="np")[0] for p in per]
                    s._unique_id = None
            return samples

        return finish_rollout(out, _post)
