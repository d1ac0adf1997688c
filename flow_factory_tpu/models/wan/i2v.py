"""Wan image→video and video→video adapters.

TPU-native re-design of the reference Wan conditioned adapters
(``src/flow_factory/models/wan/wan2_i2v.py``, ``wan2_v2v.py``). Conditioning
is channel-concatenation in latent space (the Wan "y" tensor): the condition
media is VAE-encoded, placed on its temporal span (first frame for I2V, the
full clip for V2V), zero-padded elsewhere, and concatenated with a binary
presence mask to the denoised latents before patch embedding. The
transformer's ``in_channels`` widens accordingly; everything else (CFG,
UniPC-SDE, MoE routing) is inherited from the T2V adapter.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import I2VSample, V2VSample
from ...utils.media import standardize_image_batch, standardize_video_batch
from ..abc import finish_rollout
from .t2v import WanT2VAdapter, _preset
from .transformer import WanConfig, WanTransformer

logger = logging.getLogger(__name__)


class WanI2VAdapter(WanT2VAdapter):
    """First-frame-conditioned video generation."""

    sample_class = I2VSample
    embed_keys = ("prompt_embeds", "negative_prompt_embeds", "cond_latents")

    #: extra channels: condition latents + 1 mask channel
    @property
    def cond_channels(self) -> int:
        return self.latent_channels + 1

    def load_models(self) -> None:
        super().load_models()
        ma = self.model_args
        # Wan2.2-5B TI2V (reference expand_timesteps, wan2_i2v.py:371-417,
        # 737-744): the first LATENT frame is replaced by the clean encoded
        # image and its tokens ride t=0 via per-frame timesteps — no channel
        # widening, no mask channel, no CLIP tower.
        self.expand_timesteps = bool(getattr(ma, "expand_timesteps", False))
        self.use_image_encoder = False
        self._ti2v_cond = None
        if self.expand_timesteps:
            return  # base T2V transformer geometry is already correct
        # widen the transformer input for the conditioning channels
        variant = getattr(ma, "variant", None) or (
            "tiny" if ma.model_name_or_path in ("", "tiny") else "1.3b"
        )
        preset = _preset(variant, ma.attn_backend, ma.inference_dtype)
        from ...utils.checkpoint import (
            apply_config_json_overrides,
            wan_transformer_overrides_from_config,
        )

        raw_cfg: WanConfig = preset["transformer"]
        base_cfg: WanConfig = apply_config_json_overrides(
            raw_cfg, ma.model_name_or_path, "transformer",
            wan_transformer_overrides_from_config)
        # a real I2V checkpoint's transformer config.json already declares
        # the WIDENED in_channels (e.g. 36 = 16 latent + 20 conditioning for
        # Wan2.1 I2V) — trust it and skip our own widening then
        checkpoint_declared_width = base_cfg.in_channels != raw_cfg.in_channels
        import dataclasses

        # Wan2.1-style I2V additionally cross-attends to CLIP image tokens;
        # Wan2.2 conditions purely by latent concat (flag or variant driven)
        self.use_image_encoder = bool(getattr(ma, "use_image_encoder", False))
        vis_cfg = None
        if self.use_image_encoder:
            from ..text_encoders.clip import CLIPVisionConfig, CLIPVisionEncoder

            vis_cfg = (
                CLIPVisionConfig.tiny(dtype=ma.inference_dtype)
                if variant == "tiny"
                else CLIPVisionConfig.vit_h14(dtype=ma.inference_dtype)
            )
            n_tokens = (vis_cfg.image_size // vis_cfg.patch_size) ** 2 + 1
            self.modules["image_encoder"] = CLIPVisionEncoder(vis_cfg)
            self.component_configs["image_encoder"] = vis_cfg
            self.embed_keys = tuple(self.embed_keys) + ("image_embeds",)
            # CLIP context casts to compute dtype at first use, like the
            # UMT5 text context (rollout already stage_contexts it)
            self.wire_context_keys = tuple(self.wire_context_keys) + ("image_embeds",)

        wide_cfg = dataclasses.replace(
            base_cfg,
            in_channels=(base_cfg.in_channels if checkpoint_declared_width
                         else base_cfg.in_channels + self.cond_channels),
            image_context_tokens=n_tokens if self.use_image_encoder else 0,
            image_context_dim=vis_cfg.hidden_dim if vis_cfg else 0,
        )
        self.modules["transformer"] = WanTransformer(wide_cfg)
        self.component_configs["transformer"] = wide_cfg
        if "transformer_2" in self.modules:
            self.modules["transformer_2"] = WanTransformer(wide_cfg)
        # re-init the widened transformer params (host RAM)
        from ...utils.base import derive_key

        key = derive_key("wan_i2v_init", self.training_args.seed)
        lat = jnp.zeros((1, 2, 2 * wide_cfg.patch_size[1], 2 * wide_cfg.patch_size[2], wide_cfg.in_channels))
        img_tok = (
            jnp.zeros((1, wide_cfg.image_context_tokens, wide_cfg.image_context_dim))
            if self.use_image_encoder
            else None
        )
        cast = lambda tree: jax.tree.map(
            lambda x: x.astype(self.inference_dtype) if x.dtype == jnp.float32 else x, tree
        )
        with self.init_device_context():
            for i, comp in enumerate(c for c in ("transformer", "transformer_2") if c in self.modules):
                p = self.modules[comp].init(
                    jax.random.fold_in(key, i), lat, jnp.zeros((1,)),
                    jnp.zeros((1, 4, wide_cfg.context_dim)),
                    encoder_hidden_states_image=img_tok,
                )["params"]
                if ma.finetune_type != "full":
                    p = cast(p)
                self.params[comp] = p
            if self.use_image_encoder:
                p = self.modules["image_encoder"].init(
                    jax.random.fold_in(key, 7),
                    jnp.zeros((1, 3, vis_cfg.image_size, vis_cfg.image_size)),
                )["params"]
                self.params["image_encoder"] = cast(p)
        if jax.local_devices()[0].platform != "cpu" and self.mesh is None:
            for comp in ("transformer", "transformer_2", "image_encoder"):
                if comp in self.params:
                    self.params[comp] = jax.device_put(self.params[comp], jax.local_devices()[0])

    # ------------------------------------------------------------------
    def encode_image_clip(self, images: Sequence[Any]) -> np.ndarray:
        """Condition images → CLIP vision tokens (B, Li, clip_dim)."""
        vis_cfg = self.component_configs["image_encoder"]
        arr = standardize_image_batch(list(images), output_type="np")  # (B,3,H,W) in [0,1]
        x = jax.image.resize(
            jnp.asarray(arr, jnp.float32),
            (arr.shape[0], 3, vis_cfg.image_size, vis_cfg.image_size),
            method="bilinear",
        )
        tokens = self.modules["image_encoder"].apply(
            {"params": self.params["image_encoder"]}, x
        )
        return np.asarray(tokens, np.float32)

    # ------------------------------------------------------------------
    def build_condition(
        self,
        images: Sequence[Any],
        num_frames: int,
        height: int,
        width: int,
        last_images: Optional[Sequence[Any]] = None,
    ) -> np.ndarray:
        """First-frame (and optional last-frame, FLF2V-style) conditioning.

        Wan2.1 mode: (B, T', h, w, c+1) — latent concat + presence-mask
        channel; ``last_images`` additionally pins the final frame
        (reference ``wan2_i2v.py:374-382``). TI2V mode (expand_timesteps):
        (B, T', h, w, c) — the clean latent destined to REPLACE latent
        frame 0.
        """
        arr = standardize_image_batch(list(images), output_type="np")  # (B,3,H,W)
        videos = arr[:, None]  # (B, 1, 3, H, W) single-frame clip
        lat = self.encode_video(videos)  # (B, 1, h, w, c)
        tl, h, w, c = self.latent_shape(height, width, num_frames)
        B = lat.shape[0]
        if self.expand_timesteps:
            cond = np.zeros((B, tl, h, w, c), np.float32)
            cond[:, :1] = lat[:, :1]
            return cond
        cond = np.zeros((B, tl, h, w, c + 1), np.float32)
        cond[:, :1, ..., :c] = lat[:, :1]
        cond[:, :1, ..., c] = 1.0  # presence mask on the conditioned frame
        if last_images is not None:
            last_arr = standardize_image_batch(list(last_images), output_type="np")
            last_lat = self.encode_video(last_arr[:, None])
            cond[:, -1:, ..., :c] = last_lat[:, :1]
            cond[:, -1:, ..., c] = 1.0
        return cond

    @staticmethod
    def _frame_mask(tl: int, dtype) -> jax.Array:
        """(1, tl, 1, 1, 1): 0 on the conditioned first latent frame."""
        return jnp.ones((1, tl, 1, 1, 1), dtype).at[:, 0].set(0.0)

    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        cond = embeds["cond_latents"].astype(latents.dtype)
        sub = {k: v for k, v in embeds.items() if k != "cond_latents"}
        if self.expand_timesteps:
            # reference wan2_i2v.py:737-744: transformer sees the composite
            # (clean frame 0, noisy rest) with per-frame t (0 on frame 0);
            # the SDE step itself evolves the RAW latents
            fmask = self._frame_mask(latents.shape[1], latents.dtype)
            x = (1.0 - fmask) * cond + fmask * latents
            t_frames = t[:, None] * fmask[0, :, 0, 0, 0][None, :].astype(t.dtype)
            return WanT2VAdapter._velocity(self, merged, x, t_frames, sub, guidance_scale, do_cfg)
        x = jnp.concatenate([latents, cond], axis=-1)
        return super()._velocity(merged, x, t, sub, guidance_scale, do_cfg)[..., : self.latent_channels]

    def decode_latents(self, latents, num_frames=None, fetch=True):
        # TI2V: composite the clean conditioned frame back before decoding
        # (reference wan2_i2v.py:605-606)
        if self.expand_timesteps and self._ti2v_cond is not None:
            lat = jnp.asarray(latents)
            cond = jnp.asarray(self._ti2v_cond).astype(lat.dtype)
            latents = lat.at[:, 0].set(cond[:, 0])
        return super().decode_latents(latents, num_frames=num_frames, fetch=fetch)

    def inference(self, images=None, cond_latents=None, last_images=None, **kwargs):
        ta = self.training_args
        num_frames = kwargs.get("num_frames") or int(getattr(ta, "num_frames", 5))
        height = kwargs.get("height") or ta.height
        width = kwargs.get("width") or ta.width
        if cond_latents is None and images is not None:
            cond_latents = self.build_condition(
                images, num_frames, height, width, last_images=last_images
            )
        if cond_latents is None:
            raise ValueError("WanI2VAdapter.inference needs images or cond_latents")
        extra = {"cond_latents": jnp.asarray(cond_latents, jnp.float32)}
        image_embeds = kwargs.pop("image_embeds", None)
        if getattr(self, "use_image_encoder", False):
            if image_embeds is None and images is not None:
                image_embeds = self.encode_image_clip(images)
            if image_embeds is None:
                raise ValueError("use_image_encoder needs images or image_embeds")
            # CLIP image context is cast to compute dtype at first use
            # (transformer.py:141) — stage narrow like the text context
            extra["image_embeds"] = self.stage_context(image_embeds)
        if self.expand_timesteps:
            self._ti2v_cond = np.asarray(cond_latents, np.float32)
        try:
            # NB with defer=True the decode is already DISPATCHED (using
            # _ti2v_cond) before super() returns, so the reset below is safe
            out = super().inference(extra_embeds=extra, **kwargs)
        finally:
            self._ti2v_cond = None

        def _post(samples):
            for i, s in enumerate(samples):
                s.extra_kwargs["cond_latents"] = np.asarray(cond_latents[i], np.float32)
                if image_embeds is not None:
                    s.extra_kwargs["image_embeds"] = np.asarray(image_embeds[i], np.float32)
                if images is not None:
                    s.images = [standardize_image_batch([images[i]], output_type="np")[0]]
                    s._unique_id = None
            return samples

        return finish_rollout(out, _post)

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out = super().preprocess_func(batch, **kwargs)
        images = batch.get("images") or batch.get("image")
        if images is not None:
            ta = self.training_args
            flat = [im[0] if isinstance(im, list) else im for im in images]
            out["cond_latents"] = self.build_condition(
                flat, int(getattr(ta, "num_frames", 5)), ta.height, ta.width
            )
            if getattr(self, "use_image_encoder", False):
                out["image_embeds"] = self.encode_image_clip(flat)
        return out


class WanV2VAdapter(WanI2VAdapter):
    """Video-conditioned video generation (full-clip conditioning)."""

    sample_class = V2VSample
    embed_keys = ("prompt_embeds", "negative_prompt_embeds", "cond_latents")

    def build_condition(
        self, videos: Sequence[Any], num_frames: int, height: int, width: int
    ) -> np.ndarray:
        arr = standardize_video_batch(list(videos), output_type="np")  # (B,T,3,H,W)
        lat = self.encode_video(arr)  # (B, Tl, h, w, c)
        tl, h, w, c = self.latent_shape(height, width, num_frames)
        B = lat.shape[0]
        cond = np.zeros((B, tl, h, w, c + 1), np.float32)
        span = min(tl, lat.shape[1])
        cond[:, :span, ..., :c] = lat[:, :span]
        cond[:, :span, ..., c] = 1.0
        return cond

    def inference(self, condition_video=None, images=None, cond_latents=None, **kwargs):
        ta = self.training_args
        num_frames = kwargs.get("num_frames") or int(getattr(ta, "num_frames", 5))
        height = kwargs.get("height") or ta.height
        width = kwargs.get("width") or ta.width
        if cond_latents is None and condition_video is not None:
            cond_latents = self.build_condition(condition_video, num_frames, height, width)
        if cond_latents is None:
            raise ValueError("WanV2VAdapter.inference needs condition_video or cond_latents")
        out = WanT2VAdapter.inference(
            self, extra_embeds={"cond_latents": jnp.asarray(cond_latents, jnp.float32)}, **kwargs
        )

        def _post(samples):
            for i, s in enumerate(samples):
                s.extra_kwargs["cond_latents"] = np.asarray(cond_latents[i], np.float32)
                if condition_video is not None:
                    s.condition_video = standardize_video_batch([condition_video[i]], output_type="np")[0]
                    s._unique_id = None
            return samples

        return finish_rollout(out, _post)

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out = WanT2VAdapter.preprocess_func(self, batch, **kwargs)
        videos = batch.get("condition_video") or batch.get("video")
        if videos is not None:
            ta = self.training_args
            out["cond_latents"] = self.build_condition(
                videos, int(getattr(ta, "num_frames", 5)), ta.height, ta.width
            )
        return out
