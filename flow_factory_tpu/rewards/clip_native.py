"""Native (flax) CLIP dual-tower reward — PickScore/CLIPScore without torch.

The reference scores PickScore/CLIP through transformers' torch CLIP-H
(``src/flow_factory/rewards/pick_score.py:43-141``, ``clip.py``). Here the
same architecture runs as OUR flax towers (``models/text_encoders/clip.py``)
so scoring can ride the TPU (or host CPU) with weights imported straight
from a local transformers CLIP/PickScore checkpoint via the key maps in
``utils/checkpoint.py`` — no torch in the loop.

score = exp(logit_scale) · cosine(text_proj(t), visual_proj(v))   (×1 per
prompt-image pair; videos score as the frame mean, reference behavior).

Weightless/dev environments initialize deterministically random towers so
the full pipeline stays runnable (scores are meaningless but stable).
"""
from __future__ import annotations

import logging
import os
from typing import Any, List, Optional, Sequence

import numpy as np

from .abc import PointwiseRewardModel

logger = logging.getLogger(__name__)


class NativeCLIPReward(PointwiseRewardModel):
    required_fields = ("image", "video", "prompt")

    #: preset geometry (PickScore = CLIP-H/14)
    VISION = dict(image_size=224, patch_size=14, hidden_dim=1280, num_layers=32,
                  num_heads=16)
    TEXT = dict(hidden_dim=1024, num_layers=24, num_heads=16, projection_dim=1024,
                hidden_act="gelu")
    PROJECTION_DIM = 1024

    def setup(self) -> None:
        import jax
        import jax.numpy as jnp

        from ..models.text_encoders.clip import (
            CLIPTextConfig,
            CLIPTextEncoder,
            CLIPVisionConfig,
            CLIPVisionEncoder,
        )
        from ..utils.tokenizer import load_tokenizer

        tiny = bool(getattr(self.args, "tiny", False)) or self.args.model_name_or_path in (
            "", "tiny", None,
        )
        if tiny:
            self.vision_cfg = CLIPVisionConfig.tiny(use_post_ln=True, dtype="float32")
            self.text_cfg = CLIPTextConfig.tiny(dtype="float32")
        else:
            self.vision_cfg = CLIPVisionConfig(use_post_ln=True, dtype="float32",
                                               **self.VISION)
            self.text_cfg = CLIPTextConfig(dtype="float32", **self.TEXT)
        proj_dim = self.text_cfg.projection_dim
        self.vision = CLIPVisionEncoder(self.vision_cfg)
        self.text = CLIPTextEncoder(self.text_cfg)

        key = jax.random.PRNGKey(0)
        self.vision_params = self.vision.init(
            key, jnp.zeros((1, 3, self.vision_cfg.image_size, self.vision_cfg.image_size))
        )["params"]
        self.text_params = self.text.init(key, jnp.zeros((1, 4), jnp.int32))["params"]
        self.visual_projection = jax.random.normal(
            key, (self.vision_cfg.hidden_dim, proj_dim), jnp.float32
        ) * self.vision_cfg.hidden_dim ** -0.5
        self.logit_scale = jnp.float32(np.log(100.0))

        path = self.args.model_name_or_path
        if path and os.path.isdir(path):
            self._import_weights(path)
        self.tokenizer = load_tokenizer(
            path or "", "", self.text_cfg.vocab_size, self.text_cfg.max_positions,
            eos_token_id=self.text_cfg.eos_token_id,
        )
        self._score_jit = jax.jit(self._score_impl)

    # ------------------------------------------------------------------
    def _import_weights(self, path: str) -> None:
        import jax.numpy as jnp

        from ..utils.checkpoint import (
            clip_text_encoder_key_map,
            clip_vision_encoder_key_map,
            import_diffusers_params,
            load_safetensors_dir,
        )

        sd = load_safetensors_dir(path)
        if not sd:
            logger.warning("NativeCLIPReward: no safetensors under %s", path)
            return
        km, rm = clip_vision_encoder_key_map(self.vision_cfg.num_layers)
        self.vision_params = import_diffusers_params(sd, km, self.vision_params, raw_map=rm)
        tkm, trm = clip_text_encoder_key_map(self.text_cfg.num_layers)
        self.text_params = import_diffusers_params(sd, tkm, self.text_params, raw_map=trm)
        if "visual_projection.weight" in sd:
            self.visual_projection = jnp.asarray(sd["visual_projection.weight"].T)
        if "logit_scale" in sd:
            self.logit_scale = jnp.asarray(sd["logit_scale"], jnp.float32).reshape(())
        logger.info("NativeCLIPReward: imported CLIP weights from %s", path)

    # ------------------------------------------------------------------
    def _score_impl(self, vision_params, text_params, vproj, logit_scale, pixels, ids):
        import jax.numpy as jnp

        tokens = self.vision.apply({"params": vision_params}, pixels)  # (B, L, D)
        img = tokens[:, 0] @ vproj  # CLS pooling → projection
        img = img / jnp.maximum(jnp.linalg.norm(img, axis=-1, keepdims=True), 1e-6)
        txt = self.text.apply({"params": text_params}, ids).pooled
        txt = txt / jnp.maximum(jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-6)
        return jnp.exp(logit_scale) * jnp.sum(img * txt, axis=-1)

    def _prepare_pixels(self, images: Sequence[Any]) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from ..utils.media import standardize_image_batch

        arr = standardize_image_batch(list(images), output_type="np")  # (B,3,H,W) [0,1]
        s = self.vision_cfg.image_size
        return np.asarray(jax.image.resize(
            jnp.asarray(arr, jnp.float32), (arr.shape[0], 3, s, s), method="bilinear"
        ))

    def compute_reward(self, prompt: Sequence[str], image=None, video=None, **_) -> np.ndarray:
        import jax.numpy as jnp

        enc = self.tokenizer(list(prompt), max_length=self.text_cfg.max_positions)
        ids = jnp.asarray(enc["input_ids"])
        if image is not None and image[0] is not None:
            pixels = self._prepare_pixels(list(image))
            scores = self._score_jit(
                self.vision_params, self.text_params, self.visual_projection,
                self.logit_scale, jnp.asarray(pixels), ids,
            )
            return np.asarray(scores, np.float64)
        # videos: frame-mean score (reference pick_score.py video path)
        out = []
        for p_ids, vid in zip(np.asarray(enc["input_ids"]), video):
            frames = self._prepare_pixels(list(np.asarray(vid)))
            s = self._score_jit(
                self.vision_params, self.text_params, self.visual_projection,
                self.logit_scale, jnp.asarray(frames),
                jnp.asarray(np.repeat(p_ids[None], len(frames), axis=0)),
            )
            out.append(float(np.mean(np.asarray(s))))
        return np.asarray(out, np.float64)
