"""Z-Image adapter (single-stream DiT, Qwen3-conditioned).

TPU-native re-design of the reference Z-Image adapter
(``src/flow_factory/models/z_image/z_image.py``): a single-stream DiT —
text tokens and packed image tokens concatenated through ONE stack of
sequential attention + SwiGLU blocks (the upstream S3-DiT layout, per-block
Linears pinned by ``z_image.py:70-75``), conditioned on a Qwen3 LM's hidden
states. The upstream transformer takes no guidance embedding and no pooled
vector (``z_image.py:444-449``) — CFG, when requested, is batch-doubled.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import T2ISample
from ...utils.base import derive_key
from ...utils.tokenizer import load_tokenizer
from ..abc import finish_rollout
from ..flux.adapter import Flux1Adapter
from ..text_encoders.lm import LMConfig, LMEncoder
from ..vae import AutoencoderKL, VAEConfig
from .transformer import ZImageConfig, ZImageTransformer

logger = logging.getLogger(__name__)

# The reference's per-block targets (``z_image.py:70-75``): 4 attention
# projections + 3 SwiGLU Linears.
Z_IMAGE_LORA_TARGETS = (
    r".*layer_\d+/(to_q|to_k|to_v|to_out)/kernel$",
    r".*layer_\d+/(w1|w2|w3)/kernel$",
)


def _preset(name: str, attn_backend: str, dtype: str) -> Dict[str, Any]:
    if name == "tiny":
        return dict(
            transformer=ZImageConfig.tiny(attn_backend=attn_backend, dtype=dtype),
            vae=VAEConfig.tiny(latent_channels=4, dtype=dtype),
            lm=LMConfig.tiny(hidden_dim=32, dtype=dtype),
            max_length=16,
        )
    if name in ("z-image", "6b"):
        return dict(
            transformer=ZImageConfig(
                in_channels=64, hidden_dim=3072, num_heads=24, num_layers=38,
                ffn_dim=8192, context_dim=2560,
                axes_dim=(16, 56, 56), attn_backend=attn_backend, dtype=dtype,
            ),
            vae=VAEConfig(latent_channels=16, dtype=dtype),
            lm=LMConfig(vocab_size=151936, hidden_dim=2560, num_layers=36, num_heads=32,
                        num_kv_heads=8, head_dim=128, mlp_dim=9728, dtype=dtype),
            max_length=512,
        )
    raise ValueError(f"Unknown Z-Image preset {name!r}")


class ZImageAdapter(Flux1Adapter):
    sample_class = T2ISample
    default_target_patterns = Z_IMAGE_LORA_TARGETS
    embed_keys = ("prompt_embeds", "negative_prompt_embeds", "img_ids", "txt_ids")

    def pretrained_component_maps(self):
        from ...utils.checkpoint import (
            lm_decoder_key_map,
            vae_key_map,
            z_image_transformer_key_map,
        )

        maps = {}
        tcfg = self.component_configs.get("transformer")
        if tcfg is not None:
            maps["transformer"] = (
                "transformer", z_image_transformer_key_map(tcfg.num_layers), None, None)
        lcfg = self.component_configs.get("text_encoder")
        if lcfg is not None and "text_encoder" in self.params:
            lkm, lrm = lm_decoder_key_map(lcfg.num_layers)
            maps["text_encoder"] = ("text_encoder", lkm, lrm, None)
        vcfg = self.component_configs.get("vae")
        if vcfg is not None and "vae" in self.params:
            maps["vae"] = ("vae", vae_key_map(
                vcfg.channel_mults, vcfg.layers_per_block, vcfg.use_mid_attention), None, None)
        return maps

    def load_models(self) -> None:
        ma = self.model_args
        variant = getattr(ma, "variant", None) or (
            "tiny" if ma.model_name_or_path in ("", "tiny") else "z-image"
        )
        preset = _preset(variant, ma.attn_backend, ma.inference_dtype)
        from ...utils.checkpoint import (
            apply_config_json_overrides,
            image_vae_overrides_from_config,
            lm_overrides_from_config,
            z_image_transformer_overrides_from_config,
        )

        preset["transformer"] = apply_config_json_overrides(
            preset["transformer"], ma.model_name_or_path, "transformer",
            z_image_transformer_overrides_from_config)
        preset["lm"] = apply_config_json_overrides(
            preset["lm"], ma.model_name_or_path, "text_encoder", lm_overrides_from_config)
        preset["vae"] = apply_config_json_overrides(
            preset["vae"], ma.model_name_or_path, "vae", image_vae_overrides_from_config)
        if self.training_args.enable_gradient_checkpointing or (
            self.model_args.enable_gradient_checkpointing_override
        ):
            import dataclasses as _dc

            preset["transformer"] = _dc.replace(preset["transformer"], remat=True)
        self.max_length = preset["max_length"]

        self.modules = {
            "transformer": ZImageTransformer(preset["transformer"]),
            "vae": AutoencoderKL(preset["vae"]),
            "text_encoder": LMEncoder(preset["lm"]),
        }
        self.component_configs = {
            "transformer": preset["transformer"],
            "vae": preset["vae"],
            "text_encoder": preset["lm"],
        }
        wanted = getattr(ma, "load_components", None)
        if wanted:
            self.modules = {k: v for k, v in self.modules.items() if k in set(wanted)}

        tcfg: ZImageConfig = preset["transformer"]
        self.packed_channels = tcfg.in_channels
        key = derive_key("z_image_init", self.training_args.seed)
        L = 16
        init_fns = {
            "transformer": lambda m, k: m.init(
                k, jnp.zeros((1, L, tcfg.in_channels)), jnp.zeros((1,)),
                jnp.zeros((1, 4, tcfg.context_dim)),
                jnp.zeros((L, 3)), jnp.zeros((4, 3)),
            ),
            "vae": lambda m, k: m.init(
                k, jnp.zeros((1, 3, 8 * preset["vae"].downscale, 8 * preset["vae"].downscale))
            ),
            "text_encoder": lambda m, k: m.init(k, jnp.zeros((1, 4), jnp.int32)),
        }
        cast = lambda tree: jax.tree.map(
            lambda x: x.astype(self.inference_dtype) if x.dtype == jnp.float32 else x, tree
        )
        self.params = {}
        with self.init_device_context():
            for i, (comp, module) in enumerate(self.modules.items()):
                p = self.run_init(  # ONE jitted program, not per-op dispatch
                    init_fns[comp], module, jax.random.fold_in(key, i))["params"]
                if not (ma.finetune_type == "full" and comp == "transformer"):
                    p = cast(p)
                self.params[comp] = p
        if jax.local_devices()[0].platform != "cpu" and self.mesh is None:
            for comp in ("transformer", "vae"):
                if comp in self.params:
                    self.params[comp] = jax.device_put(self.params[comp], jax.local_devices()[0])

        self.tokenizer = load_tokenizer(
            ma.model_name_or_path, "tokenizer", preset["lm"].vocab_size,
            self.max_length, eos_token_id=2, pad_token_id=0,
        )
        self.latent_channels = preset["vae"].latent_channels
        self.vae_downscale = preset["vae"].downscale
        self._encode_jit = None
        self._decode_jit = None

    def _encode_impl(self, params, ids, mask):
        emb = self.modules["text_encoder"].apply({"params": params}, ids, mask)
        return emb.astype(jnp.float32)

    def encode_prompt(self, prompts: Sequence[str], **_) -> Dict[str, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        if "text_encoder" not in self.params:
            raise RuntimeError("text_encoder not loaded (load_components)")
        enc = self.tokenizer(list(prompts), max_length=self.max_length)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self._encode_impl)
        place = self.encoder_input_place(self.params["text_encoder"])
        emb = self._encode_jit(
            self.params["text_encoder"],
            place(enc["input_ids"]),
            place(enc["attention_mask"]),
        )
        return {"prompt_embeds": np.asarray(jax.device_get(emb), np.float32)}

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if batch.get("prompt") is not None:
            out.update(self.encode_prompt(batch["prompt"]))
            if float(self.training_args.guidance_scale) > 1.0:
                neg = batch.get("negative_prompt") or [""] * len(batch["prompt"])
                out["negative_prompt_embeds"] = self.encode_prompt(neg)["prompt_embeds"]
        return out

    def inference(self, negative_prompt=None, negative_prompt_embeds=None,
                  guidance_scale=None, **kwargs):
        """Rollout with optional true CFG (reference ``z_image.py:444-459``:
        batch-doubled forward when guidance > 1 and negatives exist)."""
        ta = self.training_args
        g = float(ta.guidance_scale if guidance_scale is None else guidance_scale)
        extra = kwargs.pop("extra_embeds", None) or {}
        neg_np = None
        if g > 1.0 and "negative_prompt_embeds" not in extra:
            if negative_prompt_embeds is None:
                prompts = kwargs.get("prompt")
                n = len(prompts) if prompts is not None else len(kwargs["prompt_embeds"])
                neg = list(negative_prompt) if negative_prompt is not None else [""] * n
                negative_prompt_embeds = self.encode_prompt(neg)["prompt_embeds"]
            extra["negative_prompt_embeds"] = jnp.asarray(negative_prompt_embeds)
        if "negative_prompt_embeds" in extra:
            neg_np = np.asarray(extra["negative_prompt_embeds"], np.float32)
            kwargs.setdefault("do_cfg_override", True)
        out = super().inference(
            guidance_scale=g, extra_embeds=extra or None, **kwargs)
        if neg_np is None:
            return out

        def _post(samples):
            for i, s in enumerate(samples):
                s.negative_prompt_embeds = neg_np[i]
                s._unique_id = None
            return samples

        return finish_rollout(out, _post)

    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        model = self.modules["transformer"]
        dt = self.component_configs["transformer"].compute_dtype
        img_ids = embeds["img_ids"]
        img_ids = img_ids[0] if img_ids.ndim == 3 else img_ids
        txt_ids = embeds["txt_ids"]
        txt_ids = txt_ids[0] if txt_ids.ndim == 3 else txt_ids

        def fwd(lat, tt, ctx):
            v = model.apply(
                {"params": merged}, lat.astype(dt), tt, ctx, img_ids, txt_ids,
            )
            return v.astype(jnp.float32)

        # upstream CFG: batch-doubled forward (no guidance embedding,
        # reference z_image.py:444-459)
        if do_cfg and "negative_prompt_embeds" in embeds:
            lat2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx2 = jnp.concatenate(
                [embeds["negative_prompt_embeds"], embeds["prompt_embeds"]], axis=0)
            v = fwd(lat2, t2, ctx2)
            v_u, v_c = jnp.split(v, 2, axis=0)
            return v_u + guidance_scale * (v_c - v_u)
        return fwd(latents, t, embeds["prompt_embeds"])
