"""Qwen-Image adapter (text→image, VLM-conditioned MMDiT).

TPU-native re-design of the reference Qwen-Image adapter
(``src/flow_factory/models/qwen_image/qwen_image.py``). Architecture: a
pure double-stream MMDiT (joint image/text blocks with RoPE, no single
blocks, no pooled projection, no embedded guidance) conditioned on Qwen2.5-VL
hidden states; packed 2×2 latents; TRUE CFG with negative prompts.

The transformer reuses the FLUX double-stream blocks with
``num_single_blocks=0, pooled_dim=0, guidance_embeds=False`` — the joint
attention structure is the same family; only conditioning and guidance
semantics differ.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import T2ISample
from ...utils.base import derive_key
from ...utils.tokenizer import load_tokenizer
from ..abc import finish_rollout
from ..flux.adapter import Flux1Adapter
from ..flux.transformer import FluxConfig, FluxTransformer
from ..text_encoders.lm import LMConfig, LMEncoder
from ..vae import AutoencoderKL, VAEConfig

logger = logging.getLogger(__name__)


def _preset(name: str, attn_backend: str, dtype: str) -> Dict[str, Any]:
    if name == "tiny":
        return dict(
            transformer=FluxConfig.tiny(
                attn_backend=attn_backend, dtype=dtype, pooled_dim=0,
                guidance_embeds=False, num_single_blocks=0, num_double_blocks=2,
                context_dim=32, txt_norm=True,
            ),
            vae=VAEConfig.tiny(latent_channels=4, dtype=dtype),
            lm=LMConfig.tiny(hidden_dim=32, dtype=dtype),
            max_length=16,
        )
    if name in ("qwen-image", "20b"):
        return dict(
            transformer=FluxConfig(
                in_channels=64, hidden_dim=3072, num_heads=24,
                num_double_blocks=60, num_single_blocks=0,
                context_dim=3584, pooled_dim=0, guidance_embeds=False,
                axes_dim=(16, 56, 56), attn_backend=attn_backend, dtype=dtype,
                txt_norm=True,
            ),
            vae=VAEConfig(latent_channels=16, dtype=dtype),
            lm=LMConfig.qwen25_7b(dtype=dtype),
            max_length=512,
        )
    raise ValueError(f"Unknown Qwen-Image preset {name!r}")


class QwenImageAdapter(Flux1Adapter):
    sample_class = T2ISample
    embed_keys = (
        "prompt_embeds",
        "negative_prompt_embeds",
        "img_ids",
        "txt_ids",
    )

    def pretrained_component_maps(self):
        from ...utils.checkpoint import qwen_image_transformer_key_map

        cfg = self.component_configs.get("transformer")
        if cfg is None:
            return {}
        maps = {"transformer": (
            "transformer",
            qwen_image_transformer_key_map(cfg.num_double_blocks),
            None, None,
        )}
        from ...utils.checkpoint import lm_decoder_key_map

        lcfg = self.component_configs.get("text_encoder")
        if lcfg is not None and "text_encoder" in self.params:
            km, rm = lm_decoder_key_map(lcfg.num_layers)
            # Qwen2.5-VL checkpoints ship the vision tower in the same dir;
            # the LM map only claims the language-side keys
            maps["text_encoder"] = ("text_encoder", km, rm, None,
                                    r"^(model\.|lm_head)")
        vcfg = self.component_configs.get("vae")
        if vcfg is not None and "vae" in self.params:
            from ...utils.checkpoint import vae_key_map

            maps["vae"] = ("vae", vae_key_map(
                vcfg.channel_mults, vcfg.layers_per_block, vcfg.use_mid_attention
            ), None, None)
        return maps

    def load_models(self) -> None:
        ma = self.model_args
        variant = getattr(ma, "variant", None) or (
            "tiny" if ma.model_name_or_path in ("", "tiny") else "qwen-image"
        )
        preset = _preset(variant, ma.attn_backend, ma.inference_dtype)
        from ...utils.checkpoint import (
            apply_config_json_overrides,
            flux_transformer_overrides_from_config,
            image_vae_overrides_from_config,
            lm_overrides_from_config,
        )

        for pkey, sub, fn in (
            ("transformer", "transformer", flux_transformer_overrides_from_config),
            ("lm", "text_encoder", lm_overrides_from_config),
            ("vae", "vae", image_vae_overrides_from_config),
        ):
            preset[pkey] = apply_config_json_overrides(
                preset[pkey], ma.model_name_or_path, sub, fn)
        if self.training_args.enable_gradient_checkpointing or (
            self.model_args.enable_gradient_checkpointing_override
        ):
            import dataclasses as _dc

            preset["transformer"] = _dc.replace(preset["transformer"], remat=True)
        self.max_length = preset["max_length"]

        self.modules = {
            "transformer": FluxTransformer(preset["transformer"]),
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

        tcfg: FluxConfig = preset["transformer"]
        self.packed_channels = tcfg.in_channels
        key = derive_key("qwen_image_init", self.training_args.seed)
        L = 16
        init_fns = {
            "transformer": lambda m, k: m.init(
                k, jnp.zeros((1, L, tcfg.in_channels)), jnp.zeros((1,)),
                jnp.zeros((1, 4, tcfg.context_dim)), None,
                jnp.zeros((L, 3)), jnp.zeros((4, 3)), None,
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

    # ------------------------------------------------------------------
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
            neg = batch.get("negative_prompt") or [" "] * len(batch["prompt"])
            out["negative_prompt_embeds"] = self.encode_prompt(neg)["prompt_embeds"]
        return out

    # ------------------------------------------------------------------
    # TRUE CFG (reference qwen_image.py uses negative-prompt CFG)
    # ------------------------------------------------------------------
    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        model = self.modules["transformer"]
        dt = self.component_configs["transformer"].compute_dtype
        img_ids = embeds["img_ids"]
        img_ids = img_ids[0] if img_ids.ndim == 3 else img_ids
        txt_ids = embeds["txt_ids"]
        txt_ids = txt_ids[0] if txt_ids.ndim == 3 else txt_ids

        def fwd(x, tt, ctx):
            return model.apply(
                {"params": merged}, x.astype(dt), tt, ctx, None, img_ids, txt_ids, None
            ).astype(jnp.float32)

        if do_cfg:
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate(
                [embeds["negative_prompt_embeds"], embeds["prompt_embeds"]], axis=0
            )
            v = fwd(x2, t2, ctx)
            v_uncond, v_cond = jnp.split(v, 2, axis=0)
            return v_uncond + guidance_scale * (v_cond - v_uncond)
        return fwd(latents, t, embeds["prompt_embeds"])

    def inference(self, negative_prompt=None, negative_prompt_embeds=None, **kwargs):
        ta = self.training_args
        kwargs.pop("pooled_prompt_embeds", None)  # Qwen has no pooled stream
        g = float(kwargs.get("guidance_scale") or ta.guidance_scale)
        extra = kwargs.pop("extra_embeds", None) or {}
        if g > 1.0 and negative_prompt_embeds is None:
            prompts = kwargs.get("prompt")
            n = len(prompts) if prompts is not None else len(kwargs.get("prompt_embeds"))
            neg = list(negative_prompt) if negative_prompt is not None else [" "] * n
            negative_prompt_embeds = self.encode_prompt(neg)["prompt_embeds"]
        if negative_prompt_embeds is not None and g > 1.0:
            extra["negative_prompt_embeds"] = jnp.asarray(negative_prompt_embeds)
        out = super().inference(
            pooled_prompt_embeds=None, extra_embeds=extra, do_cfg_override=(g > 1.0), **kwargs
        )
        if negative_prompt_embeds is None:
            return out

        def _post(samples):
            for i, s in enumerate(samples):
                s.negative_prompt_embeds = np.asarray(negative_prompt_embeds[i], np.float32)
            return samples

        return finish_rollout(out, _post)
