"""FLUX.2 / FLUX.2-Klein adapters.

TPU-native re-design of the reference FLUX.2 adapters
(``src/flow_factory/models/flux/flux2.py``, ``flux2_klein.py``): same hybrid
double/single-stream DiT family as FLUX.1 but conditioned on a Mistral LM's
hidden states (single text encoder; NO pooled-text conditioning — the
upstream transformer takes only timestep/guidance/LM states,
``flux2.py:816-825``), with multi-reference image conditioning
(sequence-concat, like Kontext) and a caption-upsampling preprocessing
hook — the reference
routes prompts through a VLM rewriter before encoding (``flux2.py:371``);
here the hook is a pluggable callable (identity by default, an LLM client in
deployments).
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.base import derive_key
from ...utils.tokenizer import load_tokenizer
from ..text_encoders.lm import LMConfig, LMEncoder
from ..vae import AutoencoderKL, VAEConfig
from .kontext import Flux1KontextAdapter
from .transformer import FluxConfig, FluxTransformer

logger = logging.getLogger(__name__)


def _preset(name: str, attn_backend: str, dtype: str, mlp_style: str = "gelu_tanh") -> Dict[str, Any]:
    # FLUX.2 has NO pooled-text conditioning: the upstream transformer call
    # passes only timestep/guidance/LM hidden states (reference
    # ``flux2.py:816-825``) — hence pooled_dim=0 in every preset.
    if name == "tiny":
        return dict(
            transformer=FluxConfig.tiny(attn_backend=attn_backend, dtype=dtype, context_dim=32,
                                        pooled_dim=0, mlp_style=mlp_style),
            vae=VAEConfig.tiny(latent_channels=4, dtype=dtype),
            lm=LMConfig.tiny(hidden_dim=32, dtype=dtype),
            max_length=16,
        )
    if name in ("flux2", "dev2"):
        return dict(
            transformer=FluxConfig(
                in_channels=64, hidden_dim=4096, num_heads=32,
                num_double_blocks=24, num_single_blocks=48,
                context_dim=5120, pooled_dim=0, guidance_embeds=True,
                axes_dim=(32, 48, 48), attn_backend=attn_backend, dtype=dtype,
                mlp_style=mlp_style,
            ),
            vae=VAEConfig(latent_channels=16, dtype=dtype),
            lm=LMConfig.mistral_small(dtype=dtype),
            max_length=512,
        )
    if name in ("klein",):
        return dict(
            transformer=FluxConfig(
                in_channels=64, hidden_dim=3072, num_heads=24,
                num_double_blocks=8, num_single_blocks=24,
                context_dim=5120, pooled_dim=0, guidance_embeds=True,
                axes_dim=(16, 56, 56), attn_backend=attn_backend, dtype=dtype,
                mlp_style=mlp_style,
            ),
            vae=VAEConfig(latent_channels=16, dtype=dtype),
            lm=LMConfig.mistral_small(dtype=dtype),
            max_length=512,
        )
    raise ValueError(f"Unknown FLUX.2 preset {name!r}")


class Flux2Adapter(Flux1KontextAdapter):
    """FLUX.2: Mistral conditioning + multi-reference image editing."""

    #: pluggable prompt rewriter (reference: VLM caption upsampling)
    caption_upsampler: Optional[Callable[[List[str]], List[str]]] = None

    def pretrained_component_maps(self):
        import functools

        from ...utils.checkpoint import (
            check_flux2_mlp_style,
            flux2_transformer_key_map,
            lm_decoder_key_map,
            vae_key_map,
        )

        maps = {}
        tcfg = self.component_configs.get("transformer")
        if tcfg is not None:
            km = flux2_transformer_key_map(tcfg.num_double_blocks, tcfg.num_single_blocks)
            guard = functools.partial(check_flux2_mlp_style, mlp_style=tcfg.mlp_style)
            maps["transformer"] = ("transformer", km, None, guard)
        lcfg = self.component_configs.get("text_encoder")
        if lcfg is not None and "text_encoder" in self.params:
            lkm, lrm = lm_decoder_key_map(lcfg.num_layers)
            maps["text_encoder"] = ("text_encoder", lkm, lrm, None)
        vcfg = self.component_configs.get("vae")
        if vcfg is not None and "vae" in self.params:
            maps["vae"] = ("vae", vae_key_map(
                vcfg.channel_mults, vcfg.layers_per_block, vcfg.use_mid_attention), None, None)
        return maps

    def _variant(self) -> str:
        ma = self.model_args
        return getattr(ma, "variant", None) or (
            "tiny" if ma.model_name_or_path in ("", "tiny") else "flux2"
        )

    def load_models(self) -> None:
        ma = self.model_args
        preset = _preset(self._variant(), ma.attn_backend, ma.inference_dtype,
                         mlp_style=getattr(ma, "mlp_style", None) or "gelu_tanh")
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
        key = derive_key("flux2_init", self.training_args.seed)
        L = 16
        init_fns = {
            "transformer": lambda m, k: m.init(
                k, jnp.zeros((1, L, tcfg.in_channels)), jnp.zeros((1,)),
                jnp.zeros((1, 4, tcfg.context_dim)), jnp.zeros((1, tcfg.pooled_dim)),
                jnp.zeros((L, 3)), jnp.zeros((4, 3)), jnp.zeros((1,)),
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

        # built-in caption upsampling (reference: the FLUX.2 VLM rewrites the
        # user prompt before embedding) — the SAME decoder generates via
        # tied-embedding logits, so enabling it loads nothing extra
        if getattr(ma, "use_caption_upsampler", False) and "text_encoder" in self.modules:
            from ..text_encoders.caption import LMCaptionUpsampler

            self.caption_upsampler = LMCaptionUpsampler(
                self.modules["text_encoder"],
                self.params["text_encoder"],
                self.tokenizer,
                max_new_tokens=int(getattr(ma, "caption_max_new_tokens", 24)),
                max_length=min(self.max_length, 96),
            )

    # ------------------------------------------------------------------
    def _encode_impl(self, params, ids, mask):
        emb = self.modules["text_encoder"].apply({"params": params}, ids, mask)
        emb = emb.astype(jnp.float32)
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1).astype(jnp.float32)
        pooled = (emb * mask[..., None]).sum(axis=1) / denom
        return emb, pooled

    def encode_prompt(self, prompts: Sequence[str], **_) -> Dict[str, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        prompts = list(prompts)
        if self.caption_upsampler is not None:
            prompts = self.caption_upsampler(prompts)
        if "text_encoder" not in self.params:
            raise RuntimeError("text_encoder not loaded (load_components)")
        enc = self.tokenizer(prompts, max_length=self.max_length)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self._encode_impl)
        place = self.encoder_input_place(self.params["text_encoder"])
        emb, pooled = self._encode_jit(
            self.params["text_encoder"],
            place(enc["input_ids"]),
            place(enc["attention_mask"]),
        )
        return {
            "prompt_embeds": np.asarray(jax.device_get(emb), np.float32),
            "pooled_prompt_embeds": np.asarray(jax.device_get(pooled), np.float32),
        }


class Flux2KleinAdapter(Flux2Adapter):
    """FLUX.2-Klein: distilled small variant (same code path, klein preset)."""

    def _variant(self) -> str:
        ma = self.model_args
        return getattr(ma, "variant", None) or (
            "tiny" if ma.model_name_or_path in ("", "tiny") else "klein"
        )
