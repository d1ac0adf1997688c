"""FLUX.1 adapter (text→image, packed latents, guidance-distilled).

TPU-native re-design of the reference FLUX.1 adapter
(``src/flow_factory/models/flux/flux1.py``): packed 2×2 latents +
``latent_image_ids`` for RoPE (``flux1.py:141,192``), embedded guidance
instead of CFG batch-doubling (``flux1.py:319-320``), T5 context + CLIP-L
pooled conditioning, dynamic mu-shifted sigma schedule.

Reuses the BaseAdapter scan rollout; only conditioning/packing differ.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import T2ISample
from ...utils.base import derive_key
from ...utils.tokenizer import load_tokenizer
from ...utils.trajectory import build_store_maps
from ..abc import BaseAdapter, PendingRollout
from ..text_encoders import CLIPTextConfig, CLIPTextEncoder, T5Config, T5Encoder
from ..vae import AutoencoderKL, VAEConfig
from .transformer import FluxConfig, FluxTransformer

logger = logging.getLogger(__name__)

FLUX_LORA_TARGETS = (
    r".*double_\d+/(img|txt)_(q|k|v|attn_out)/kernel$",
    r".*double_\d+/(img|txt)_ff/(fc1|fc2)/kernel$",
    r".*single_\d+/(linear1|linear2)/kernel$",
)


def _preset(name: str, attn_backend: str, dtype: str) -> Dict[str, Any]:
    if name == "tiny":
        return dict(
            transformer=FluxConfig.tiny(attn_backend=attn_backend, dtype=dtype),
            vae=VAEConfig.tiny(latent_channels=4, dtype=dtype),
            clip_l=CLIPTextConfig.tiny(hidden_dim=16, num_heads=2, projection_dim=16, dtype=dtype),
            t5=T5Config.tiny(hidden_dim=48, num_heads=2, head_dim=8, dtype=dtype),
            t5_max_length=16,
            clip_max_length=8,
        )
    if name in ("dev", "flux1-dev", "schnell"):
        return dict(
            transformer=FluxConfig.flux1_dev(
                attn_backend=attn_backend, dtype=dtype,
                guidance_embeds=(name != "schnell"),
            ),
            vae=VAEConfig(
                latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159, dtype=dtype
            ),
            clip_l=CLIPTextConfig.clip_l(dtype=dtype),
            t5=T5Config.xxl(dtype=dtype),
            t5_max_length=512,
            clip_max_length=77,
        )
    raise ValueError(f"Unknown FLUX preset {name!r}")


class Flux1Adapter(BaseAdapter):
    sample_class = T2ISample
    default_target_patterns = FLUX_LORA_TARGETS
    embed_keys = ("prompt_embeds", "pooled_prompt_embeds", "img_ids", "txt_ids")

    def pretrained_component_maps(self):
        import functools

        from ...utils.checkpoint import (
            flux_transformer_key_map,
            fuse_flux_single_block_qkv_mlp,
        )

        cfg = self.component_configs.get("transformer")
        if cfg is None:
            return {}
        maps = {"transformer": (
            "transformer",
            flux_transformer_key_map(cfg.num_double_blocks, cfg.num_single_blocks),
            None,
            functools.partial(
                fuse_flux_single_block_qkv_mlp, num_single=cfg.num_single_blocks
            ),
        )}
        from ...utils.checkpoint import clip_text_encoder_key_map, t5_encoder_key_map

        ccfg = self.component_configs.get("text_encoder")
        if ccfg is not None and "text_encoder" in self.params:
            km, rm = clip_text_encoder_key_map(ccfg.num_layers)
            maps["text_encoder"] = ("text_encoder", km, rm, None)
        tcfg = self.component_configs.get("text_encoder_2")
        if tcfg is not None and "text_encoder_2" in self.params:
            km, rm = t5_encoder_key_map(tcfg.num_layers)
            maps["text_encoder_2"] = ("text_encoder_2", km, rm, None)
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
            "tiny" if ma.model_name_or_path in ("", "tiny") else "dev"
        )
        preset = _preset(variant, ma.attn_backend, ma.inference_dtype)
        from ...utils.checkpoint import (
            apply_config_json_overrides,
            clip_text_overrides_from_config,
            flux_transformer_overrides_from_config,
            image_vae_overrides_from_config,
            t5_overrides_from_config,
        )

        for pkey, sub, fn in (
            ("transformer", "transformer", flux_transformer_overrides_from_config),
            ("clip_l", "text_encoder", clip_text_overrides_from_config),
            ("t5", "text_encoder_2", t5_overrides_from_config),
            ("vae", "vae", image_vae_overrides_from_config),
        ):
            preset[pkey] = apply_config_json_overrides(
                preset[pkey], ma.model_name_or_path, sub, fn)
        if self.training_args.enable_gradient_checkpointing or (
            self.model_args.enable_gradient_checkpointing_override
        ):
            import dataclasses as _dc

            preset["transformer"] = _dc.replace(preset["transformer"], remat=True)
        self.t5_max_length = preset["t5_max_length"]
        self.clip_max_length = preset["clip_max_length"]

        self.modules = {
            "transformer": FluxTransformer(preset["transformer"]),
            "vae": AutoencoderKL(preset["vae"]),
            "text_encoder": CLIPTextEncoder(preset["clip_l"]),
            "text_encoder_2": T5Encoder(preset["t5"]),
        }
        self.component_configs = {k: preset[p] for k, p in (
            ("transformer", "transformer"), ("vae", "vae"),
            ("text_encoder", "clip_l"), ("text_encoder_2", "t5"),
        )}
        wanted = getattr(ma, "load_components", None)
        if wanted:
            self.modules = {k: v for k, v in self.modules.items() if k in set(wanted)}

        tcfg: FluxConfig = preset["transformer"]
        self.packed_channels = tcfg.in_channels
        key = derive_key("flux_init", self.training_args.seed)
        L = 16
        init_fns = {
            "transformer": lambda m, k: m.init(
                k,
                jnp.zeros((1, L, tcfg.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, 4, tcfg.context_dim)),
                jnp.zeros((1, tcfg.pooled_dim)),
                jnp.zeros((L, 3)),
                jnp.zeros((4, 3)),
                jnp.zeros((1,)),
            ),
            "vae": lambda m, k: m.init(
                k, jnp.zeros((1, 3, 8 * preset["vae"].downscale, 8 * preset["vae"].downscale))
            ),
            "text_encoder": lambda m, k: m.init(k, jnp.zeros((1, 4), jnp.int32)),
            "text_encoder_2": lambda m, k: m.init(k, jnp.zeros((1, 4), jnp.int32)),
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

        clip_bos = 1 if variant == "tiny" else 49406
        self.tokenizer = load_tokenizer(
            ma.model_name_or_path, "tokenizer", preset["clip_l"].vocab_size,
            self.clip_max_length, eos_token_id=preset["clip_l"].eos_token_id,
            bos_token_id=clip_bos,
        )
        self.tokenizer_2 = load_tokenizer(
            ma.model_name_or_path, "tokenizer_2", preset["t5"].vocab_size,
            self.t5_max_length, eos_token_id=1, pad_token_id=0,
        )
        self.latent_channels = preset["vae"].latent_channels
        self.vae_downscale = preset["vae"].downscale
        self._encode_jit = None
        self._decode_jit = None

    def scheduler_defaults(self) -> Dict[str, Any]:
        # FLUX dynamic shifting (diffusers FluxPipeline defaults)
        return dict(
            use_dynamic_shifting=True,
            base_shift=0.5,
            max_shift=1.15,
            base_image_seq_len=256,
            max_image_seq_len=4096,
        )

    # ------------------------------------------------------------------
    # Packing (reference flux1.py packed latents + latent_image_ids)
    # ------------------------------------------------------------------
    @staticmethod
    def pack_latents(x: jax.Array) -> jax.Array:
        """(B, h, w, c) → (B, h/2·w/2, 4c)."""
        B, h, w, c = x.shape
        x = x.reshape(B, h // 2, 2, w // 2, 2, c)
        x = jnp.einsum("bhpwqc->bhwpqc", x)
        return x.reshape(B, (h // 2) * (w // 2), 4 * c)

    @staticmethod
    def unpack_latents(x: jax.Array, h: int, w: int) -> jax.Array:
        """(B, h/2·w/2, 4c) → (B, h, w, c)."""
        B, L, C = x.shape
        c = C // 4
        x = x.reshape(B, h // 2, w // 2, 2, 2, c)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(B, h, w, c)

    @staticmethod
    def latent_image_ids(h: int, w: int) -> np.ndarray:
        """(h/2·w/2, 3) [0, row, col] coordinates for RoPE."""
        rows, cols = h // 2, w // 2
        ids = np.zeros((rows, cols, 3), np.float32)
        ids[..., 1] = np.arange(rows)[:, None]
        ids[..., 2] = np.arange(cols)[None, :]
        return ids.reshape(rows * cols, 3)

    # ------------------------------------------------------------------
    # Prompt encoding: T5 context + CLIP-L pooled (reference flux1 encode)
    # ------------------------------------------------------------------
    def _encode_impl(self, params, ids_clip, ids_t5):
        clip_out = self.modules["text_encoder"].apply({"params": params["text_encoder"]}, ids_clip)
        t5_emb = self.modules["text_encoder_2"].apply({"params": params["text_encoder_2"]}, ids_t5)
        return t5_emb.astype(jnp.float32), clip_out.pooled.astype(jnp.float32)

    def encode_prompt(self, prompts: Sequence[str], **_) -> Dict[str, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        missing = [k for k in ("text_encoder", "text_encoder_2") if k not in self.params]
        if missing:
            raise RuntimeError(f"Text encoders {missing} not loaded (load_components)")
        ids_clip = self.tokenizer(list(prompts), max_length=self.clip_max_length)["input_ids"]
        ids_t5 = self.tokenizer_2(list(prompts), max_length=self.t5_max_length)["input_ids"]
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self._encode_impl)
        enc_params = {k: self.params[k] for k in ("text_encoder", "text_encoder_2")}
        place = self.encoder_input_place(enc_params)
        embeds, pooled = self._encode_jit(enc_params, place(ids_clip), place(ids_t5))
        return {
            "prompt_embeds": np.asarray(jax.device_get(embeds), np.float32),
            "pooled_prompt_embeds": np.asarray(jax.device_get(pooled), np.float32),
        }

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if batch.get("prompt") is not None:
            out.update(self.encode_prompt(batch["prompt"]))
        return out

    # ------------------------------------------------------------------
    # Velocity: embedded guidance, no CFG batch-doubling
    # ------------------------------------------------------------------
    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        model = self.modules["transformer"]
        dt = self.component_configs["transformer"].compute_dtype
        B = latents.shape[0]
        guidance = jnp.broadcast_to(jnp.asarray(guidance_scale, jnp.float32), (B,))
        # ids may arrive batched from stack_samples (shared per batch)
        img_ids = embeds["img_ids"]
        img_ids = img_ids[0] if img_ids.ndim == 3 else img_ids
        txt_ids = embeds["txt_ids"]
        txt_ids = txt_ids[0] if txt_ids.ndim == 3 else txt_ids
        v = model.apply(
            {"params": merged},
            latents.astype(dt),
            t,
            embeds["prompt_embeds"],
            embeds["pooled_prompt_embeds"],
            img_ids,
            txt_ids,
            guidance,
        )
        return v.astype(jnp.float32)

    # ------------------------------------------------------------------
    # Rollout
    # ------------------------------------------------------------------
    def latent_shape(self, height: int, width: int) -> Tuple[int, int, int]:
        return (height // self.vae_downscale, width // self.vae_downscale, self.latent_channels)

    def inference(
        self,
        prompt: Optional[Sequence[str]] = None,
        prompt_embeds: Optional[np.ndarray] = None,
        pooled_prompt_embeds: Optional[np.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        compute_log_prob: bool = True,
        trajectory_indices: Optional[Any] = "all",
        key: Optional[jax.Array] = None,
        keys: Optional[jax.Array] = None,
        seed: Optional[int] = None,
        trainable: Optional[Dict[str, Any]] = None,
        store_means: bool = False,
        decode: bool = True,
        extra_embeds: Optional[Dict[str, jnp.ndarray]] = None,
        do_cfg_override: Optional[bool] = None,
        defer: bool = False,
        **_,
    ) -> List[T2ISample]:
        ta = self.training_args
        height = height or ta.height
        width = width or ta.width
        T = num_inference_steps or ta.num_inference_steps
        g = float(ta.guidance_scale if guidance_scale is None else guidance_scale)

        if prompt_embeds is None:
            enc = self.encode_prompt(list(prompt))
            prompt_embeds = enc["prompt_embeds"]
            pooled_prompt_embeds = enc.get("pooled_prompt_embeds", pooled_prompt_embeds)
        B = len(prompt_embeds)

        h, w, c = self.latent_shape(height, width)
        seq_len = (h // 2) * (w // 2)
        timesteps = self.scheduler.set_timesteps(T, seq_len=seq_len)
        sigmas = self.scheduler.sigmas
        noise_levels = self.scheduler.get_noise_levels()
        dynamics = "ODE" if self.scheduler.is_eval else self.scheduler.dynamics_type
        maps = build_store_maps(trajectory_indices, T)

        embeds = {
            "prompt_embeds": jnp.asarray(prompt_embeds),
            "img_ids": jnp.asarray(self.latent_image_ids(h, w)),
            "txt_ids": jnp.zeros((np.asarray(prompt_embeds).shape[1], 3), jnp.float32),
        }
        if pooled_prompt_embeds is not None:
            embeds["pooled_prompt_embeds"] = self.stage_pooled(pooled_prompt_embeds)
        if extra_embeds:
            embeds.update(extra_embeds)

        if keys is None:
            if key is None:
                key = derive_key("rollout", seed if seed is not None else ta.seed)
            keys = jax.random.split(key, B)
        x0 = jax.vmap(lambda k: jax.random.normal(k, (h, w, c), jnp.float32))(keys)
        x0 = self.cast_latents(self.pack_latents(x0))
        scan_key = jax.random.fold_in(keys[0], 7)
        x0 = self.shard_batch(x0)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicate = lambda v: jax.device_put(v, NamedSharding(self.mesh, PartitionSpec()))
            embeds = {
                k: (self.shard_batch(v) if v.shape[0] == B else replicate(v))
                for k, v in embeds.items()
            }

        x_final, lat_buf, lp_buf, mean_buf = self.rollout_compute(
            trainable if trainable is not None else self.trainable,
            self.frozen_velocity_params(),
            x0,
            embeds,
            jnp.float32(g),
            self.stage_constant(sigmas),
            self.stage_constant(timesteps),
            self.stage_constant(noise_levels),
            self.stage_constant(maps.latent_store_slot),
            self.stage_constant(maps.logprob_store_slot),
            scan_key,
            do_cfg=bool(do_cfg_override) if do_cfg_override is not None else False,
            compute_log_prob=compute_log_prob,
            dynamics_type=dynamics,
            num_latent_slots=maps.num_latent_slots,
            num_logprob_slots=maps.num_logprob_slots,
            store_means=store_means,
        )

        # async decode dispatch first: device compute overlaps the buffer fetch
        images_dev = (
            self.decode_latents(x_final, height=height, width=width, fetch=False)
            if decode else None
        )

        def _materialize() -> List[T2ISample]:
            images = (
                self.fetch_batch(images_dev, 0) if images_dev is not None else [None] * B
            )
            lat_np = self.fetch_batch(lat_buf, 1).astype(np.float32)
            lp_np = self.fetch_batch(lp_buf, 1)
            mean_np = (
                self.fetch_batch(mean_buf, 1).astype(np.float32) if mean_buf is not None else None
            )
            ts_np = np.asarray(timesteps, np.float32)

            samples: List[T2ISample] = []
            for i in range(B):
                extra = {
                    "sigmas": np.asarray(sigmas, np.float32),
                    "noise_levels": np.asarray(noise_levels, np.float32),
                    "guidance_scale": g,
                    "img_ids": np.asarray(self.latent_image_ids(h, w)),
                    "txt_ids": np.zeros((np.asarray(prompt_embeds).shape[1], 3), np.float32),
                }
                if pooled_prompt_embeds is not None:
                    extra["pooled_prompt_embeds"] = np.asarray(pooled_prompt_embeds[i], np.float32)
                if mean_np is not None:
                    extra["next_latents_mean"] = mean_np[:, i]
                samples.append(
                    self.sample_class(
                        timesteps=ts_np,
                        all_latents=lat_np[:, i],
                        latent_index_map=maps.latent_index_map,
                        log_probs=lp_np[:, i] if compute_log_prob else None,
                        log_prob_index_map=maps.logprob_index_map,
                        height=height,
                        width=width,
                        image=images[i],
                        prompt=prompt[i] if prompt is not None else None,
                        prompt_embeds=np.asarray(prompt_embeds[i], np.float32),
                        extra_kwargs=extra,
                    )
                )
            return samples

        if defer:
            # start D2H now — the copies queue behind the scan/decode
            self.prefetch_to_host(lat_buf, lp_buf, mean_buf, images_dev)
            return PendingRollout(_materialize)
        return _materialize()

    # ------------------------------------------------------------------
    def decode_latents(self, latents: jax.Array, height: int = None, width: int = None,
                       fetch: bool = True) -> np.ndarray:
        """Packed (B, L, 4c) → images (B, 3, H, W) in [0, 1].

        ``fetch=False`` returns the DEVICE array from the async jit dispatch
        (callers overlap the decode with other host fetches)."""
        ta = self.training_args
        height = height or ta.height
        width = width or ta.width
        h, w, _ = self.latent_shape(height, width)
        if self._decode_jit is None:
            def _decode(params, z_packed, h, w):
                z = self.unpack_latents(z_packed.astype(jnp.float32), h, w)
                z = jnp.transpose(z, (0, 3, 1, 2))
                img = self.modules["vae"].apply({"params": params}, z, method=AutoencoderKL.decode)
                return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

            self._decode_jit = jax.jit(_decode, static_argnums=(2, 3))
        out = self._decode_jit(self.params["vae"], latents, h, w)
        if not fetch:
            return out  # device array from the async dispatch
        return np.asarray(jax.device_get(out))
