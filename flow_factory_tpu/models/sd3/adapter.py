"""SD3.5 adapter: encode → scan rollout → replay forward → decode.

TPU-native re-design of the reference SD3.5 adapter
(``src/flow_factory/models/stable_diffusion/sd3_5.py``). Differences that
matter:

* The whole denoise loop is ONE jitted ``lax.scan`` over timesteps with
  CFG batch-doubling inside (reference loops in Python per step,
  ``sd3_5.py:273-304``). Selective trajectory storage is a scatter into a
  compact buffer carried through the scan (garbage-slot trick), so per-epoch
  SDE-step redraws never recompile.
* LoRA merge happens ONCE per rollout (outside the scan), not per step.
* ``training_forward`` replays a stored transition through the *same*
  ``sde_step`` math (fp32 + storage-dtype round trip), so the replay ratio
  ``exp(new_lp − old_lp) == 1`` invariant holds by construction
  (reference parity method, ``.agents/knowledge/topics/train_inference_consistency.md``).
* Text encoders (CLIP-L/G penultimate states + T5) and the VAE are frozen
  bf16 pytrees; encoding runs jitted in preprocessing
  (reference ``sd3_5.py:217-236`` encode path).
"""
from __future__ import annotations

import functools
import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import T2ISample
from ...scheduler.flow_match_euler import sde_step
from ...utils.base import derive_key, key_for_prompt
from ...utils.trajectory import build_store_maps
from ...utils.tokenizer import load_tokenizer
from ..abc import BaseAdapter, PendingRollout
from ..text_encoders import CLIPTextConfig, CLIPTextEncoder, T5Config, T5Encoder
from ..vae import AutoencoderKL, VAEConfig
from .transformer import MMDiTConfig, SD3Transformer

logger = logging.getLogger(__name__)


def _preset(name: str, attn_backend: str, inference_dtype: str) -> Dict[str, Any]:
    if name == "tiny":
        return dict(
            transformer=MMDiTConfig.tiny(
                context_dim=48, pooled_dim=40, attn_backend=attn_backend, dtype=inference_dtype
            ),
            vae=VAEConfig.tiny(dtype=inference_dtype),
            clip_l=CLIPTextConfig.tiny(hidden_dim=16, num_heads=2, projection_dim=16, dtype=inference_dtype),
            clip_g=CLIPTextConfig.tiny(hidden_dim=24, num_heads=2, projection_dim=24, dtype=inference_dtype),
            t5=T5Config.tiny(hidden_dim=48, num_heads=2, head_dim=8, dtype=inference_dtype),
            t5_max_length=16,
            clip_max_length=8,
        )
    if name in ("medium", "sd3.5-medium"):
        return dict(
            transformer=MMDiTConfig.sd3_5_medium(attn_backend=attn_backend, dtype=inference_dtype),
            vae=VAEConfig.sd3(dtype=inference_dtype),
            clip_l=CLIPTextConfig.clip_l(dtype=inference_dtype),
            clip_g=CLIPTextConfig.clip_g(dtype=inference_dtype),
            t5=T5Config.xxl(dtype=inference_dtype),
            t5_max_length=256,
            clip_max_length=77,
        )
    if name in ("large", "sd3.5-large"):
        return dict(
            transformer=MMDiTConfig.sd3_5_large(attn_backend=attn_backend, dtype=inference_dtype),
            vae=VAEConfig.sd3(dtype=inference_dtype),
            clip_l=CLIPTextConfig.clip_l(dtype=inference_dtype),
            clip_g=CLIPTextConfig.clip_g(dtype=inference_dtype),
            t5=T5Config.xxl(dtype=inference_dtype),
            t5_max_length=256,
            clip_max_length=77,
        )
    raise ValueError(f"Unknown SD3.5 preset {name!r}")


class SD35Adapter(BaseAdapter):
    sample_class = T2ISample
    # sequence context is .astype(compute_dtype) at first use in BOTH
    # rollout and replay (stage_context validity); pooled embeds feed fp32
    # timestep modulation and must stay fp32
    wire_context_keys = ("prompt_embeds", "negative_prompt_embeds")

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------
    def pretrained_component_maps(self):
        from ...utils.checkpoint import (
            clip_text_encoder_key_map,
            sd3_transformer_key_map,
            t5_encoder_key_map,
        )

        cfg = self.component_configs.get("transformer")
        if cfg is None:
            return {}
        maps = {"transformer": (
            "transformer",
            sd3_transformer_key_map(cfg.depth, cfg.dual_attention_layers),
            # the positional grid is a buffer in upstream state dicts
            {"pos_embed.pos_embed": "pos_embed/pos_embed"},
            None,
        )}
        for comp, sub in (("text_encoder", "text_encoder"),
                          ("text_encoder_2", "text_encoder_2")):
            ccfg = self.component_configs.get(comp)
            if ccfg is not None and comp in self.params:
                km, rm = clip_text_encoder_key_map(ccfg.num_layers)
                maps[comp] = (sub, km, rm, None)
        tcfg = self.component_configs.get("text_encoder_3")
        if tcfg is not None and "text_encoder_3" in self.params:
            km, rm = t5_encoder_key_map(tcfg.num_layers)
            maps["text_encoder_3"] = ("text_encoder_3", km, rm, None)
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
            "tiny" if ma.model_name_or_path in ("", "tiny") else "medium"
        )
        preset = _preset(variant, ma.attn_backend, ma.inference_dtype)
        from ...utils.checkpoint import (
            apply_config_json_overrides,
            clip_text_overrides_from_config,
            image_vae_overrides_from_config,
            sd3_transformer_overrides_from_config,
            t5_overrides_from_config,
        )

        for pkey, sub, fn in (
            ("transformer", "transformer", sd3_transformer_overrides_from_config),
            ("clip_l", "text_encoder", clip_text_overrides_from_config),
            ("clip_g", "text_encoder_2", clip_text_overrides_from_config),
            ("t5", "text_encoder_3", t5_overrides_from_config),
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
            "transformer": SD3Transformer(preset["transformer"]),
            "vae": AutoencoderKL(preset["vae"]),
            "text_encoder": CLIPTextEncoder(preset["clip_l"]),
            "text_encoder_2": CLIPTextEncoder(preset["clip_g"]),
            "text_encoder_3": T5Encoder(preset["t5"]),
        }
        self.component_configs = {
            "transformer": preset["transformer"],
            "vae": preset["vae"],
            "text_encoder": preset["clip_l"],
            "text_encoder_2": preset["clip_g"],
            "text_encoder_3": preset["t5"],
        }

        # Component selection: ``load_components`` (model-config extra) lets
        # callers skip unused components — e.g. the bench harness loads only
        # the transformer; a preprocessing-only worker loads only encoders.
        wanted = getattr(ma, "load_components", None)
        if wanted:
            self.modules = {k: v for k, v in self.modules.items() if k in set(wanted)}

        key = derive_key("sd35_init", self.training_args.seed)
        tcfg: MMDiTConfig = preset["transformer"]
        init_fns = {
            "transformer": lambda m, k: m.init(
                k,
                jnp.zeros((1, 8 * tcfg.patch_size, 8 * tcfg.patch_size, tcfg.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, 4, tcfg.context_dim)),
                jnp.zeros((1, tcfg.pooled_dim)),
            ),
            "vae": lambda m, k: m.init(
                k, jnp.zeros((1, 3, 8 * preset["vae"].downscale, 8 * preset["vae"].downscale))
            ),
            "text_encoder": lambda m, k: m.init(k, jnp.zeros((1, 4), jnp.int32)),
            "text_encoder_2": lambda m, k: m.init(k, jnp.zeros((1, 4), jnp.int32)),
            "text_encoder_3": lambda m, k: m.init(k, jnp.zeros((1, 4), jnp.int32)),
        }

        # Init on HOST RAM (large models would OOM HBM in fp32), cast frozen
        # params to inference dtype (reference mixed-precision policy,
        # models/abc.py:800-856 — only the trainable pytree is master-dtype),
        # then place hot components on the accelerator.
        cast = lambda tree: jax.tree.map(
            lambda x: x.astype(self.inference_dtype) if x.dtype == jnp.float32 else x, tree
        )
        self.params = {}
        with self.init_device_context():
            for i, (comp, module) in enumerate(self.modules.items()):
                p = self.run_init(  # ONE jitted program, not per-op dispatch
                    init_fns[comp], module, jax.random.fold_in(key, i))["params"]
                if not (self.model_args.finetune_type == "full" and comp == "transformer"):
                    p = cast(p)
                self.params[comp] = p
        if jax.local_devices()[0].platform != "cpu" and self.mesh is None:
            # hot path on-device; encoders onload lazily at preprocessing
            if "transformer" in self.params:
                self.params["transformer"] = jax.device_put(
                    self.params["transformer"], jax.local_devices()[0]
                )
            if "vae" in self.params:
                self.params["vae"] = jax.device_put(self.params["vae"], jax.local_devices()[0])

        clip_bos = 1 if variant == "tiny" else 49406
        self.tokenizer = load_tokenizer(
            ma.model_name_or_path, "tokenizer", preset["clip_l"].vocab_size,
            self.clip_max_length, eos_token_id=preset["clip_l"].eos_token_id,
            bos_token_id=clip_bos,
        )
        self.tokenizer_2 = load_tokenizer(
            ma.model_name_or_path, "tokenizer_2", preset["clip_g"].vocab_size,
            self.clip_max_length, eos_token_id=preset["clip_g"].eos_token_id,
            bos_token_id=clip_bos,
        )
        self.tokenizer_3 = load_tokenizer(
            ma.model_name_or_path, "tokenizer_3", preset["t5"].vocab_size,
            self.t5_max_length, eos_token_id=1, pad_token_id=0,
        )

        self.latent_channels = preset["vae"].latent_channels
        self.vae_downscale = preset["vae"].downscale
        self._encode_jit = None
        self._decode_jit = None
        self._rollout_jit = None

    def scheduler_defaults(self) -> Dict[str, Any]:
        # SD3 uses resolution-aware dynamic shifting (reference
        # sd3_5.py:253-263 + scheduler/flow_match_euler_discrete.py:37-77).
        return dict(use_dynamic_shifting=True)

    # ------------------------------------------------------------------
    # Prompt encoding
    # ------------------------------------------------------------------
    def _encode_impl(self, params, ids_l, ids_g, ids_t5):
        out_l = self.modules["text_encoder"].apply({"params": params["text_encoder"]}, ids_l)
        out_g = self.modules["text_encoder_2"].apply({"params": params["text_encoder_2"]}, ids_g)
        t5_emb = self.modules["text_encoder_3"].apply({"params": params["text_encoder_3"]}, ids_t5)
        clip_emb = jnp.concatenate(
            [out_l.penultimate_hidden_state, out_g.penultimate_hidden_state], axis=-1
        )
        t5_dim = t5_emb.shape[-1]
        clip_emb = jnp.pad(clip_emb, ((0, 0), (0, 0), (0, t5_dim - clip_emb.shape[-1])))
        prompt_embeds = jnp.concatenate([clip_emb, t5_emb.astype(clip_emb.dtype)], axis=1)
        pooled = jnp.concatenate([out_l.pooled, out_g.pooled], axis=-1)
        return prompt_embeds.astype(jnp.float32), pooled.astype(jnp.float32)

    def encode_prompt(self, prompts: Sequence[str], **_) -> Dict[str, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        missing = [k for k in ("text_encoder", "text_encoder_2", "text_encoder_3") if k not in self.params]
        if missing:
            raise RuntimeError(
                f"Text encoders {missing} were not loaded (load_components config); "
                "cannot encode prompts"
            )
        ids_l = self.tokenizer(list(prompts), max_length=self.clip_max_length)["input_ids"]
        ids_g = self.tokenizer_2(list(prompts), max_length=self.clip_max_length)["input_ids"]
        ids_t5 = self.tokenizer_3(list(prompts), max_length=self.t5_max_length)["input_ids"]
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self._encode_impl)
        enc_params = {
            k: self.params[k] for k in ("text_encoder", "text_encoder_2", "text_encoder_3")
        }
        # run where the encoder params live (host until onloaded / mesh)
        place = self.encoder_input_place(enc_params)
        embeds, pooled = self._encode_jit(
            enc_params, place(ids_l), place(ids_g), place(ids_t5)
        )
        return {
            "prompt_embeds": np.asarray(jax.device_get(embeds), np.float32),
            "pooled_prompt_embeds": np.asarray(jax.device_get(pooled), np.float32),
        }

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        prompts = batch.get("prompt")
        if prompts is not None:
            out.update(self.encode_prompt(prompts))
            neg = batch.get("negative_prompt") or [""] * len(prompts)
            neg_out = self.encode_prompt(neg)
            out["negative_prompt_embeds"] = neg_out["prompt_embeds"]
            out["negative_pooled_prompt_embeds"] = neg_out["pooled_prompt_embeds"]
        return out

    # ------------------------------------------------------------------
    # Core compute (pure, jit-compatible)
    # ------------------------------------------------------------------
    def _velocity(
        self,
        merged_tparams: Any,
        latents: jax.Array,  # (B, H, W, C) fp32
        t: jax.Array,  # (B,) scheduler scale
        embeds: Dict[str, jax.Array],
        guidance_scale: jax.Array,
        do_cfg: bool,
    ) -> jax.Array:
        model = self.modules["transformer"]
        dt = self.component_configs["transformer"].compute_dtype
        if do_cfg:
            x2 = jnp.concatenate([latents, latents], axis=0).astype(dt)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate(
                [embeds["negative_prompt_embeds"], embeds["prompt_embeds"]], axis=0
            )
            pooled = jnp.concatenate(
                [embeds["negative_pooled_prompt_embeds"], embeds["pooled_prompt_embeds"]], axis=0
            )
            v = model.apply({"params": merged_tparams}, x2, t2, ctx, pooled)
            v_uncond, v_cond = jnp.split(v.astype(jnp.float32), 2, axis=0)
            return v_uncond + guidance_scale * (v_cond - v_uncond)
        v = model.apply(
            {"params": merged_tparams},
            latents.astype(dt),
            t,
            embeds["prompt_embeds"],
            embeds["pooled_prompt_embeds"],
        )
        return v.astype(jnp.float32)

    # ------------------------------------------------------------------
    # Rollout → samples
    # ------------------------------------------------------------------
    def latent_shape(self, height: int, width: int) -> Tuple[int, int, int]:
        return (height // self.vae_downscale, width // self.vae_downscale, self.latent_channels)

    def inference(
        self,
        prompt: Optional[Sequence[str]] = None,
        prompt_embeds: Optional[np.ndarray] = None,
        pooled_prompt_embeds: Optional[np.ndarray] = None,
        negative_prompt: Optional[Sequence[str]] = None,
        negative_prompt_embeds: Optional[np.ndarray] = None,
        negative_pooled_prompt_embeds: Optional[np.ndarray] = None,
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
        defer: bool = False,
        **_,
    ) -> List[T2ISample]:
        ta = self.training_args
        height = height or ta.height
        width = width or ta.width
        T = num_inference_steps or ta.num_inference_steps
        g = float(ta.guidance_scale if guidance_scale is None else guidance_scale)
        do_cfg = g > 1.0

        # --- embeddings
        if prompt_embeds is None:
            enc = self.encode_prompt(list(prompt))
            prompt_embeds, pooled_prompt_embeds = enc["prompt_embeds"], enc["pooled_prompt_embeds"]
        if do_cfg and negative_prompt_embeds is None:
            neg = list(negative_prompt) if negative_prompt is not None else [""] * len(prompt_embeds)
            enc = self.encode_prompt(neg)
            negative_prompt_embeds = enc["prompt_embeds"]
            negative_pooled_prompt_embeds = enc["pooled_prompt_embeds"]
        B = len(prompt_embeds)
        # Sequence context ships over the wire in the compute dtype: the
        # transformer's first use is `.astype(dt)` into context_embedder
        # (sd3/transformer.py:218) in BOTH rollout and replay, so the host
        # cast is bit-identical (see BaseAdapter.stage_context; 43.6 MB fp32
        # per CFG side at the bench geometry → halved H2D). Pooled stays
        # fp32 — it feeds the fp32 timestep-modulation MLP.
        embeds = {
            "prompt_embeds": self.stage_context(prompt_embeds),
            "pooled_prompt_embeds": self.stage_pooled(pooled_prompt_embeds),
        }
        if do_cfg:
            embeds["negative_prompt_embeds"] = self.stage_context(negative_prompt_embeds)
            embeds["negative_pooled_prompt_embeds"] = self.stage_pooled(
                negative_pooled_prompt_embeds
            )

        # --- schedule (mu from seq len: dynamic shifting)
        h, w, c = self.latent_shape(height, width)
        seq_len = (h // self.component_configs["transformer"].patch_size) * (
            w // self.component_configs["transformer"].patch_size
        )
        timesteps = self.scheduler.set_timesteps(T, seq_len=seq_len)
        sigmas = self.scheduler.sigmas
        noise_levels = self.scheduler.get_noise_levels()
        dynamics = "ODE" if self.scheduler.is_eval else self.scheduler.dynamics_type

        maps = build_store_maps(trajectory_indices, T)

        # --- initial noise
        if keys is None:
            if key is None:
                key = derive_key("rollout", seed if seed is not None else ta.seed)
            keys = jax.random.split(key, B)
        x0 = jax.vmap(lambda k: jax.random.normal(k, (h, w, c), jnp.float32))(keys)
        x0 = self.cast_latents(x0)
        scan_key = jax.random.fold_in(keys[0], 7)
        # SPMD: shard the batch over the mesh data axes; params are already
        # mesh-placed, so XLA runs one replica per device.
        x0 = self.shard_batch(x0)
        embeds = self.shard_batch(embeds)

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
            do_cfg=do_cfg,
            compute_log_prob=compute_log_prob,
            dynamics_type=dynamics,
            num_latent_slots=maps.num_latent_slots,
            num_logprob_slots=maps.num_logprob_slots,
            store_means=store_means,
        )

        # dispatch the VAE decode asynchronously FIRST: its device compute
        # overlaps the trajectory-buffer host fetch below (the fetch rides
        # the tunnel/PCIe while the VAE occupies the chip)
        images_dev = self.decode_latents(x_final, fetch=False) if decode else None

        def _materialize() -> List[T2ISample]:
            # --- host fetch + per-sample construction. Buffers transfer in
            # their STORAGE dtype (fp16 halves the wire) and upcast on host —
            # bit-identical to the old on-device fp32 cast.
            lat_np = self.fetch_batch(lat_buf, 1).astype(np.float32)  # (S, B, h, w, c)
            lp_np = self.fetch_batch(lp_buf, 1)  # (L, B)
            mean_np = (
                self.fetch_batch(mean_buf, 1).astype(np.float32)
                if mean_buf is not None else None
            )
            images = (
                self.fetch_batch(images_dev, 0).astype(np.float32, copy=False)
                if images_dev is not None else [None] * B
            )
            ts_np = np.asarray(timesteps, np.float32)

            samples: List[T2ISample] = []
            for i in range(B):
                extra = {
                    "sigmas": np.asarray(sigmas, np.float32),
                    "noise_levels": np.asarray(noise_levels, np.float32),
                    "guidance_scale": g,
                }
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
                        negative_prompt_embeds=(
                            np.asarray(negative_prompt_embeds[i], np.float32) if do_cfg else None
                        ),
                        extra_kwargs=extra,
                    )
                )
                if pooled_prompt_embeds is not None:
                    samples[-1].extra_kwargs["pooled_prompt_embeds"] = np.asarray(
                        pooled_prompt_embeds[i], np.float32
                    )
                    if do_cfg:
                        samples[-1].extra_kwargs["negative_pooled_prompt_embeds"] = np.asarray(
                            negative_pooled_prompt_embeds[i], np.float32
                        )
            return samples

        if defer:
            # everything device-side is dispatched; start the D2H copies now
            # (they queue behind the scan/decode) and let the caller overlap
            # the host fetch with the next batch's compute
            self.prefetch_to_host(lat_buf, lp_buf, mean_buf, images_dev)
            return PendingRollout(_materialize)
        return _materialize()

    # ------------------------------------------------------------------
    # Decoding
    # ------------------------------------------------------------------
    def decode_latents(self, latents: jax.Array, fetch: bool = True):
        """(B, h, w, c) latents → (B, 3, H, W) float images in [0, 1].

        ``fetch=False`` returns the DEVICE array from the async jit dispatch
        (callers overlap the decode with other host fetches)."""
        if self._decode_jit is None:
            wire = self.image_wire_dtype()

            def _decode(params, z_nhwc):
                z = jnp.transpose(z_nhwc, (0, 3, 1, 2))
                img = self.modules["vae"].apply({"params": params}, z, method=AutoencoderKL.decode)
                img = jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
                return img if wire is None else img.astype(wire)

            self._decode_jit = jax.jit(_decode)
        out = self._decode_jit(self.params["vae"], latents.astype(jnp.float32))
        if not fetch:
            return out
        return np.asarray(jax.device_get(out)).astype(np.float32, copy=False)

    def encode_image(self, images_nchw: np.ndarray, key: Optional[jax.Array] = None) -> np.ndarray:
        """(B, 3, H, W) in [0,1] → latents (B, h, w, c) NHWC fp32 (host)."""
        def _encode(params, img, k):
            z = self.modules["vae"].apply(
                {"params": params}, img * 2.0 - 1.0, k, sample=k is not None,
                method=AutoencoderKL.encode,
            )
            return jnp.transpose(z, (0, 2, 3, 1)).astype(jnp.float32)

        out = jax.jit(_encode)(self.params["vae"], jnp.asarray(images_nchw, jnp.float32), key)
        return np.asarray(jax.device_get(out))
