"""Wan 2.x text→video adapter.

TPU-native re-design of the reference Wan T2V adapter
(``src/flow_factory/models/wan/wan2_t2v.py``): 5-D latents (B, T, H, W, C),
UMT5 text conditioning, true-CFG batch doubling (``wan2_t2v.py:510-528``),
UniPC-SDE scheduler (training math == Euler-SDE; UniPC update in eval), and
Wan2.2's temporal MoE — two expert transformers routed by
``boundary_ratio``-derived boundary timestep, each with its own guidance
scale (``wan2_t2v.py:474-490``) — expressed as a ``lax.cond`` over two
parameter pytrees (both mesh-resident, one executed per step).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import T2VSample
from ...utils.base import derive_key
from ...utils.tokenizer import load_tokenizer
from ...utils.trajectory import build_store_maps
from ..abc import BaseAdapter, PendingRollout
from ..text_encoders import T5Config, T5Encoder
from .transformer import WanConfig, WanTransformer
from .video_vae import VideoVAE, VideoVAEConfig

logger = logging.getLogger(__name__)

WAN_LORA_TARGETS = (
    r".*block_\d+/(sa|ca)_(q|k|v|out)/kernel$",
    r".*block_\d+/(ffn1|ffn2)/kernel$",
)


def _preset(name: str, attn_backend: str, dtype: str) -> Dict[str, Any]:
    if name == "tiny":
        return dict(
            transformer=WanConfig.tiny(attn_backend=attn_backend, dtype=dtype, context_dim=32),
            vae=VideoVAEConfig.tiny(latent_channels=16, dtype=dtype),
            t5=T5Config.tiny(hidden_dim=32, num_heads=2, head_dim=8, dtype=dtype),
            t5_max_length=16,
            boundary_ratio=None,
        )
    if name in ("1.3b", "wan2.1-1.3b", "t2v-1.3b"):
        return dict(
            transformer=WanConfig.wan21_1_3b(attn_backend=attn_backend, dtype=dtype),
            vae=VideoVAEConfig.wan(dtype=dtype),
            t5=T5Config.umt5_xxl(dtype=dtype),
            t5_max_length=512,
            boundary_ratio=None,
        )
    if name in ("14b", "wan2.1-14b"):
        return dict(
            transformer=WanConfig.wan21_14b(attn_backend=attn_backend, dtype=dtype),
            vae=VideoVAEConfig.wan(dtype=dtype),
            t5=T5Config.umt5_xxl(dtype=dtype),
            t5_max_length=512,
            boundary_ratio=None,
        )
    if name in ("wan2.2-a14b", "a14b"):
        return dict(
            transformer=WanConfig.wan21_14b(attn_backend=attn_backend, dtype=dtype),
            vae=VideoVAEConfig.wan(dtype=dtype),
            t5=T5Config.umt5_xxl(dtype=dtype),
            t5_max_length=512,
            boundary_ratio=0.875,  # high-noise expert above t = 875
        )
    if name in ("wan2.2-ti2v-5b", "ti2v-5b", "5b"):
        # Wan 2.2 TI2V-5B: dense 5B DiT over the 48-channel 16×16×4 VAE
        # (expand_timesteps conditioning lives in the I2V adapter)
        return dict(
            transformer=WanConfig(
                in_channels=48, out_channels=48, hidden_dim=3072, ffn_dim=14336,
                num_heads=24, num_layers=30, axes_dim=(44, 42, 42),
                attn_backend=attn_backend, dtype=dtype,
            ),
            vae=VideoVAEConfig.wan22_5b(dtype=dtype),
            t5=T5Config.umt5_xxl(dtype=dtype),
            t5_max_length=512,
            boundary_ratio=None,
        )
    raise ValueError(f"Unknown Wan preset {name!r}")


class WanT2VAdapter(BaseAdapter):
    sample_class = T2VSample
    default_target_patterns = WAN_LORA_TARGETS
    default_scheduler = "unipc"

    def pretrained_component_maps(self):
        from ...utils.checkpoint import wan_transformer_key_map

        cfg = self.component_configs.get("transformer")
        if cfg is None:
            return {}
        km, rm = wan_transformer_key_map(
            cfg.num_layers, i2v=bool(cfg.image_context_tokens)
        )
        maps = {"transformer": ("transformer", km, rm, None)}
        if "transformer_2" in self.modules:
            maps["transformer_2"] = ("transformer_2", km, rm, None)
        from ...utils.checkpoint import t5_encoder_key_map, wan_vae_key_map

        tcfg = self.component_configs.get("text_encoder")
        if tcfg is not None and "text_encoder" in self.params:
            tkm, trm = t5_encoder_key_map(
                tcfg.num_layers, per_layer_rel_bias=tcfg.per_layer_rel_bias)
            maps["text_encoder"] = ("text_encoder", tkm, trm, None)
        vcfg = self.component_configs.get("vae")
        if vcfg is not None and "vae" in self.params:
            vkm, vrm = wan_vae_key_map(
                vcfg.channel_mults, vcfg.layers_per_block, vcfg.temporal_down,
                vcfg.attn_scales, vcfg.base_channels,
                residual=vcfg.resample_residual,
            )
            maps["vae"] = ("vae", vkm, vrm, None)
        return maps

    def load_models(self) -> None:
        ma = self.model_args
        variant = getattr(ma, "variant", None) or (
            "tiny" if ma.model_name_or_path in ("", "tiny") else "1.3b"
        )
        preset = _preset(variant, ma.attn_backend, ma.inference_dtype)
        import dataclasses as _dc

        from ...utils.checkpoint import (
            apply_config_json_overrides,
            t5_overrides_from_config,
            wan_transformer_overrides_from_config,
        )

        preset["transformer"] = apply_config_json_overrides(
            preset["transformer"], ma.model_name_or_path, "transformer",
            wan_transformer_overrides_from_config)
        preset["t5"] = apply_config_json_overrides(
            preset["t5"], ma.model_name_or_path, "text_encoder", t5_overrides_from_config)
        if self.training_args.enable_gradient_checkpointing or (
            self.model_args.enable_gradient_checkpointing_override
        ):
            preset["transformer"] = _dc.replace(preset["transformer"], remat=True)
        # a real checkpoint directory self-configures the VAE graph +
        # latent normalization from its diffusers config.json ...
        import os as _os

        if ma.model_name_or_path and _os.path.isdir(ma.model_name_or_path):
            from ...utils.checkpoint import (
                load_component_config,
                wan_vae_overrides_from_config,
            )

            vcfg_json = load_component_config(ma.model_name_or_path, "vae")
            if vcfg_json:
                preset["vae"] = _dc.replace(
                    preset["vae"], **wan_vae_overrides_from_config(vcfg_json))
        # ... and explicit config-level knobs win (e.g. Wan 2.2:
        # `vae_overrides: {spatial_patch: 2, resample_residual: true}`)
        vo = getattr(ma, "vae_overrides", None)
        if vo:
            preset["vae"] = _dc.replace(
                preset["vae"], **{k: (tuple(v) if isinstance(v, list) else v)
                                  for k, v in dict(vo).items()})
        # same for the transformer (e.g. depth-reduced 14B-geometry
        # validation runs: `transformer_overrides: {num_layers: 1}` —
        # __graft_entry__.dryrun_multichip shards the exact 14B block
        # geometry this way)
        to = getattr(ma, "transformer_overrides", None)
        if to:
            preset["transformer"] = _dc.replace(
                preset["transformer"], **{k: (tuple(v) if isinstance(v, list) else v)
                                          for k, v in dict(to).items()})
        self.t5_max_length = preset["t5_max_length"]
        self.boundary_ratio = getattr(ma, "boundary_ratio", None) or preset["boundary_ratio"]

        self.modules = {
            "transformer": WanTransformer(preset["transformer"]),
            "vae": VideoVAE(preset["vae"]),
            "text_encoder": T5Encoder(preset["t5"]),
        }
        if self.boundary_ratio is not None:
            self.modules["transformer_2"] = WanTransformer(preset["transformer"])
        self.component_configs = {
            "transformer": preset["transformer"],
            "vae": preset["vae"],
            "text_encoder": preset["t5"],
        }
        wanted = getattr(ma, "load_components", None)
        if wanted:
            self.modules = {k: v for k, v in self.modules.items() if k in set(wanted)}

        tcfg: WanConfig = preset["transformer"]
        vcfg: VideoVAEConfig = preset["vae"]
        key = derive_key("wan_init", self.training_args.seed)
        lat = jnp.zeros((1, 2, 2 * tcfg.patch_size[1], 2 * tcfg.patch_size[2], tcfg.in_channels))
        init_fns = {
            "transformer": lambda m, k: m.init(k, lat, jnp.zeros((1,)), jnp.zeros((1, 4, tcfg.context_dim))),
            "transformer_2": lambda m, k: m.init(k, lat, jnp.zeros((1,)), jnp.zeros((1, 4, tcfg.context_dim))),
            "vae": lambda m, k: m.init(
                k, jnp.zeros((1, 3, 5, vcfg.spatial_down * 2, vcfg.spatial_down * 2))
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
                if not (ma.finetune_type == "full" and comp.startswith("transformer")):
                    p = cast(p)
                self.params[comp] = p
        if jax.local_devices()[0].platform != "cpu" and self.mesh is None:
            for comp in ("transformer", "transformer_2", "vae"):
                if comp in self.params:
                    self.params[comp] = jax.device_put(self.params[comp], jax.local_devices()[0])

        self.tokenizer = load_tokenizer(
            ma.model_name_or_path, "tokenizer", preset["t5"].vocab_size,
            self.t5_max_length, eos_token_id=1, pad_token_id=0,
        )
        self.latent_channels = vcfg.latent_channels
        self.vae_spatial_down = vcfg.spatial_down
        self.vae_temporal_down = vcfg.temporal_down
        self._encode_jit = None
        self._decode_jit = None

    @property
    def trainable_components(self) -> Tuple[str, ...]:
        # Wan2.2 MoE trains BOTH experts (reference wan2_t2v.py:64-71
        # applies LoRA to ['transformer', 'transformer_2'])
        comps = super().trainable_components
        if self.boundary_ratio is not None and "transformer_2" in self.params:
            if comps == ("transformer",):
                comps = ("transformer", "transformer_2")
        return comps

    def scheduler_defaults(self) -> Dict[str, Any]:
        # Wan: static flow shift (no resolution-dynamic mu)
        return dict(shift=float(getattr(self.training_args, "flow_shift", 3.0)))

    # ------------------------------------------------------------------
    def _encode_impl(self, params, ids):
        emb = self.modules["text_encoder"].apply({"params": params}, ids)
        return emb.astype(jnp.float32)

    def encode_prompt(self, prompts: Sequence[str], **_) -> Dict[str, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        if "text_encoder" not in self.params:
            raise RuntimeError("text_encoder not loaded (load_components)")
        ids = self.tokenizer(list(prompts), max_length=self.t5_max_length)["input_ids"]
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self._encode_impl)
        place = self.encoder_input_place(self.params["text_encoder"])
        emb = self._encode_jit(self.params["text_encoder"], place(ids))
        return {"prompt_embeds": np.asarray(jax.device_get(emb), np.float32)}

    def preprocess_func(self, batch: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if batch.get("prompt") is not None:
            out.update(self.encode_prompt(batch["prompt"]))
            neg = batch.get("negative_prompt") or [""] * len(batch["prompt"])
            out["negative_prompt_embeds"] = self.encode_prompt(neg)["prompt_embeds"]
        return out

    embed_keys = ("prompt_embeds", "negative_prompt_embeds")
    # UMT5 context casts to compute dtype at first use (transformer.py:204)
    wire_context_keys = ("prompt_embeds", "negative_prompt_embeds")

    # ------------------------------------------------------------------
    def _apply_expert(self, merged, latents, t, ctx):
        return self.modules["transformer"].apply({"params": merged}, latents, t, ctx)

    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        """merged may be a single param tree or (low, high) expert pair."""
        dt = self.component_configs["transformer"].compute_dtype
        img_ctx = embeds.get("image_embeds")  # Wan2.1 I2V CLIP tokens (optional)

        def run(params, module_name, x, tt, ctx, cimg):
            return self.modules[module_name].apply(
                {"params": params}, x.astype(dt), tt, ctx,
                encoder_hidden_states_image=cimg,
            )

        def forward_once(x, tt, ctx, cimg):
            if isinstance(merged, tuple):
                low, high = merged
                boundary = jnp.float32(self.boundary_ratio * 1000.0)
                # with per-frame timesteps (B, gt), route on the denoising t
                # (max over frames: conditioned frames are pinned to 0)
                t_route = tt[0] if tt.ndim == 1 else jnp.max(tt[0])
                return jax.lax.cond(
                    t_route >= boundary,
                    lambda args: run(high, "transformer_2", *args),
                    lambda args: run(low, "transformer", *args),
                    (x, tt, ctx, cimg),
                )
            return run(merged, "transformer", x, tt, ctx, cimg)

        if do_cfg:
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate(
                [embeds["negative_prompt_embeds"], embeds["prompt_embeds"]], axis=0
            ).astype(dt)
            # image conditioning is not CFG-dropped (same embeds both branches)
            cimg = None if img_ctx is None else jnp.concatenate([img_ctx, img_ctx], axis=0)
            v = forward_once(x2, t2, ctx, cimg).astype(jnp.float32)
            v_uncond, v_cond = jnp.split(v, 2, axis=0)
            # Wan2.2 MoE: each expert gets its own CFG scale
            # (reference wan2_t2v.py:474-490, guidance_scale_2 for the
            # low-noise expert below the boundary timestep)
            g2 = getattr(self.training_args, "guidance_scale_2", None)
            if isinstance(merged, tuple) and g2 is not None:
                boundary = jnp.float32(self.boundary_ratio * 1000.0)
                t_route = t[0] if t.ndim == 1 else jnp.max(t[0])
                guidance_scale = jnp.where(
                    t_route >= boundary, guidance_scale, jnp.float32(float(g2))
                )
            return v_uncond + guidance_scale * (v_cond - v_uncond)
        return forward_once(latents, t, embeds["prompt_embeds"].astype(dt), img_ctx).astype(jnp.float32)

    def merged_params(self, component: str, trainable=None, frozen=None):
        # Wan2.2 MoE: present both experts to _velocity as a pair
        frozen_src = frozen if frozen is not None else self.params
        if component == "transformer" and self.boundary_ratio is not None and "transformer_2" in frozen_src:
            low = super().merged_params("transformer", trainable, frozen)
            high = super().merged_params("transformer_2", trainable, frozen)
            return (low, high)
        return super().merged_params(component, trainable, frozen)

    # ------------------------------------------------------------------
    def latent_shape(self, height: int, width: int, num_frames: int) -> Tuple[int, int, int, int]:
        # Wan frame convention: T_latent = 1 + ceil((T_pixel − 1)/down); the
        # encoder front-replicates so T ≡ 1 (mod down)
        t = 1 + -(-(max(num_frames, 1) - 1) // self.vae_temporal_down)
        return (t, height // self.vae_spatial_down, width // self.vae_spatial_down, self.latent_channels)

    def inference(
        self,
        prompt: Optional[Sequence[str]] = None,
        prompt_embeds: Optional[np.ndarray] = None,
        negative_prompt: Optional[Sequence[str]] = None,
        negative_prompt_embeds: Optional[np.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_frames: Optional[int] = None,
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
        defer: bool = False,
        **_,
    ) -> List[T2VSample]:
        ta = self.training_args
        height = height or ta.height
        width = width or ta.width
        num_frames = num_frames or int(getattr(ta, "num_frames", 5))
        T = num_inference_steps or ta.num_inference_steps
        g = float(ta.guidance_scale if guidance_scale is None else guidance_scale)
        do_cfg = g > 1.0

        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(list(prompt))["prompt_embeds"]
        if do_cfg and negative_prompt_embeds is None:
            neg = list(negative_prompt) if negative_prompt is not None else [""] * len(prompt_embeds)
            negative_prompt_embeds = self.encode_prompt(neg)["prompt_embeds"]
        B = len(prompt_embeds)
        # UMT5 context is cast to the compute dtype at first use in the
        # transformer, so stage it over the wire in that dtype (67 MB→34 MB
        # per fp32 embed batch; bit-identical, see stage_context)
        embeds = {"prompt_embeds": self.stage_context(prompt_embeds)}
        if do_cfg:
            embeds["negative_prompt_embeds"] = self.stage_context(negative_prompt_embeds)
        if extra_embeds:
            embeds.update(extra_embeds)

        tl, h, w, c = self.latent_shape(height, width, num_frames)
        timesteps = self.scheduler.set_timesteps(T)
        sigmas = self.scheduler.sigmas
        noise_levels = self.scheduler.get_noise_levels()
        dynamics = "ODE" if self.scheduler.is_eval else self.scheduler.dynamics_type
        maps = build_store_maps(trajectory_indices, T)

        if keys is None:
            if key is None:
                key = derive_key("rollout", seed if seed is not None else ta.seed)
            keys = jax.random.split(key, B)
        x0 = jax.vmap(lambda k: jax.random.normal(k, (tl, h, w, c), jnp.float32))(keys)
        x0 = self.cast_latents(x0)
        scan_key = jax.random.fold_in(keys[0], 7)
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

        # async decode dispatch first: device compute overlaps the buffer fetch
        videos_dev = (
            self.decode_latents(x_final, num_frames=num_frames, fetch=False)
            if decode else None
        )

        def _materialize() -> List[T2VSample]:
            videos = (
                self.fetch_batch(videos_dev, 0).astype(np.float32, copy=False)
                if videos_dev is not None else [None] * B
            )
            lat_np = self.fetch_batch(lat_buf, 1).astype(np.float32)
            lp_np = self.fetch_batch(lp_buf, 1)
            mean_np = (
                self.fetch_batch(mean_buf, 1).astype(np.float32) if mean_buf is not None else None
            )
            ts_np = np.asarray(timesteps, np.float32)

            samples: List[T2VSample] = []
            for i in range(B):
                extra = {
                    "sigmas": np.asarray(sigmas, np.float32),
                    "noise_levels": np.asarray(noise_levels, np.float32),
                    "guidance_scale": g,
                    "num_frames": num_frames,
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
                        video=videos[i],
                        prompt=prompt[i] if prompt is not None else None,
                        prompt_embeds=np.asarray(prompt_embeds[i], np.float32),
                        negative_prompt_embeds=(
                            np.asarray(negative_prompt_embeds[i], np.float32) if do_cfg else None
                        ),
                        extra_kwargs=extra,
                    )
                )
            return samples

        if defer:
            # start D2H now — the copies queue behind the scan/decode
            self.prefetch_to_host(lat_buf, lp_buf, mean_buf, videos_dev)
            return PendingRollout(_materialize)
        return _materialize()

    # ------------------------------------------------------------------
    def decode_latents(self, latents: jax.Array, num_frames: Optional[int] = None,
                       fetch: bool = True) -> np.ndarray:
        """(B, Tl, h, w, c) latents → (B, T, C, H, W) videos in [0, 1].

        Long clips stream through the causal VAE in chunks (exact — see
        ``VideoVAE.decode_chunked``) when ``model.vae_decode_chunk`` is set
        or the clip exceeds 16 latent frames, bounding decode activation
        memory (the reference's feat-cache streaming analog).
        ``fetch=False`` returns the DEVICE array from the async jit dispatch
        (callers overlap the decode with other host fetches).
        """
        chunk = int(getattr(self.model_args, "vae_decode_chunk", 0) or 0)
        if not chunk and latents.shape[1] > 16:
            chunk = 8
        if self._decode_jit is None:
            wire = self.image_wire_dtype()

            def _decode(params, z, num_frames, chunk):
                if chunk:
                    video = self.modules["vae"].apply(
                        {"params": params}, z, chunk, 8, num_frames,
                        method=VideoVAE.decode_chunked,
                    )
                else:
                    video = self.modules["vae"].apply(
                        {"params": params}, z, num_frames, method=VideoVAE.decode
                    )  # (B, C, T, H, W)
                video = jnp.clip(video.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
                video = video if wire is None else video.astype(wire)
                return jnp.transpose(video, (0, 2, 1, 3, 4))  # (B, T, C, H, W)

            self._decode_jit = jax.jit(_decode, static_argnums=(2, 3))
        out = self._decode_jit(self.params["vae"], latents.astype(jnp.float32), num_frames, chunk)
        if not fetch:
            return out  # device array from the async dispatch
        return np.asarray(jax.device_get(out)).astype(np.float32, copy=False)

    def encode_video(self, videos: np.ndarray, key: Optional[jax.Array] = None) -> np.ndarray:
        """(B, T, C, H, W) in [0,1] → latents (B, Tl, h, w, c)."""
        def _encode(params, v):
            v = jnp.transpose(v, (0, 2, 1, 3, 4)) * 2.0 - 1.0  # (B,C,T,H,W)
            return self.modules["vae"].apply(
                {"params": params}, v, None, False, method=VideoVAE.encode
            ).astype(jnp.float32)

        out = jax.jit(_encode)(self.params["vae"], jnp.asarray(videos, jnp.float32))
        return np.asarray(jax.device_get(out))
