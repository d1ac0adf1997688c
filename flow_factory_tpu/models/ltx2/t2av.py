"""LTX-2 text→audio-video adapter (joint AV rollout + RL).

TPU-native re-design of the reference LTX-2 T2AV adapter
(``src/flow_factory/models/ltx2/ltx2_t2av.py``):

* dual-stream transformer: separate video/audio token streams per block
  with cross-modal attention (upstream block layout, ``:176-218``); the
  sample's stored trajectory keeps the unified [video; audio] sequence
  convention of the reference (``:680-705``) at the adapter boundary;
* TWO schedulers — video Flow-SDE (log-probs for RL) + a dedicated audio
  scheduler running ODE (``:146-175,919-940``; the reference needs two
  INSTANCES because diffusers ``step()`` mutates state — here both are pure,
  but sigma schedules and noise gating still differ per modality);
* Gemma3-role LM conditioning through dual connectors (in the transformer);
* decode: video VAE for frames + audio VAE → mel → vocoder (``:494-594``);
* x0-space multi-guidance: CFG (batch doubling) + STG (perturbed blocks)
  + modality isolation (cross-modal attention disabled), ``:635-760``.

The joint rollout is a custom ``lax.scan``: per step one transformer call
yields (v_video, v_audio); the video part takes an SDE step with log-prob,
the audio part an ODE step on its own sigma grid.
"""
from __future__ import annotations

import functools
import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...samples import T2AVSample
from ...scheduler.flow_match_euler import FlowMatchEulerSDE, sde_step
from ...utils.base import derive_key
from ...utils.tokenizer import load_tokenizer
from ...utils.trajectory import build_store_maps
from ..abc import BaseAdapter, PendingRollout
from ..text_encoders.lm import LMConfig, LMEncoder
from .audio import AudioVAE, AudioVAEConfig
from .video_vae import LTXVideoVAE, LTXVideoVAEConfig
from .transformer import LTX2Config, LTX2Transformer

logger = logging.getLogger(__name__)

# The reference's 28 Linears per block (``ltx2_t2av.py:176-218``): 6
# attention groups × 4 projections + 2 FFN groups × 2 layers.
LTX2_LORA_TARGETS = (
    r".*block_\d+/(sa|a_sa)_(q|k|v|out)/kernel$",
    r".*block_\d+/(ca|a_ca|a2v|v2a)/(q|k|v|out)/kernel$",
    r".*block_\d+/(ffn1|ffn2|a_ffn1|a_ffn2)/kernel$",
)


def _preset(name: str, attn_backend: str, dtype: str) -> Dict[str, Any]:
    if name == "tiny":
        return dict(
            transformer=LTX2Config.tiny(attn_backend=attn_backend, dtype=dtype),
            video_vae=LTXVideoVAEConfig.tiny(latent_channels=16, dtype=dtype),
            audio_vae=AudioVAEConfig.tiny(dtype=dtype),
            lm=LMConfig.tiny(hidden_dim=32, dtype=dtype),
            max_length=16,
        )
    if name in ("ltx2",):
        return dict(
            transformer=LTX2Config.ltx2(attn_backend=attn_backend, dtype=dtype,
                                        video_channels=128, audio_channels=128),
            video_vae=LTXVideoVAEConfig.ltx2(dtype=dtype),
            audio_vae=AudioVAEConfig.ltx2(latent_channels=128, dtype=dtype),
            lm=LMConfig.gemma3(dtype=dtype),
            max_length=512,
        )
    raise ValueError(f"Unknown LTX-2 preset {name!r}")


class LTX2T2AVAdapter(BaseAdapter):
    sample_class = T2AVSample
    default_target_patterns = LTX2_LORA_TARGETS
    embed_keys = ("prompt_embeds", "negative_prompt_embeds", "video_ids", "audio_ids")
    # joint-AV replay: trainers feed the stored AUDIO latent for the same
    # trajectory slot alongside the video latents
    trajectory_batch_keys = {"audio_latents": "audio_all_latents"}

    def pretrained_component_maps(self):
        from ...utils.checkpoint import lm_decoder_key_map, ltx2_transformer_key_map

        maps = {}
        tcfg = self.component_configs.get("transformer")
        if tcfg is not None:
            km, rm = ltx2_transformer_key_map(tcfg.num_layers)
            maps["transformer"] = ("transformer", km, rm, None)
        lcfg = self.component_configs.get("text_encoder")
        if lcfg is not None and "text_encoder" in self.params:
            lkm, lrm = lm_decoder_key_map(lcfg.num_layers,
                                          gemma=lcfg.arch == "gemma3")
            maps["text_encoder"] = ("text_encoder", lkm, lrm, None)
        vcfg = self.component_configs.get("vae")
        if vcfg is not None and "vae" in self.params:
            from ...utils.checkpoint import ltx_video_vae_key_map

            vkm, vrm = ltx_video_vae_key_map(vcfg)

            def _pop_stats(sd, _self=self):
                # latents_mean/std live as state-dict buffers upstream;
                # they are config here (decode normalization)
                from ...utils.checkpoint import pop_ltx_vae_latent_stats

                sd, mean, std = pop_ltx_vae_latent_stats(sd)
                if mean is not None and std is not None:
                    import dataclasses as _dc

                    cfg2 = _dc.replace(_self.component_configs["vae"],
                                       latents_mean=mean, latents_std=std)
                    _self.component_configs["vae"] = cfg2
                    _self.modules["vae"] = LTXVideoVAE(cfg2)
                return sd

            maps["vae"] = ("vae", vkm, vrm, _pop_stats)
        acfg = self.component_configs.get("audio_vae")
        if acfg is not None and "audio_vae" in self.params:
            import re as _re

            from ...utils.checkpoint import fuse_weight_norm, hifigan_vocoder_key_map

            def _voc_pre(sd):
                # HiFi-GAN checkpoints: weight-norm pairs fuse; a leading
                # ``generator.`` strips; ConvTranspose weights are
                # (in, out, k) upstream → conv-style (out, in, k) for the
                # generic rank-3 transpose
                sd = fuse_weight_norm(sd)
                sd = {(k[10:] if k.startswith("generator.") else k): v
                      for k, v in sd.items()}
                for k in list(sd):
                    if _re.match(r"^ups\.\d+\.weight$", k):
                        sd[k] = np.swapaxes(np.asarray(sd[k]), 0, 1)
                return sd

            maps["audio_vae"] = ("vocoder", hifigan_vocoder_key_map(acfg), None, _voc_pre)
        return maps

    def load_models(self) -> None:
        ma = self.model_args
        variant = getattr(ma, "variant", None) or (
            "tiny" if ma.model_name_or_path in ("", "tiny") else "ltx2"
        )
        preset = _preset(variant, ma.attn_backend, ma.inference_dtype)
        from ...utils.checkpoint import (
            apply_config_json_overrides,
            lm_overrides_from_config,
            load_component_config,
            ltx2_audio_vae_overrides_from_config,
            ltx2_transformer_overrides_from_config,
            ltx_video_vae_overrides_from_config,
        )

        preset["transformer"] = apply_config_json_overrides(
            preset["transformer"], ma.model_name_or_path, "transformer",
            ltx2_transformer_overrides_from_config)
        preset["audio_vae"] = apply_config_json_overrides(
            preset["audio_vae"], ma.model_name_or_path, "audio_vae",
            ltx2_audio_vae_overrides_from_config)
        preset["lm"] = apply_config_json_overrides(
            preset["lm"], ma.model_name_or_path, "text_encoder", lm_overrides_from_config)
        preset["video_vae"] = apply_config_json_overrides(
            preset["video_vae"], ma.model_name_or_path, "vae",
            ltx_video_vae_overrides_from_config)
        # Token widths are shared state: the transformer's video/audio
        # channels ARE the VAEs' latent widths (1:1 packing). A real
        # checkpoint's configs agree; when only one side declares a width,
        # propagate it — explicit VAE config wins over the transformer's.
        import dataclasses as _dc
        import os as _os

        path = ma.model_name_or_path if (
            ma.model_name_or_path and _os.path.isdir(ma.model_name_or_path)) else None
        for tx_field, vkey, sub in (("video_channels", "video_vae", "vae"),
                                    ("audio_channels", "audio_vae", "audio_vae")):
            tx_w = getattr(preset["transformer"], tx_field)
            vae_w = preset[vkey].latent_channels
            if tx_w == vae_w:
                continue
            vae_json = load_component_config(path, sub) if path else None
            if vae_json and vae_json.get("latent_channels") is not None:
                preset["transformer"] = _dc.replace(
                    preset["transformer"], **{tx_field: vae_w})
            else:
                preset[vkey] = _dc.replace(preset[vkey], latent_channels=tx_w)
        # context width: the connectors consume LM embeddings directly, so
        # the transformer's context_dim follows the (self-configured) LM
        if preset["transformer"].context_dim != preset["lm"].hidden_dim:
            preset["transformer"] = _dc.replace(
                preset["transformer"], context_dim=preset["lm"].hidden_dim)
        if self.training_args.enable_gradient_checkpointing or (
            self.model_args.enable_gradient_checkpointing_override
        ):
            import dataclasses as _dc

            preset["transformer"] = _dc.replace(preset["transformer"], remat=True)
        self.max_length = preset["max_length"]

        self.modules = {
            "transformer": LTX2Transformer(preset["transformer"]),
            "vae": LTXVideoVAE(preset["video_vae"]),
            "audio_vae": AudioVAE(preset["audio_vae"]),
            "text_encoder": LMEncoder(preset["lm"]),
        }
        self.component_configs = {
            "transformer": preset["transformer"],
            "vae": preset["video_vae"],
            "audio_vae": preset["audio_vae"],
            "text_encoder": preset["lm"],
        }
        wanted = getattr(ma, "load_components", None)
        if wanted:
            self.modules = {k: v for k, v in self.modules.items() if k in set(wanted)}

        tcfg: LTX2Config = preset["transformer"]
        acfg: AudioVAEConfig = preset["audio_vae"]
        key = derive_key("ltx2_init", self.training_args.seed)
        init_fns = {
            "transformer": lambda m, k: m.init(
                k, jnp.zeros((1, 8, tcfg.video_channels)), jnp.zeros((1, 4, tcfg.audio_channels)),
                jnp.zeros((1,)), jnp.zeros((1, 4, tcfg.context_dim)),
                jnp.zeros((8, 3)), jnp.zeros((4, 3)),
            ),
            "vae": lambda m, k: m.init(
                k, jnp.zeros((1, 3, preset["video_vae"].temporal_down + 1,
                              preset["video_vae"].spatial_down * 2,
                              preset["video_vae"].spatial_down * 2))
            ),
            "audio_vae": lambda m, k: m.init(
                k, jnp.zeros((1, 1, acfg.n_fft + acfg.hop * 15))
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
            for comp in ("transformer", "vae", "audio_vae"):
                if comp in self.params:
                    self.params[comp] = jax.device_put(self.params[comp], jax.local_devices()[0])

        self.tokenizer = load_tokenizer(
            ma.model_name_or_path, "tokenizer", preset["lm"].vocab_size,
            self.max_length, eos_token_id=2, pad_token_id=0,
        )
        self.video_latent_channels = preset["video_vae"].latent_channels
        self.audio_latent_channels = preset["audio_vae"].latent_channels
        self.vae_spatial_down = preset["video_vae"].spatial_down
        self.vae_temporal_down = preset["video_vae"].temporal_down
        self.audio_cfg = acfg

        # dedicated AUDIO scheduler (ODE) — reference ltx2_t2av.py:146-175
        self.audio_scheduler = FlowMatchEulerSDE(
            noise_level=0.0, dynamics_type="ODE", seed=self.scheduler_args.seed,
        )
        self._encode_jit = None
        self._decode_jit = None
        self._audio_decode_jit = None

        # built-in LLM prompt enhancement (reference ltx2_t2av.py:340-368):
        # greedy rewrite through the SAME conditioning decoder, tied-embedding
        # logits — nothing extra to load
        if getattr(ma, "use_prompt_enhancer", False) and "text_encoder" in self.modules:
            from ..text_encoders.caption import LMCaptionUpsampler

            self.prompt_enhancer = LMCaptionUpsampler(
                self.modules["text_encoder"],
                self.params["text_encoder"],
                self.tokenizer,
                template="Expand into a cinematic audio-video scene description: {prompt}\n",
                max_new_tokens=int(getattr(ma, "caption_max_new_tokens", 24)),
                max_length=min(self.max_length, 96),
            )

    # ------------------------------------------------------------------
    def _encode_impl(self, params, ids, mask):
        emb = self.modules["text_encoder"].apply({"params": params}, ids, mask)
        return emb.astype(jnp.float32)

    def encode_prompt(self, prompts: Sequence[str], **_) -> Dict[str, np.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
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
            neg = batch.get("negative_prompt") or [""] * len(batch["prompt"])
            out["negative_prompt_embeds"] = self.encode_prompt(neg)["prompt_embeds"]
        return out

    def enhance_prompt(self, prompts: Sequence[str]) -> List[str]:
        """LLM prompt enhancement hook (reference ltx2_t2av.py:340-368).

        Pluggable: assign ``self.prompt_enhancer`` (callable) to rewrite
        prompts through an LLM before encoding. Identity by default.
        """
        fn = getattr(self, "prompt_enhancer", None)
        return list(fn(prompts)) if fn is not None else list(prompts)

    # ------------------------------------------------------------------
    # Geometry
    # ------------------------------------------------------------------
    def video_token_geometry(self, height, width, num_frames):
        # Wan frame convention: T_latent = 1 + ceil((T_pixel − 1)/down)
        tl = 1 + -(-(max(num_frames, 1) - 1) // self.vae_temporal_down)
        h = height // self.vae_spatial_down
        w = width // self.vae_spatial_down
        return tl, h, w

    def audio_token_count(self, duration_frames: int) -> int:
        # mel frames per video clip: proportional stand-in geometry
        acfg = self.audio_cfg
        samples = int(duration_frames / 24.0 * acfg.sample_rate) + acfg.n_fft
        mel_frames = max(1, (samples - acfg.n_fft) // acfg.hop + 1)
        return max(1, mel_frames // acfg.temporal_down)

    @staticmethod
    def _video_ids(tl, h, w) -> np.ndarray:
        tt = np.repeat(np.arange(tl), h * w)
        hh = np.tile(np.repeat(np.arange(h), w), tl)
        ww = np.tile(np.arange(w), tl * h)
        return np.stack([tt, hh, ww], axis=-1).astype(np.float32)

    @staticmethod
    def _audio_ids(la, tl) -> np.ndarray:
        t = np.linspace(0, max(tl - 1, 0), la)
        return np.stack([t, np.zeros(la), np.zeros(la)], axis=-1).astype(np.float32)

    # ------------------------------------------------------------------
    # Velocity: x0-space multi-guidance (CFG + STG + modality isolation)
    # Reference ltx2_t2av.py:635-760 / official pipeline L1250-1400.
    # ------------------------------------------------------------------
    @property
    def stg_scale(self) -> float:
        return float(getattr(self.training_args, "stg_scale", 0.0))

    @property
    def stg_blocks(self):
        b = getattr(self.training_args, "spatio_temporal_guidance_blocks", None)
        return tuple(b) if b else ()

    @property
    def modality_scale(self) -> float:
        return float(getattr(self.training_args, "modality_scale", 1.0))

    @property
    def per_token_time(self) -> bool:
        """Exact per-token I2AV timestep embedding (YAML ``per_token_time``).

        Off by default: the adapter's own conditioning masks are binary, for
        which the t/0 modulation-interpolation fast path is already exact and
        avoids materializing a (B, Lv, 6, D) per-token modulation tensor.
        Turn on when feeding fractional conditioning masks (the reference's
        ``noise_scale`` semantics)."""
        return bool(getattr(self.training_args, "per_token_time", False))

    def _joint_velocity(self, merged, v_lat, a_lat, t, embeds, guidance_scale, do_cfg):
        from ...scheduler.flow_match_euler import convert_velocity_to_x0, convert_x0_to_velocity

        model = self.modules["transformer"]
        dt = self.component_configs["transformer"].compute_dtype
        vid_ids = embeds["video_ids"]
        vid_ids = vid_ids[0] if vid_ids.ndim == 3 else vid_ids
        aud_ids = embeds["audio_ids"]
        aud_ids = aud_ids[0] if aud_ids.ndim == 3 else aud_ids

        cond_mask = embeds.get("cond_mask")  # (B, Lv, 1) I2AV hard conditioning

        def fwd(v, a, tt, ctx, skip=(), isolate=False):
            cm = cond_mask
            if cm is not None and v.shape[0] == 2 * cm.shape[0]:  # CFG doubling
                cm = jnp.concatenate([cm, cm], axis=0)
            if cm is not None and self.per_token_time:
                # exact per-token video timestep (reference ltx2_i2av.py:858-866
                # ``video_ts = ts·(1 − conditioning_mask)``) — required for
                # fractional (noise_scale-style) masks; the binary-mask default
                # uses the cheaper t/0 modulation interpolation instead
                tt_video = tt[:, None] * (1.0 - cm[..., 0])
                vv, va = model.apply(
                    {"params": merged}, v.astype(dt), a.astype(dt), tt_video, ctx,
                    vid_ids, aud_ids, skip, audio_timestep=tt,
                    isolate_modalities=isolate,
                )
            else:
                vv, va = model.apply(
                    {"params": merged}, v.astype(dt), a.astype(dt), tt, ctx,
                    vid_ids, aud_ids, skip, isolate_modalities=isolate,
                    video_cond_mask=cm,
                )
            return vv.astype(jnp.float32), va.astype(jnp.float32)

        pos_ctx = embeds["prompt_embeds"]
        if do_cfg:
            v2 = jnp.concatenate([v_lat, v_lat], axis=0)
            a2 = jnp.concatenate([a_lat, a_lat], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate([embeds["negative_prompt_embeds"], pos_ctx], axis=0)
            vv, va = fwd(v2, a2, t2, ctx)
            vv_u, vv_c = jnp.split(vv, 2, axis=0)
            va_u, va_c = jnp.split(va, 2, axis=0)
        else:
            vv_c, va_c = fwd(v_lat, a_lat, t, pos_ctx)
            vv_u = va_u = None

        do_stg = self.stg_scale > 0.0 and len(self.stg_blocks) > 0
        do_iso = self.modality_scale > 1.0
        if not (do_stg or do_iso):
            if do_cfg:
                return (
                    vv_u + guidance_scale * (vv_c - vv_u),
                    va_u + guidance_scale * (va_c - va_u),
                )
            return vv_c, va_c

        # x0-space guidance composition
        sigma = (t / 1000.0).reshape(-1, 1, 1)
        v_x0 = convert_velocity_to_x0(vv_c, v_lat, sigma)
        a_x0 = convert_velocity_to_x0(va_c, a_lat, sigma)
        v_delta = jnp.zeros_like(v_x0)
        a_delta = jnp.zeros_like(a_x0)
        if do_cfg:
            v_x0_u = convert_velocity_to_x0(vv_u, v_lat, sigma)
            a_x0_u = convert_velocity_to_x0(va_u, a_lat, sigma)
            v_delta += (guidance_scale - 1.0) * (v_x0 - v_x0_u)
            a_delta += (guidance_scale - 1.0) * (a_x0 - a_x0_u)
        if do_stg:
            sv, sa = fwd(v_lat, a_lat, t, pos_ctx, skip=self.stg_blocks)
            v_delta += self.stg_scale * (v_x0 - convert_velocity_to_x0(sv, v_lat, sigma))
            a_delta += self.stg_scale * (a_x0 - convert_velocity_to_x0(sa, a_lat, sigma))
        if do_iso:
            # modality isolation: one forward with cross-modal attention off
            # (reference ltx2_t2av.py:726-760, isolate_modalities=True)
            iv, ia = fwd(v_lat, a_lat, t, pos_ctx, isolate=True)
            v_delta += (self.modality_scale - 1.0) * (v_x0 - convert_velocity_to_x0(iv, v_lat, sigma))
            a_delta += (self.modality_scale - 1.0) * (a_x0 - convert_velocity_to_x0(ia, a_lat, sigma))
        v_guided = v_x0 + v_delta
        a_guided = a_x0 + a_delta
        return (
            convert_x0_to_velocity(v_guided, v_lat, sigma),
            convert_x0_to_velocity(a_guided, a_lat, sigma),
        )

    # overridden `_velocity` contract is unused: LTX-2 has a custom joint path
    def _velocity(self, merged, latents, t, embeds, guidance_scale, do_cfg):
        raise NotImplementedError("LTX-2 uses the joint AV forward")

    # ------------------------------------------------------------------
    # Joint rollout scan (dual schedulers)
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=(
        "do_cfg", "compute_log_prob", "dynamics_type", "num_latent_slots", "num_logprob_slots",
    ))
    def _joint_rollout(
        self,
        trainable,
        frozen,
        v0,  # (B, Lv, Cv)
        a0,  # (B, La, Ca)
        embeds,
        guidance_scale,
        v_sigmas,  # (T+1,) video sigma grid
        a_sigmas,  # (T+1,) audio sigma grid
        timesteps,  # (T,)
        noise_levels,  # (T,) video SDE gating
        latent_store_slot,
        logprob_store_slot,
        key,
        *,
        do_cfg: bool,
        compute_log_prob: bool,
        dynamics_type: str,
        num_latent_slots: int,
        num_logprob_slots: int,
    ):
        merged = self.merged_params("transformer", trainable, frozen)
        B = v0.shape[0]
        storage_dtype = self.training_args.storage_dtype
        sigma_max = v_sigmas[1] if v_sigmas.shape[0] > 1 else jnp.float32(0.999)
        # I2AV: conditioned video tokens never step / never enter the log-prob.
        # Hard-binarized: the reference preserves conditioned frames entirely
        # (frame slicing, ltx2_i2av.py:983-1032) even when the modulation mask
        # is fractional (noise_scale semantics).
        v_token_mask = (
            (embeds["cond_mask"] <= 0.0).astype(jnp.float32)
            if "cond_mask" in embeds else None
        )

        v_buf = jnp.zeros((num_latent_slots + 1, *v0.shape), storage_dtype)
        v_buf = v_buf.at[latent_store_slot[0]].set(v0.astype(storage_dtype))
        a_buf = jnp.zeros((num_latent_slots + 1, *a0.shape), storage_dtype)
        a_buf = a_buf.at[latent_store_slot[0]].set(a0.astype(storage_dtype))
        lp_buf = jnp.zeros((num_logprob_slots + 1, B), jnp.float32)

        def body(carry, inp):
            v, a, k, v_buf, a_buf, lp_buf = carry
            vs, vs_next, as_, as_next, t, nl, lat_slot, lp_slot = inp
            k, sub = jax.random.split(k)
            vel_v, vel_a = self._joint_velocity(
                merged, v, a, jnp.full((B,), t), embeds, guidance_scale, do_cfg
            )
            out_v = sde_step(
                vel_v, v, vs, vs_next,
                dynamics_type=dynamics_type, noise_level=nl, key=sub,
                compute_log_prob=compute_log_prob, storage_dtype=storage_dtype,
                sigma_max=sigma_max, token_mask=v_token_mask,
            )
            out_a = sde_step(
                vel_a, a, as_, as_next,
                dynamics_type="ODE", noise_level=0.0, key=None,
                compute_log_prob=False, storage_dtype=storage_dtype,
            )
            v_buf = v_buf.at[lat_slot].set(out_v.next_latents.astype(storage_dtype))
            a_buf = a_buf.at[lat_slot].set(out_a.next_latents.astype(storage_dtype))
            if compute_log_prob:
                lp_buf = lp_buf.at[lp_slot].set(out_v.log_prob)
            return (out_v.next_latents, out_a.next_latents, k, v_buf, a_buf, lp_buf), None

        inputs = (
            v_sigmas[:-1], v_sigmas[1:], a_sigmas[:-1], a_sigmas[1:],
            timesteps, noise_levels, latent_store_slot[1:], logprob_store_slot,
        )
        (v_fin, a_fin, _, v_buf, a_buf, lp_buf), _ = jax.lax.scan(
            body, (v0, a0, key, v_buf, a_buf, lp_buf), inputs
        )
        return v_fin, a_fin, v_buf[:-1], a_buf[:-1], lp_buf[:-1]

    # ------------------------------------------------------------------
    def training_forward(self, trainable, batch, *, compute_log_prob=True, key=None,
                         dynamics_type=None, frozen=None):
        """Replay a stored VIDEO transition (audio context from the same step)."""
        embeds = {k: batch[k] for k in self.embed_keys if k in batch}
        do_cfg = "negative_prompt_embeds" in embeds
        return self._training_forward_jit(
            trainable, frozen if frozen is not None else self.frozen_velocity_params(),
            batch["latents"], batch["audio_latents"], batch.get("next_latents"),
            batch["timestep"], batch["sigma"], batch["sigma_next"],
            batch.get("noise_level", jnp.float32(0.0)), embeds,
            batch.get("guidance_scale", jnp.float32(self.training_args.guidance_scale)),
            batch.get("sigma_max", jnp.float32(0.999)), key,
            do_cfg=do_cfg, compute_log_prob=compute_log_prob,
            dynamics_type=dynamics_type or self.scheduler.dynamics_type,
        )

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=(
        "do_cfg", "compute_log_prob", "dynamics_type",
    ))
    def _training_forward_jit(
        self, trainable, frozen, v_lat, a_lat, next_latents, timestep, sigma, sigma_next,
        noise_level, embeds, guidance_scale, sigma_max, key,
        *, do_cfg, compute_log_prob, dynamics_type,
    ):
        merged = self.merged_params("transformer", trainable, frozen)
        vel_v, _ = self._joint_velocity(merged, v_lat, a_lat, timestep, embeds, guidance_scale, do_cfg)
        v_token_mask = (
            (embeds["cond_mask"] <= 0.0).astype(jnp.float32)
            if "cond_mask" in embeds else None
        )
        return sde_step(
            vel_v, v_lat, sigma, sigma_next,
            dynamics_type=dynamics_type, noise_level=noise_level, key=key,
            next_latents=next_latents, compute_log_prob=compute_log_prob,
            storage_dtype=self.training_args.storage_dtype, sigma_max=sigma_max,
            token_mask=v_token_mask,
        )

    # ------------------------------------------------------------------
    def training_velocity_tree(self, trainable, batch, frozen=None):
        """Joint (video, audio) velocity at arbitrary latents/t — the
        decoupled-trainer forward. One transformer pass covers both streams
        (the reference trains decoupled algorithms on the unified
        [video; audio] tensor; here the streams stay separate leaves)."""
        embeds = {k: batch[k] for k in self.embed_keys if k in batch}
        do_cfg = "negative_prompt_embeds" in embeds
        if not hasattr(self, "_tvt_jit"):
            def fn(trainable, frozen, v_lat, a_lat, t, embeds, guidance_scale, do_cfg):
                merged = self.merged_params("transformer", trainable, frozen)
                vel_v, vel_a = self._joint_velocity(
                    merged, v_lat, a_lat, t, embeds, guidance_scale, do_cfg
                )
                return {"latents": vel_v, "audio_latents": vel_a}

            self._tvt_jit = jax.jit(fn, static_argnames=("do_cfg",))
        return self._tvt_jit(
            trainable,
            frozen if frozen is not None else self.frozen_velocity_params(),
            batch["latents"], batch["audio_latents"], batch["timestep"], embeds,
            batch.get("guidance_scale", jnp.float32(self.training_args.guidance_scale)),
            do_cfg=do_cfg,
        )

    # ------------------------------------------------------------------
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
        decode: bool = True,
        extra_embeds: Optional[Dict[str, jnp.ndarray]] = None,
        defer: bool = False,
        **_,
    ) -> List[T2AVSample]:
        ta = self.training_args
        height = height or ta.height
        width = width or ta.width
        num_frames = num_frames or int(getattr(ta, "num_frames", 5))
        T = num_inference_steps or ta.num_inference_steps
        g = float(ta.guidance_scale if guidance_scale is None else guidance_scale)
        do_cfg = g > 1.0

        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(self.enhance_prompt(list(prompt)))["prompt_embeds"]
        if do_cfg and negative_prompt_embeds is None:
            neg = list(negative_prompt) if negative_prompt is not None else [""] * len(prompt_embeds)
            negative_prompt_embeds = self.encode_prompt(neg)["prompt_embeds"]
        B = len(prompt_embeds)

        tl, h, w = self.video_token_geometry(height, width, num_frames)
        Lv = tl * h * w
        La = self.audio_token_count(num_frames)
        video_ids = self._video_ids(tl, h, w)
        audio_ids = self._audio_ids(La, tl)

        embeds = {
            "prompt_embeds": jnp.asarray(prompt_embeds),
            "video_ids": jnp.asarray(video_ids),
            "audio_ids": jnp.asarray(audio_ids),
        }
        if do_cfg:
            embeds["negative_prompt_embeds"] = jnp.asarray(negative_prompt_embeds)
        if extra_embeds:
            embeds.update(extra_embeds)

        timesteps = self.scheduler.set_timesteps(T)
        v_sigmas = self.scheduler.sigmas
        self.audio_scheduler.set_timesteps(T)
        a_sigmas = self.audio_scheduler.sigmas
        noise_levels = self.scheduler.get_noise_levels()
        dynamics = "ODE" if self.scheduler.is_eval else self.scheduler.dynamics_type
        maps = build_store_maps(trajectory_indices, T)

        if keys is None:
            if key is None:
                key = derive_key("rollout", seed if seed is not None else ta.seed)
            keys = jax.random.split(key, B)
        v0 = jax.vmap(lambda k: jax.random.normal(k, (Lv, self.video_latent_channels), jnp.float32))(keys)
        a0 = jax.vmap(lambda k: jax.random.normal(
            jax.random.fold_in(k, 1), (La, self.audio_latent_channels), jnp.float32
        ))(keys)
        # I2AV: plant the conditioning tokens in the initial latents
        # (reference prepare_latents places the encoded image at frame 0).
        # The planting mask is binarized: cond_tokens already carry any
        # noise_scale blend (I2AV pre-blends host-side for fractional masks);
        # the fractional mask value drives only the per-token timestep.
        if "cond_tokens" in embeds and "cond_mask" in embeds:
            cmb = (jnp.asarray(embeds["cond_mask"], jnp.float32) > 0.0).astype(jnp.float32)
            v0 = v0 * (1.0 - cmb) + jnp.asarray(embeds["cond_tokens"], jnp.float32) * cmb
        v0, a0 = self.cast_latents(v0), self.cast_latents(a0)
        scan_key = jax.random.fold_in(keys[0], 7)
        v0, a0 = self.shard_batch(v0), self.shard_batch(a0)
        embeds = {
            k: (self.shard_batch(v) if v.ndim >= 2 and v.shape[0] == B else v)
            for k, v in embeds.items()
        }

        v_fin, a_fin, v_buf, a_buf, lp_buf = self._joint_rollout(
            trainable if trainable is not None else self.trainable,
            self.frozen_velocity_params(),
            v0, a0, embeds, jnp.float32(g),
            self.stage_constant(v_sigmas), self.stage_constant(a_sigmas),
            self.stage_constant(timesteps),
            self.stage_constant(noise_levels),
            self.stage_constant(maps.latent_store_slot),
            self.stage_constant(maps.logprob_store_slot),
            scan_key,
            do_cfg=do_cfg, compute_log_prob=compute_log_prob, dynamics_type=dynamics,
            num_latent_slots=maps.num_latent_slots, num_logprob_slots=maps.num_logprob_slots,
        )

        # async decode dispatches first: device compute overlaps buffer fetch
        if decode:
            videos_dev = self.decode_latents(v_fin, tl=tl, h=h, w=w,
                                             num_frames=num_frames, fetch=False)
            audios_dev = self.decode_audio(a_fin, fetch=False)
        else:
            videos_dev = audios_dev = None

        def _materialize() -> List[T2AVSample]:
            videos = (
                self.fetch_batch(videos_dev, 0).astype(np.float32, copy=False)
                if videos_dev is not None else [None] * B
            )
            audios = (
                np.asarray(self.fetch_batch(audios_dev, 0), np.float32)
                if audios_dev is not None else [None] * B
            )
            v_np = self.fetch_batch(v_buf, 1).astype(np.float32)
            a_np = self.fetch_batch(a_buf, 1).astype(np.float32)
            lp_np = self.fetch_batch(lp_buf, 1)
            ts_np = np.asarray(timesteps, np.float32)

            samples: List[T2AVSample] = []
            for i in range(B):
                samples.append(
                    self.sample_class(
                        timesteps=ts_np,
                        all_latents=v_np[:, i],
                        latent_index_map=maps.latent_index_map,
                        log_probs=lp_np[:, i] if compute_log_prob else None,
                        log_prob_index_map=maps.logprob_index_map,
                        height=height,
                        width=width,
                        video=videos[i],
                        audio=audios[i],
                        audio_sample_rate=self.audio_cfg.sample_rate,
                        prompt=prompt[i] if prompt is not None else None,
                        prompt_embeds=np.asarray(prompt_embeds[i], np.float32),
                        negative_prompt_embeds=(
                            np.asarray(negative_prompt_embeds[i], np.float32) if do_cfg else None
                        ),
                        extra_kwargs={
                            "sigmas": np.asarray(v_sigmas, np.float32),
                            "audio_sigmas": np.asarray(a_sigmas, np.float32),
                            "noise_levels": np.asarray(noise_levels, np.float32),
                            "guidance_scale": g,
                            "audio_all_latents": a_np[:, i],
                            "video_ids": video_ids,
                            "audio_ids": audio_ids,
                            "num_frames": num_frames,
                        },
                    )
                )
            return samples

        if defer:
            # start D2H now — the copies queue behind the scan/decode
            self.prefetch_to_host(v_buf, a_buf, lp_buf, videos_dev, audios_dev)
            return PendingRollout(_materialize)
        return _materialize()

    # ------------------------------------------------------------------
    def decode_latents(self, latents: jax.Array, tl: int, h: int, w: int,
                       num_frames: int, fetch: bool = True) -> np.ndarray:
        """Video tokens (B, Lv, Cv) → (B, T, C, H, W) in [0, 1].

        When the VAE decoder is timestep-conditioned, ``decode_timestep`` /
        ``decode_noise_scale`` (model config knobs, both 0.0 by default as in
        the reference, ``ltx2_t2av.py:536-559``) mix fresh noise into the
        latents and condition the decoder on the chosen timestep.
        ``fetch=False`` returns the DEVICE array from the async dispatch."""
        dt = float(getattr(self.model_args, "decode_timestep", None) or 0.0)
        dns = getattr(self.model_args, "decode_noise_scale", None)
        dns = dt if dns is None else float(dns)
        conditioned = getattr(self.component_configs["vae"], "timestep_conditioning", False)

        wire = self.image_wire_dtype()

        def _decode(params, z, key):
            z5 = z.reshape(z.shape[0], tl, h, w, z.shape[-1]).astype(jnp.float32)
            ts = None
            if conditioned:
                if dns > 0.0:
                    noise = jax.random.normal(key, z5.shape, z5.dtype)
                    z5 = (1.0 - dns) * z5 + dns * noise
                ts = jnp.full((z5.shape[0],), dt, jnp.float32)
            video = self.modules["vae"].apply(
                {"params": params}, z5, num_frames, ts, method=LTXVideoVAE.decode)
            video = jnp.clip(video.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
            video = video if wire is None else video.astype(wire)
            return jnp.transpose(video, (0, 2, 1, 3, 4))

        key = derive_key("ltx2_decode", self.training_args.seed)
        out = jax.jit(_decode)(self.params["vae"], latents, key)
        if not fetch:
            return out  # device array from the async dispatch
        return np.asarray(jax.device_get(out)).astype(np.float32, copy=False)

    def decode_audio(self, latents: jax.Array, fetch: bool = True) -> np.ndarray:
        """Audio tokens (B, La, Ca) → waveforms (B, 1, T) in [-1, 1].

        ``fetch=False`` returns the DEVICE array from the async dispatch."""
        if self._audio_decode_jit is None:
            def _decode(params, z):
                return self.modules["audio_vae"].apply(
                    {"params": params}, z.astype(jnp.float32), method=AudioVAE.decode
                )

            self._audio_decode_jit = jax.jit(_decode)
        out = self._audio_decode_jit(self.params["audio_vae"], latents)
        if not fetch:
            return out
        return np.asarray(jax.device_get(out), np.float32)

    def frozen_velocity_params(self) -> Dict[str, Any]:
        return {"transformer": self.params["transformer"]}
