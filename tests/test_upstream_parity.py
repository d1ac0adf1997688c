"""Real-upstream numerical parity (VERDICT r2, Missing #1 / Next #1).

Every test here instantiates a RANDOM-INIT torch ``transformers`` module
from a tiny config, exports its state dict through the repo's own key maps
(`utils/checkpoint.py`), and diffs fp32 forward activations against our
flax encoders. This is genuine L2 parity against upstream code — the graphs
AND the key maps are validated with zero reliance on our own goldens
(reference method: `.agents/knowledge/topics/parity_testing.md`, L2).

Covered upstream modules:
  * ``CLIPTextModelWithProjection``  (SD3/FLUX text_encoder, CLIP-L + G act)
  * ``CLIPVisionModel``              (Wan I2V conditioning, NativeCLIP reward)
  * ``T5EncoderModel``               (SD3.5 text_encoder_3 / FLUX t5)
  * ``UMT5EncoderModel``             (Wan text encoder — per-layer rel bias)
  * ``Qwen2ForCausalLM``             (Qwen-Image text encoder; NeoX RoPE)
  * ``MistralForCausalLM``           (FLUX.2 text encoder; no attn bias)
  * ``Qwen2_5_VisionTransformerPretrainedModel`` (Edit-Plus vision tower:
    window attention, 2-D RoPE, patch merger, processor patch order)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

ATOL, RTOL = 3e-5, 1e-4


def _sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _assert_close(ours, theirs, name):
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs.detach().numpy(), np.float32)
    np.testing.assert_allclose(ours, theirs, atol=ATOL, rtol=RTOL, err_msg=name)


# ---------------------------------------------------------------------------
# CLIP text
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_text_upstream_parity(act):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    from flow_factory_tpu.models.text_encoders.clip import (
        CLIPTextConfig as OurCfg,
        CLIPTextEncoder,
    )
    from flow_factory_tpu.utils.checkpoint import (
        clip_text_encoder_key_map,
        import_diffusers_params,
    )

    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        # real CLIP has eos == vocab_size-1 (49407); transformers pools the
        # LEGACY way (argmax of raw token ids) when eos_token_id == 2, so a
        # vocab-max eos is the faithful test regime
        max_position_embeddings=16, projection_dim=24, hidden_act=act,
        bos_token_id=1, eos_token_id=99, pad_token_id=0,
    )).eval()

    enc = CLIPTextEncoder(OurCfg(
        vocab_size=100, hidden_dim=32, num_layers=2, num_heads=4,
        max_positions=16, projection_dim=24, hidden_act=act,
        eos_token_id=99, dtype="float32",
    ))
    ids = np.array([[1, 5, 9, 33, 99, 0, 0, 0],
                    [1, 42, 99, 0, 0, 0, 0, 0]], np.int32)
    template = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    km, rm = clip_text_encoder_key_map(2)
    params = import_diffusers_params(_sd(hf), km, template, raw_map=rm)

    out = enc.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 output_hidden_states=True)
    _assert_close(out.last_hidden_state, ref.last_hidden_state, "last_hidden")
    _assert_close(out.pooled, ref.text_embeds, "pooled/projected")
    # penultimate (SD3/FLUX consume hidden_states[-2])
    _assert_close(out.penultimate_hidden_state, ref.hidden_states[-2], "penultimate")


# ---------------------------------------------------------------------------
# CLIP vision
# ---------------------------------------------------------------------------

def test_clip_vision_upstream_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from flow_factory_tpu.models.text_encoders.clip import (
        CLIP_IMAGE_MEAN,
        CLIP_IMAGE_STD,
        CLIPVisionConfig as OurCfg,
        CLIPVisionEncoder,
    )
    from flow_factory_tpu.utils.checkpoint import (
        clip_vision_encoder_key_map,
        import_diffusers_params,
    )

    torch.manual_seed(1)
    hf = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8, hidden_act="gelu",
    )).eval()

    enc = CLIPVisionEncoder(OurCfg.tiny(dtype="float32"))
    rng = np.random.RandomState(0)
    pixels = rng.rand(2, 3, 16, 16).astype(np.float32)

    template = enc.init(jax.random.PRNGKey(0), jnp.asarray(pixels))["params"]
    km, rm = clip_vision_encoder_key_map(2)
    params = import_diffusers_params(_sd(hf), km, template, raw_map=rm)

    out = enc.apply({"params": params}, jnp.asarray(pixels))
    mean = np.asarray(CLIP_IMAGE_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(CLIP_IMAGE_STD, np.float32).reshape(1, 3, 1, 1)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor((pixels - mean) / std))
    _assert_close(out, ref.last_hidden_state, "vision tokens")


# ---------------------------------------------------------------------------
# T5 / UMT5
# ---------------------------------------------------------------------------

def _t5_kwargs():
    return dict(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", use_cache=False,
    )


def _our_t5_cfg(**extra):
    from flow_factory_tpu.models.text_encoders.t5 import T5Config

    return T5Config(vocab_size=100, hidden_dim=32, ff_dim=64, num_layers=2,
                    num_heads=4, head_dim=8, rel_pos_buckets=8,
                    rel_pos_max_distance=16, dtype="float32", **extra)


@pytest.mark.parametrize("family", ["t5", "umt5"])
def test_t5_family_upstream_parity(family):
    from flow_factory_tpu.models.text_encoders.t5 import T5Encoder
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        t5_encoder_key_map,
    )

    torch.manual_seed(2)
    if family == "t5":
        from transformers import T5Config as HFCfg, T5EncoderModel as HFEnc
    else:
        from transformers import UMT5Config as HFCfg, UMT5EncoderModel as HFEnc
    hf = HFEnc(HFCfg(**_t5_kwargs())).eval()

    per_layer = family == "umt5"
    enc = T5Encoder(_our_t5_cfg(per_layer_rel_bias=per_layer))
    ids = np.array([[3, 17, 55, 9, 1, 0, 0],
                    [88, 4, 1, 0, 0, 0, 0]], np.int32)
    template = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    km, rm = t5_encoder_key_map(2, per_layer_rel_bias=per_layer)
    params = import_diffusers_params(_sd(hf), km, template, raw_map=rm)

    out = enc.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long))
    _assert_close(out, ref.last_hidden_state, f"{family} hidden")


# ---------------------------------------------------------------------------
# Decoder-only LMs (Qwen2 with attn bias, Mistral without)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("family", ["qwen2", "mistral"])
def test_lm_upstream_parity(family):
    from flow_factory_tpu.models.text_encoders.lm import LMConfig, LMEncoder
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        lm_decoder_key_map,
    )

    torch.manual_seed(3)
    common = dict(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_dropout=0.0,
    )
    if family == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        hf = Qwen2ForCausalLM(Qwen2Config(**common)).eval()
        attn_bias = True
    else:
        from transformers import MistralConfig, MistralForCausalLM

        hf = MistralForCausalLM(MistralConfig(**common, head_dim=8)).eval()
        attn_bias = False

    enc = LMEncoder(LMConfig.tiny(vocab_size=100, attn_bias=attn_bias,
                                  dtype="float32"))
    ids = np.array([[7, 3, 51, 9, 22, 1],
                    [64, 2, 8, 1, 1, 1]], np.int32)
    template = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    km, rm = lm_decoder_key_map(2)
    params = import_diffusers_params(_sd(hf), km, template, raw_map=rm)

    hidden, logits = enc.apply({"params": params}, jnp.asarray(ids),
                               return_logits=True)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 output_hidden_states=True)
    _assert_close(hidden, ref.hidden_states[-1], f"{family} hidden")
    _assert_close(logits, ref.logits, f"{family} tied logits")


def test_gemma3_upstream_parity():
    """Gemma3 (LTX-2's conditioning LM) against torch ``Gemma3TextModel``:
    sqrt(hidden) embed scale, (1+w) fp32 RMSNorms, sandwich norms, per-head
    q/k norms, gelu-tanh GeGLU, query_pre_attn_scalar scaling, and the
    interleaved sliding/global layers with separate local/scaled-global
    RoPE — all seven divergences from the Llama layout must reproduce.
    The tiny config uses sliding_window=4 < L so the banded mask is real."""
    from transformers import Gemma3TextConfig, Gemma3TextModel

    from flow_factory_tpu.models.text_encoders.lm import LMConfig, LMEncoder
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        lm_decoder_key_map,
    )

    torch.manual_seed(5)
    hf_cfg = Gemma3TextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0, rms_norm_eps=1e-6,
        query_pre_attn_scalar=8, sliding_window=4,
        sliding_window_pattern=2,  # layers 0, 2 sliding; layer 1 global
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        attention_dropout=0.0, attn_implementation="eager",
    )
    hf = Gemma3TextModel(hf_cfg).float().eval()

    enc = LMEncoder(LMConfig.gemma3_tiny(vocab_size=100, dtype="float32"))
    ids = np.array([[7, 3, 51, 9, 22, 1, 64, 2],
                    [64, 2, 8, 1, 1, 1, 1, 1]], np.int32)
    template = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    km, rm = lm_decoder_key_map(3, gemma=True)
    sd = {f"model.{k}": v for k, v in _sd(hf).items()}
    params = import_diffusers_params(sd, km, template, raw_map=rm)

    hidden = enc.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 output_hidden_states=True)
    _assert_close(hidden, ref.hidden_states[-1], "gemma3 hidden")


# ---------------------------------------------------------------------------
# Qwen2.5-VL vision tower
# ---------------------------------------------------------------------------

def test_qwen_vl_vision_tower_upstream_parity():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    from flow_factory_tpu.models.text_encoders.vl_vision import (
        VLVisionConfig,
        VLVisionTower,
        rot_pos_ids,
        window_layout,
    )
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        qwen_vl_vision_key_map,
        qwen_vl_vision_preprocess,
    )

    torch.manual_seed(4)
    hf_cfg = Qwen2_5_VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        in_channels=3, patch_size=14, spatial_merge_size=2,
        temporal_patch_size=2, window_size=112, fullatt_block_indexes=[1],
        out_hidden_size=48, hidden_act="silu",
    )
    hf_cfg._attn_implementation = "eager"
    hf = Qwen2_5_VisionTransformerPretrainedModel(hf_cfg).float().eval()

    vcfg = VLVisionConfig(
        hidden_dim=32, out_dim=48, depth=2, num_heads=4, mlp_dim=64,
        patch_size=14, temporal_patch_size=2, merge_size=2, window_size=112,
        fullatt_block_indexes=(1,), dtype="float32",
    )
    tower = VLVisionTower(vcfg)

    # 224×112 image → 16×8 patch grid → 8×4 merged → two 4×4-merged windows,
    # so windowed layers genuinely differ from the full-attention layer.
    grid = (1, 16, 8)
    L = grid[1] * grid[2]
    rng = np.random.RandomState(0)
    flat = rng.randn(L, vcfg.patch_dim).astype(np.float32)

    pos = rot_pos_ids(grid, vcfg.merge_size)
    perm, inv, mask = window_layout(grid, vcfg)
    args = (jnp.asarray(flat), jnp.asarray(pos), jnp.asarray(perm),
            jnp.asarray(mask), jnp.asarray(inv))
    template = tower.init(jax.random.PRNGKey(0), *args)["params"]

    # standalone tower state dict has no "visual." prefix; the key map (built
    # for full-checkpoint keys) expects it
    sd = {f"visual.{k}": v for k, v in _sd(hf).items()}
    km, rm = qwen_vl_vision_key_map(vcfg.depth)
    params = import_diffusers_params(
        qwen_vl_vision_preprocess(sd), km, template, raw_map=rm)

    out = tower.apply({"params": params}, *args)
    with torch.no_grad():
        ref = hf(torch.tensor(flat), grid_thw=torch.tensor([list(grid)]))
    _assert_close(out, ref, "merged vision embeds")
