"""Sampler contracts: determinism, geometry, cross-rank agreement.

Mirrors the reference test strategy (SURVEY.md §4.4): samplers are plain
objects needing no process group, so distributed behavior is tested by
instantiating all ranks locally.
"""
import numpy as np
import pytest

from flow_factory_tpu.data.sampler import (
    DistributedKRepeatSampler,
    GroupContiguousSampler,
    GroupDistributedSampler,
    get_data_sampler,
)


def _all_rank_batches(cls, W, **kw):
    return [list(cls(num_replicas=W, rank=r, **kw)) for r in range(W)]


def test_distributed_k_repeat_partition():
    W, M, K, B = 4, 8, 6, 4
    per_rank = _all_rank_batches(
        DistributedKRepeatSampler, W,
        dataset_size=10, unique_sample_num=M, group_size=K, batch_size=B, seed=0,
    )
    # every rank same #batches
    assert all(len(b) == len(per_rank[0]) for b in per_rank)
    flat = [i for rank in per_rank for batch in rank for i in batch]
    assert len(flat) == M * K
    # exactly K copies of each selected unique
    vals, counts = np.unique(flat, return_counts=True)
    assert len(vals) == M and set(counts) == {K}


def test_distributed_k_repeat_epoch_determinism():
    kw = dict(dataset_size=10, unique_sample_num=4, group_size=2, batch_size=2,
              num_replicas=2, rank=0, seed=7)
    s1, s2 = DistributedKRepeatSampler(**kw), DistributedKRepeatSampler(**kw)
    s1.set_epoch(3), s2.set_epoch(3)
    assert list(s1) == list(s2)
    s2.set_epoch(4)
    assert list(s1) != list(s2)


def test_group_contiguous_zero_comm_property():
    W, M, K, B = 2, 4, 6, 6
    per_rank = _all_rank_batches(
        GroupContiguousSampler, W,
        dataset_size=10, unique_sample_num=M, group_size=K, batch_size=B, seed=0,
    )
    for rank_batches in per_rank:
        flat = [i for b in rank_batches for i in b]
        # whole groups rank-local
        vals, counts = np.unique(flat, return_counts=True)
        assert set(counts) == {K}
        # contiguity: each group occupies a contiguous run
        for v in vals:
            pos = [i for i, x in enumerate(flat) if x == v]
            assert pos == list(range(pos[0], pos[0] + K))
    # no overlap between ranks
    r0 = {i for b in per_rank[0] for i in b}
    r1 = {i for b in per_rank[1] for i in b}
    assert not (r0 & r1)


def test_group_distributed_same_sequence_group_complete():
    W, M, B = 4, 6, 4
    K = 8  # K % W == 0, (W*B) % K == 0
    per_rank = _all_rank_batches(
        GroupDistributedSampler, W,
        dataset_size=10, unique_sample_num=M, group_size=K, batch_size=B, seed=0,
    )
    # identical sequence on every rank (the DGPO contract)
    assert all(rank == per_rank[0] for rank in per_rank)
    d = K // W
    for step, batch in enumerate(per_rank[0]):
        # each global micro-batch must hold complete groups: every index in
        # the per-rank batch appears exactly d times
        vals, counts = np.unique(batch, return_counts=True)
        assert set(counts) == {d}


def test_sampler_registry_and_validation():
    s = get_data_sampler(
        "distributed_k_repeat", dataset_size=4, unique_sample_num=4, group_size=2,
        batch_size=2, num_replicas=2, rank=0, seed=0,
    )
    assert len(s) == 2
    with pytest.raises(KeyError):
        get_data_sampler("nope", dataset_size=1, unique_sample_num=1, group_size=1, batch_size=1)
    with pytest.raises(ValueError):
        GroupDistributedSampler(
            dataset_size=4, unique_sample_num=4, group_size=3, batch_size=2,
            num_replicas=2, rank=0,
        )
