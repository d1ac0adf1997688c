"""Dataloader orchestration.

Equivalent of reference ``src/flow_factory/data_utils/loader.py:51-306``:
resolve dataset splits (``train``/``test`` files under ``dataset_dir``),
run cached preprocessing with the adapter's ``preprocess_func``, and wrap the
result in sampler-driven loaders. No torch DataLoader — batches are plain
dicts of stacked numpy arrays that the trainer ``jax.device_put``s.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..parallel.dist import get_rank, get_world_size
from .dataset import GeneralDataset, PreprocessedDataset
from .sampler import BaseKRepeatSampler, get_data_sampler

logger = logging.getLogger(__name__)


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Ragged-aware collation (reference dataset.py:704-751): uniform arrays
    stack, everything else stays a list."""
    if not items:
        return {}
    out: Dict[str, Any] = {}
    for k in items[0]:
        values = [it.get(k) for it in items]
        first = values[0]
        if isinstance(first, np.ndarray) and all(
            isinstance(v, np.ndarray) and v.shape == first.shape and v.dtype == first.dtype
            for v in values
        ):
            out[k] = np.stack(values)
        else:
            out[k] = values
    return out


class DataLoader:
    """Sampler-driven batch iterator over a preprocessed dataset."""

    def __init__(self, dataset: PreprocessedDataset, batch_sampler: BaseKRepeatSampler):
        self.dataset = dataset
        self.batch_sampler = batch_sampler

    def set_epoch(self, epoch: int) -> None:
        self.batch_sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.batch_sampler)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for idx_batch in self.batch_sampler:
            batch = self._fetch(list(idx_batch))
            batch["_indices"] = list(idx_batch)
            yield batch

    def _fetch(self, idxs):
        if hasattr(self.dataset, "get_batch"):
            return self.dataset.get_batch(idxs)
        return collate([self.dataset[i] for i in idxs])


class MultiReplicaLoader:
    """Per-process loader driving ALL local replicas (TPU SPMD model).

    One process controls ``local`` devices; each device is a data-parallel
    replica with its own sampler stream (num_replicas = global device count).
    Every iteration concatenates the local replicas' index batches into one
    process-level batch of ``B × local`` samples, ordered by replica — the
    leading batch dim then shards exactly onto the mesh's data axes.
    """

    def __init__(self, dataset: PreprocessedDataset, samplers: List[BaseKRepeatSampler]):
        if not samplers:
            raise ValueError("need at least one replica sampler")
        self.dataset = dataset
        self.samplers = samplers

    def set_epoch(self, epoch: int) -> None:
        for s in self.samplers:
            s.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.samplers[0])

    @property
    def batch_size(self) -> int:
        return sum(s.batch_size for s in self.samplers)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for idx_batches in zip(*self.samplers):
            idxs = [i for b in idx_batches for i in b]
            if hasattr(self.dataset, "get_batch"):
                batch = self.dataset.get_batch(idxs)
            else:
                batch = collate([self.dataset[i] for i in idxs])
            batch["_indices"] = idxs
            yield batch


class SequentialLoader:
    """Plain strided loader for evaluation (PROCESS-sharded, no K-repeat).

    ``rank``/``world`` are process coordinates — each process reads the
    slice for ALL of its local replicas and `shard_batch` splits it across
    local devices (get_world_size()=devices vs get_num_processes()=hosts;
    mixing these up starves single-host multi-device eval). Tail batches
    are padded by repeating the last row up to a multiple of ``pad_to``
    (the local replica count) so batch sharding always divides; the pad
    count rides in ``_num_pad`` for the caller to drop after inference."""

    def __init__(self, dataset: PreprocessedDataset, batch_size: int, rank: int = 0,
                 world: int = 1, pad_to: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_to = max(1, pad_to)
        self.indices = list(range(rank, len(dataset), world))

    def __len__(self) -> int:
        return -(-len(self.indices) // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for b in range(len(self)):
            idxs = self.indices[b * self.batch_size : (b + 1) * self.batch_size]
            pad = (-len(idxs)) % self.pad_to
            idxs = idxs + [idxs[-1]] * pad
            if hasattr(self.dataset, "get_batch"):
                batch = self.dataset.get_batch(idxs)
            else:
                batch = collate([self.dataset[i] for i in idxs])
            batch["_indices"] = idxs
            batch["_num_pad"] = pad
            yield batch


def _resolve_split_path(dataset_dir: str, split: str) -> Optional[str]:
    if os.path.isfile(dataset_dir):
        return dataset_dir if split == "train" else None
    for ext in ("txt", "jsonl", "json"):
        p = os.path.join(dataset_dir, f"{split}.{ext}")
        if os.path.exists(p):
            return p
    return None


def get_dataloader(
    config,
    preprocess_func: Optional[Callable] = None,
    preprocess_kwargs: Optional[Dict[str, Any]] = None,
) -> Tuple[DataLoader, Optional[SequentialLoader]]:
    """Build the (train, test) loaders per config geometry."""
    da = config.data_args
    ta = config.training_args
    cache_dir = os.path.expanduser(da.cache_dir)
    world, rank = get_world_size(), get_rank()

    train_path = _resolve_split_path(da.dataset_dir, "train")
    if train_path is None:
        raise FileNotFoundError(f"No train split found under {da.dataset_dir}")
    train_raw = GeneralDataset(train_path, "train", cutoff=da.max_dataset_size)
    train_ds = train_raw.preprocess(
        preprocess_func,
        cache_dir,
        func_kwargs=preprocess_kwargs,
        model_id=config.model_args.model_name_or_path or config.model_args.model_type,
        batch_size=da.preprocessing_batch_size,
    )
    # One sampler per LOCAL replica (device); `rank` here is the process
    # index, replica ids are globally numbered process-major.
    from ..parallel.dist import get_num_processes

    procs = get_num_processes()
    local = max(1, world // procs)
    samplers = [
        get_data_sampler(
            da.sampler_type,
            dataset_size=len(train_ds),
            unique_sample_num=ta.unique_sample_num_per_epoch,
            group_size=ta.group_size,
            batch_size=ta.per_device_batch_size,
            num_replicas=world,
            rank=rank * local + j,
            seed=ta.seed,
        )
        for j in range(local)
    ]
    train_loader = MultiReplicaLoader(train_ds, samplers)

    test_loader = None
    test_path = _resolve_split_path(da.dataset_dir, "test")
    if test_path is not None:
        test_raw = GeneralDataset(test_path, "test", cutoff=getattr(config.eval_args, "max_size", None))
        test_ds = test_raw.preprocess(
            preprocess_func,
            cache_dir,
            func_kwargs=preprocess_kwargs,
            model_id=config.model_args.model_name_or_path or config.model_args.model_type,
            batch_size=da.preprocessing_batch_size,
        )
        eval_bs = getattr(config.eval_args, "per_device_batch_size", None) or ta.per_device_batch_size
        # process-level batch = per-device batch × local replicas; strided
        # over PROCESSES (each process feeds all its local devices)
        test_loader = SequentialLoader(
            test_ds, eval_bs * local, rank=rank, world=procs, pad_to=local)
    return train_loader, test_loader
