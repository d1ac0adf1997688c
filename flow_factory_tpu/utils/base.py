"""Core glue utilities.

Capabilities mirrored from the reference framework (``utils/base.py`` in
Flow-Factory: ``filter_kwargs`` reflection dispatch at
``src/flow_factory/utils/base.py:38-63``, deterministic generator derivation at
``:96-135``), re-expressed for JAX: instead of ``torch.Generator`` objects we
derive integer seeds / PRNG keys from stable hashes of arbitrary parts.
"""
from __future__ import annotations

import hashlib
import inspect
from typing import Any, Callable, Dict, Iterable, Mapping

import jax
import numpy as np


def filter_kwargs(func: Callable, **kwargs) -> Dict[str, Any]:
    """Keep only the kwargs that ``func`` accepts.

    This is the glue that lets trainers splat ``{**training_args, **batch}``
    into any adapter entry point without the adapter having to accept
    ``**kwargs`` everywhere. If ``func`` itself takes ``**kwargs``, everything
    passes through.
    """
    sig = inspect.signature(func)
    params = sig.parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return kwargs
    accepted = {
        name
        for name, p in params.items()
        if p.kind in (inspect.Parameter.POSITIONAL_OR_KEYWORD, inspect.Parameter.KEYWORD_ONLY)
    }
    return {k: v for k, v in kwargs.items() if k in accepted}


def _stable_hash_u64(*parts: Any) -> int:
    """Stable 64-bit hash of arbitrary (repr-able) parts.

    Uses blake2b so the value is stable across processes and Python runs
    (unlike the builtin ``hash``); this is the backbone of every
    "same seed parts → byte-identical randomness on any host" contract.
    """
    h = hashlib.blake2b(digest_size=8)
    for part in parts:
        if isinstance(part, (bytes, bytearray)):
            h.update(bytes(part))
        elif isinstance(part, str):
            h.update(part.encode("utf-8"))
        elif isinstance(part, (int, np.integer)):
            h.update(int(part).to_bytes(16, "little", signed=True))
        elif isinstance(part, float):
            h.update(np.float64(part).tobytes())
        else:
            h.update(repr(part).encode("utf-8"))
        h.update(b"\x00")
    return int.from_bytes(h.digest(), "little")


def derive_seed(*parts: Any) -> int:
    """Derive a deterministic 63-bit seed from arbitrary parts."""
    return _stable_hash_u64(*parts) & 0x7FFF_FFFF_FFFF_FFFF


def derive_key(*parts: Any) -> jax.Array:
    """Derive a deterministic ``jax.random`` key from arbitrary parts."""
    return jax.random.key(derive_seed(*parts))


def key_for_prompt(prompt: str, seed: int) -> jax.Array:
    """Per-prompt deterministic key (eval-time reproducible noise).

    Mirrors the reference ``create_generator_by_prompt``
    (``utils/base.py:117-135``): the same (prompt, seed) pair produces the
    same initial latent noise on every rank / run.
    """
    return derive_key("prompt", prompt, seed)


def keys_for_prompts(prompts: Iterable[str], seed: int) -> jax.Array:
    """Stack of per-prompt keys, shape ``(B,)`` of key dtype."""
    return jax.numpy.stack([key_for_prompt(p, seed) for p in prompts])


def tree_size_bytes(tree: Any) -> int:
    """Total bytes of every array leaf in a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(leaf.size * leaf.dtype.itemsize for leaf in leaves if hasattr(leaf, "dtype"))


def tree_param_count(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(int(np.prod(leaf.shape)) for leaf in leaves if hasattr(leaf, "shape"))


def as_mapping(obj: Any) -> Mapping[str, Any]:
    """View a dataclass-like args object as a mapping for ``**`` splatting."""
    if isinstance(obj, Mapping):
        return obj
    if hasattr(obj, "to_dict"):
        return obj.to_dict()
    if hasattr(obj, "__dataclass_fields__"):
        import dataclasses

        return dataclasses.asdict(obj)
    raise TypeError(f"Cannot view {type(obj).__name__} as a mapping")
