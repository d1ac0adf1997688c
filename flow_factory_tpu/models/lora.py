"""LoRA as functional pytree transforms.

TPU-native replacement for the reference's PEFT-based LoRA management
(``src/flow_factory/models/abc.py:858-949`` apply; ``:532-587`` ref-params via
``disable_adapter()``; ``utils/checkpoint.py:28-160`` key mapping). Instead of
mutating modules, LoRA lives in a *separate trainable pytree* mirroring the
targeted kernel paths; the merged parameters are produced functionally inside
jit — ``W_eff = W + (alpha/r)·(A@B)`` — so:

* ``use_ref_parameters`` == apply with the LoRA tree zeroed (no weight swap),
* EMA / named snapshots == extra copies of the (small) LoRA tree,
* optimizer state exists only for LoRA leaves,
* checkpointing saves just the LoRA tree.

XLA fuses the low-rank matmul + add into the consuming matmul's prologue, so
the merge costs one extra HBM read of the targeted weights per step.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGET_PATTERNS = (
    # attention + FF projections in our module naming
    r".*attn.*/(to_q|to_k|to_v|to_out|add_q_proj|add_k_proj|add_v_proj|to_add_out)/kernel$",
    r".*attn2.*/(to_q|to_k|to_v|to_out)/kernel$",
    r".*/(ff|ff_context)/(fc1|fc2)/kernel$",
)


def _path_str(path: Tuple) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def resolve_target_paths(
    params: Any, target_patterns: Optional[Sequence[str]] = None
) -> List[str]:
    """All 2-D kernel paths matching the target patterns."""
    patterns = [re.compile(p) for p in (target_patterns or DEFAULT_TARGET_PATTERNS)]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, leaf in flat:
        s = _path_str(path)
        if getattr(leaf, "ndim", 0) == 2 and any(p.match(s) for p in patterns):
            out.append(s)
    return out


def init_lora(
    params: Any,
    rank: int,
    key: jax.Array,
    target_patterns: Optional[Sequence[str]] = None,
    dtype: jnp.dtype = jnp.float32,
) -> Dict[str, Dict[str, jax.Array]]:
    """LoRA tree: {path: {'a': (in, r) kaiming-init, 'b': (r, out) zeros}}.

    Flax kernels are (in_features, out_features); delta = a @ b keeps that
    orientation. 'b' zero-init ⇒ identity at step 0 (peft convention).
    """
    paths = resolve_target_paths(params, target_patterns)
    if not paths:
        raise ValueError("No LoRA target parameters matched the given patterns")
    flat = {_path_str(p): leaf for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    tree: Dict[str, Dict[str, jax.Array]] = {}
    for i, path in enumerate(sorted(paths)):
        leaf = flat[path]
        fan_in, fan_out = leaf.shape
        k = jax.random.fold_in(key, i)
        a = jax.random.normal(k, (fan_in, rank), dtype) * (1.0 / np.sqrt(fan_in))
        b = jnp.zeros((rank, fan_out), dtype)
        tree[path] = {"a": a, "b": b}
    return tree


def zero_like_lora(lora: Dict[str, Dict[str, jax.Array]]) -> Dict[str, Dict[str, jax.Array]]:
    return jax.tree.map(jnp.zeros_like, lora)


def merge_lora(
    params: Any,
    lora: Dict[str, Dict[str, jax.Array]],
    scale: float,
) -> Any:
    """Functionally merge LoRA deltas into a params pytree (jit-friendly).

    ``scale`` = alpha / rank (reference peft ``lora_alpha / r``).
    """

    def _merge(path, leaf):
        s = _path_str(path)
        if s in lora:
            ab = lora[s]
            delta = (ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)) * scale
            return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(_merge, params)


def lora_param_count(lora: Dict[str, Dict[str, jax.Array]]) -> int:
    return sum(int(np.prod(v.shape)) for d in lora.values() for v in d.values())
