"""Checkpoint key mapping: torch/diffusers/PEFT → flax pytrees.

Counterpart of the reference's LoRA key remapping + rank/alpha/target
inference (``src/flow_factory/utils/checkpoint.py:28-160``), extended with
the weight-porting surface this framework needs: importing pretrained
diffusers safetensors into our flax parameter trees.

Conventions:
* torch Linear weight (out, in)  → flax Dense kernel (in, out): TRANSPOSE.
* torch Conv2d weight (out, in, kh, kw) → flax Conv kernel (kh, kw, in, out).
* PEFT LoRA ``...lora_A.weight`` (r, in) / ``...lora_B.weight`` (out, r)
  → our {'a': (in, r), 'b': (r, out)}: transpose both.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def torch_linear_to_dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def torch_conv1d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))  # (out,in,k) → (k,in,out)


def torch_conv2d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def torch_conv3d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


# ---------------------------------------------------------------------------
# PEFT LoRA import (legacy + standard layouts)
# ---------------------------------------------------------------------------

def infer_lora_config(state_dict: Dict[str, np.ndarray]) -> Tuple[int, list]:
    """(rank, target module names) from a bare LoRA state dict
    (reference rank/alpha/target inference, ``checkpoint.py``)."""
    rank = 0
    targets = set()
    for k, v in state_dict.items():
        if "lora_A" in k or "lora_down" in k:
            rank = max(rank, v.shape[0])
            base = re.sub(r"\.(lora_A|lora_down).*", "", k)
            targets.add(base.split(".")[-1])
    return rank, sorted(targets)


def normalize_peft_keys(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Canonicalize PEFT/legacy LoRA key spellings.

    Handles: ``base_model.model.`` prefixes, ``.default.weight`` adapter
    suffixes, kohya ``lora_down/lora_up`` naming.
    """
    out = {}
    for k, v in state_dict.items():
        k = re.sub(r"^base_model\.model\.", "", k)
        k = re.sub(r"^transformer\.", "", k)
        k = k.replace(".lora_down.weight", ".lora_A.weight")
        k = k.replace(".lora_up.weight", ".lora_B.weight")
        k = k.replace(".lora_A.default.weight", ".lora_A.weight")
        k = k.replace(".lora_B.default.weight", ".lora_B.weight")
        out[k] = v
    return out


def import_peft_lora(
    state_dict: Dict[str, np.ndarray],
    path_map: Dict[str, str],
) -> Dict[str, Dict[str, np.ndarray]]:
    """PEFT LoRA state dict → our LoRA tree {our_path: {'a', 'b'}}.

    ``path_map``: torch module path (dot, no suffix) → our param path
    (slash, ending ``/kernel``). Unmapped modules warn and are skipped.
    """
    sd = normalize_peft_keys(state_dict)
    tree: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"(.+)\.(lora_A|lora_B)\.weight$", k)
        if not m:
            continue
        module, which = m.group(1), m.group(2)
        our = path_map.get(module)
        if our is None:
            logger.warning("LoRA import: no mapping for %s; skipped", module)
            continue
        slot = tree.setdefault(our, {})
        if which == "lora_A":
            slot["a"] = torch_linear_to_dense(np.asarray(v))  # (in, r)
        else:
            slot["b"] = torch_linear_to_dense(np.asarray(v))  # (r, out)
    missing = [k for k, d in tree.items() if set(d) != {"a", "b"}]
    if missing:
        raise ValueError(f"LoRA import incomplete for paths: {missing}")
    return tree


# ---------------------------------------------------------------------------
# Diffusers SD3 transformer key map (weight porting)
# ---------------------------------------------------------------------------

def sd3_transformer_key_map(depth: int, dual_attention_layers=()) -> Dict[str, str]:
    """diffusers ``SD3Transformer2DModel`` module path → our param path.

    Linear/conv transposes are applied by :func:`import_diffusers_params`;
    this map only renames. Covers the MMDiT(-X) blocks, embedders, and head.
    """
    m: Dict[str, str] = {
        "pos_embed.proj": "pos_embed/proj",
        "context_embedder": "context_embedder",
        "time_text_embed.timestep_embedder.linear_1": "time_embed/linear_1",
        "time_text_embed.timestep_embedder.linear_2": "time_embed/linear_2",
        "time_text_embed.text_embedder.linear_1": "text_embed/linear_1",
        "time_text_embed.text_embedder.linear_2": "text_embed/linear_2",
        "norm_out.linear": "norm_out/linear",
        "proj_out": "proj_out",
    }
    for i in range(depth):
        b, o = f"transformer_blocks.{i}", f"block_{i}"
        m[f"{b}.norm1.linear"] = f"{o}/norm1/linear"
        # the FINAL block is context_pre_only upstream (diffusers
        # JointTransformerBlock): context tokens still feed attention
        # (add_{q,k,v}_proj exist) but have no output projection or FFN —
        # our graph omits to_add_out/ff_context there identically
        # (test_keymap_completeness.py pins both directions)
        last = i == depth - 1
        m[f"{b}.norm1_context.linear"] = f"{o}/norm1_context/linear"
        m[f"{b}.attn.to_q"] = f"{o}/attn/to_q"
        m[f"{b}.attn.to_k"] = f"{o}/attn/to_k"
        m[f"{b}.attn.to_v"] = f"{o}/attn/to_v"
        m[f"{b}.attn.to_out.0"] = f"{o}/attn/to_out"
        m[f"{b}.attn.add_q_proj"] = f"{o}/attn/add_q_proj"
        m[f"{b}.attn.add_k_proj"] = f"{o}/attn/add_k_proj"
        m[f"{b}.attn.add_v_proj"] = f"{o}/attn/add_v_proj"
        m[f"{b}.attn.norm_q"] = f"{o}/attn/qk_norm/q_norm"
        m[f"{b}.attn.norm_k"] = f"{o}/attn/qk_norm/k_norm"
        m[f"{b}.attn.norm_added_q"] = f"{o}/attn/added_qk_norm/q_norm"
        m[f"{b}.attn.norm_added_k"] = f"{o}/attn/added_qk_norm/k_norm"
        m[f"{b}.ff.net.0.proj"] = f"{o}/ff/fc1"
        m[f"{b}.ff.net.2"] = f"{o}/ff/fc2"
        if not last:
            m[f"{b}.attn.to_add_out"] = f"{o}/attn/to_add_out"
            m[f"{b}.ff_context.net.0.proj"] = f"{o}/ff_context/fc1"
            m[f"{b}.ff_context.net.2"] = f"{o}/ff_context/fc2"
        if i in dual_attention_layers:
            m[f"{b}.attn2.to_q"] = f"{o}/attn2/to_q"
            m[f"{b}.attn2.to_k"] = f"{o}/attn2/to_k"
            m[f"{b}.attn2.to_v"] = f"{o}/attn2/to_v"
            m[f"{b}.attn2.to_out.0"] = f"{o}/attn2/to_out"
            m[f"{b}.attn2.norm_q"] = f"{o}/attn2/qk_norm/q_norm"
            m[f"{b}.attn2.norm_k"] = f"{o}/attn2/qk_norm/k_norm"
    return m


class ImportReport:
    """What an :func:`import_diffusers_params` call actually did.

    ``missing`` — template leaves left at random init;
    ``unmatched`` — checkpoint keys no map rule consumed;
    ``matched`` — leaves filled from the checkpoint.
    A silent mismatch here is how a misspelled key map "loads" a real
    checkpoint into garbage (VERDICT r2 Missing #1) — strict mode turns
    both lists into a hard error with the actionable names.
    """

    def __init__(self):
        self.matched: int = 0
        self.missing: list = []
        self.unmatched: list = []

    def summary(self, component: str = "") -> str:
        head = f"[{component}] " if component else ""
        return (
            f"{head}{self.matched} leaves imported, "
            f"{len(self.missing)} template leaves left at init"
            + (f" (first: {self.missing[:8]})" if self.missing else "")
            + f", {len(self.unmatched)} checkpoint keys unmatched"
            + (f" (first: {self.unmatched[:8]})" if self.unmatched else "")
        )


#: torch state-dict keys that are never parameters on our side
_IGNORABLE_KEYS = re.compile(
    r"(^|\.)(position_ids|num_batches_tracked|rotary_emb\.inv_freq)$"
)


def import_diffusers_params(
    state_dict: Dict[str, np.ndarray],
    key_map: Dict[str, str],
    template: Any,
    raw_map: Optional[Dict[str, str]] = None,
    strict: bool = False,
    component: str = "",
    report_out: Optional[list] = None,
    unmatched_scope: Optional[str] = None,
) -> Any:
    """Torch state dict + key map → flax params matching ``template``.

    Applies layout transposes by tensor rank, validates shapes against the
    template, and reports unmapped/missing keys. ``raw_map`` maps FULL torch
    keys (bare nn.Parameters with no ``.weight``/``.bias`` suffix, e.g. Wan's
    ``scale_shift_table``) to full leaf paths; those are copied verbatim.
    A conv kernel mapped onto a dense leaf of equal size (patch embedders
    expressed as reshape+matmul here) is re-flattened to the dense layout —
    flax conv order (k..., in, out) row-majors to exactly our patch order.

    ``strict=True`` raises with the full diagnostic if ANY template leaf is
    left at init or ANY checkpoint key is unconsumed — the contract for
    real-weight loads (``scripts/parity_check.py``, ``model.strict_import``).
    ``unmatched_scope``: regex of checkpoint keys this component CLAIMS —
    keys outside it belong to a sibling component sharing the directory
    (Qwen's vision tower + LM both ship in ``text_encoder/``) and are not
    reported. ``report_out``: pass a list to receive the
    :class:`ImportReport`.
    """
    import jax

    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    want = {}
    for path, leaf in flat_t:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        want[key] = leaf

    report = ImportReport()
    converted: Dict[str, np.ndarray] = {}
    for tk, v in state_dict.items():
        if raw_map and tk in raw_map:
            converted[raw_map[tk]] = np.asarray(v)
            continue
        base = re.sub(r"\.(weight|bias)$", "", tk)
        suffix = tk.rsplit(".", 1)[-1]
        our_base = key_map.get(base)
        if our_base is None:
            if not _IGNORABLE_KEYS.search(tk) and (
                unmatched_scope is None or re.match(unmatched_scope, tk)
            ):
                report.unmatched.append(tk)
            continue
        v = np.asarray(v)
        if suffix == "weight":
            if v.ndim == 2:
                name, v = "kernel", torch_linear_to_dense(v)
            elif v.ndim == 3:
                name, v = "kernel", torch_conv1d_to_flax(v)
            elif v.ndim == 4:
                name, v = "kernel", torch_conv2d_to_flax(v)
            elif v.ndim == 5:
                name, v = "kernel", torch_conv3d_to_flax(v)
            else:
                name = "scale"  # norms / 1-D weights
        else:
            name = "bias"
        converted[f"{our_base}/{name}"] = v

    # converted keys that map to no template leaf are also spelling bugs
    report.unmatched.extend(sorted(set(converted) - set(want)))

    leaves = []
    mismatched = []
    for path, leaf in flat_t:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key in converted:
            arr = converted[key]
            if tuple(arr.shape) != tuple(leaf.shape):
                # same-size rank mismatch: conv kernels onto dense
                # patch-embed leaves (flax layout (k..., in, out) flattens
                # row-major to our (patch..., channel) order) and
                # leading-1 buffer differences (e.g. position embeddings)
                if arr.size == np.asarray(leaf).size and arr.ndim != np.asarray(leaf).ndim:
                    arr = arr.reshape(np.asarray(leaf).shape)
                    leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype))
                    report.matched += 1
                else:
                    mismatched.append((key, arr.shape, tuple(leaf.shape)))
                    leaves.append(leaf)
            else:
                leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype))
                report.matched += 1
        else:
            report.missing.append(key)
            leaves.append(leaf)
    if report_out is not None:
        report_out.append(report)
    if mismatched:
        raise ValueError(f"Shape mismatches during import: {mismatched[:5]}")
    if strict and (report.missing or report.unmatched):
        raise ValueError(
            "Strict pretrained import failed — the key map does not cover "
            "this checkpoint. " + report.summary(component)
            + f"; all missing: {report.missing}; all unmatched: {report.unmatched}"
        )
    if report.missing:
        logger.warning(
            "Import left %d params at init (first: %s)",
            len(report.missing), report.missing[:5],
        )
    if report.unmatched:
        logger.warning(
            "Import ignored %d checkpoint keys (first: %s)",
            len(report.unmatched), report.unmatched[:5],
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def flux_transformer_key_map(num_double: int, num_single: int) -> Dict[str, str]:
    """diffusers ``FluxTransformer2DModel`` module path → our param path."""
    m: Dict[str, str] = {
        "x_embedder": "x_embedder",
        "context_embedder": "context_embedder",
        "time_text_embed.timestep_embedder.linear_1": "time_embed/linear_1",
        "time_text_embed.timestep_embedder.linear_2": "time_embed/linear_2",
        "time_text_embed.guidance_embedder.linear_1": "guidance_embed/linear_1",
        "time_text_embed.guidance_embedder.linear_2": "guidance_embed/linear_2",
        "time_text_embed.text_embedder.linear_1": "text_embed/linear_1",
        "time_text_embed.text_embedder.linear_2": "text_embed/linear_2",
        "norm_out.linear": "norm_out/linear",
        "proj_out": "proj_out",
    }
    for i in range(num_double):
        b, o = f"transformer_blocks.{i}", f"double_{i}"
        m[f"{b}.norm1.linear"] = f"{o}/img_mod"
        m[f"{b}.norm1_context.linear"] = f"{o}/txt_mod"
        m[f"{b}.attn.to_q"] = f"{o}/img_q"
        m[f"{b}.attn.to_k"] = f"{o}/img_k"
        m[f"{b}.attn.to_v"] = f"{o}/img_v"
        m[f"{b}.attn.to_out.0"] = f"{o}/img_attn_out"
        m[f"{b}.attn.add_q_proj"] = f"{o}/txt_q"
        m[f"{b}.attn.add_k_proj"] = f"{o}/txt_k"
        m[f"{b}.attn.add_v_proj"] = f"{o}/txt_v"
        m[f"{b}.attn.to_add_out"] = f"{o}/txt_attn_out"
        m[f"{b}.attn.norm_q"] = f"{o}/img_qk_norm/q_norm"
        m[f"{b}.attn.norm_k"] = f"{o}/img_qk_norm/k_norm"
        m[f"{b}.attn.norm_added_q"] = f"{o}/txt_qk_norm/q_norm"
        m[f"{b}.attn.norm_added_k"] = f"{o}/txt_qk_norm/k_norm"
        m[f"{b}.ff.net.0.proj"] = f"{o}/img_ff/fc1"
        m[f"{b}.ff.net.2"] = f"{o}/img_ff/fc2"
        m[f"{b}.ff_context.net.0.proj"] = f"{o}/txt_ff/fc1"
        m[f"{b}.ff_context.net.2"] = f"{o}/txt_ff/fc2"
    for i in range(num_single):
        b, o = f"single_transformer_blocks.{i}", f"single_{i}"
        m[f"{b}.norm.linear"] = f"{o}/mod"
        m[f"{b}.proj_mlp"] = f"{o}/linear1"  # NOTE: diffusers splits qkv+mlp; fused import below
        m[f"{b}.attn.to_q"] = f"{o}/linear1"  # handled by import_flux_single_blocks
        m[f"{b}.proj_out"] = f"{o}/linear2"
        m[f"{b}.attn.norm_q"] = f"{o}/qk_norm/q_norm"
        m[f"{b}.attn.norm_k"] = f"{o}/qk_norm/k_norm"
    return m


def fuse_flux_single_block_qkv_mlp(state_dict: Dict[str, np.ndarray], num_single: int) -> Dict[str, np.ndarray]:
    """diffusers keeps single-block q/k/v/mlp as separate projections; our
    module fuses them into one ``linear1``. Concatenate along the output dim
    (torch layout (out, in)) before key mapping."""
    out = dict(state_dict)
    for i in range(num_single):
        b = f"single_transformer_blocks.{i}"
        parts = [out.pop(f"{b}.attn.to_q.weight", None),
                 out.pop(f"{b}.attn.to_k.weight", None),
                 out.pop(f"{b}.attn.to_v.weight", None),
                 out.pop(f"{b}.proj_mlp.weight", None)]
        if all(p is not None for p in parts):
            out[f"{b}.attn.to_q.weight"] = np.concatenate(parts, axis=0)
        bias = [out.pop(f"{b}.attn.to_q.bias", None),
                out.pop(f"{b}.attn.to_k.bias", None),
                out.pop(f"{b}.attn.to_v.bias", None),
                out.pop(f"{b}.proj_mlp.bias", None)]
        if all(p is not None for p in bias):
            out[f"{b}.attn.to_q.bias"] = np.concatenate(bias, axis=0)
    return out


def wan_transformer_key_map(num_layers: int, i2v: bool = False) -> Tuple[Dict[str, str], Dict[str, str]]:
    """diffusers ``WanTransformer3DModel`` module path → our param path.

    Returns ``(key_map, raw_map)`` for :func:`import_diffusers_params`.
    The Conv3d ``patch_embedding`` imports onto our reshape+matmul patch
    embed (flax conv layout flattens to the same (pt, ph, pw, C) feature
    order); ``scale_shift_table`` parameters ride ``raw_map``. Covers the
    reference's Wan2.1/2.2 family (``src/flow_factory/models/wan_*``); the
    Wan2.2 MoE variant applies this map once per expert stream.
    """
    m: Dict[str, str] = {
        "patch_embedding": "patch_embedding",
        "condition_embedder.time_embedder.linear_1": "time_embed/linear_1",
        "condition_embedder.time_embedder.linear_2": "time_embed/linear_2",
        "condition_embedder.time_proj": "time_proj",
        "condition_embedder.text_embedder.linear_1": "ctx_proj0",
        "condition_embedder.text_embedder.linear_2": "ctx_proj1",
        "proj_out": "head_out",
    }
    raw: Dict[str, str] = {"scale_shift_table": "head_table"}
    for i in range(num_layers):
        b, o = f"blocks.{i}", f"block_{i}"
        raw[f"{b}.scale_shift_table"] = f"{o}/scale_shift_table"
        m[f"{b}.attn1.to_q"] = f"{o}/sa_q"
        m[f"{b}.attn1.to_k"] = f"{o}/sa_k"
        m[f"{b}.attn1.to_v"] = f"{o}/sa_v"
        m[f"{b}.attn1.to_out.0"] = f"{o}/sa_out"
        m[f"{b}.attn1.norm_q"] = f"{o}/sa_qk_norm/q_norm"
        m[f"{b}.attn1.norm_k"] = f"{o}/sa_qk_norm/k_norm"
        m[f"{b}.attn2.to_q"] = f"{o}/ca_q"
        m[f"{b}.attn2.to_k"] = f"{o}/ca_k"
        m[f"{b}.attn2.to_v"] = f"{o}/ca_v"
        m[f"{b}.attn2.to_out.0"] = f"{o}/ca_out"
        m[f"{b}.attn2.norm_q"] = f"{o}/ca_qk_norm/q_norm"
        m[f"{b}.attn2.norm_k"] = f"{o}/ca_qk_norm/k_norm"
        m[f"{b}.norm2"] = f"{o}/norm2"
        m[f"{b}.ffn.net.0.proj"] = f"{o}/ffn1"
        m[f"{b}.ffn.net.2"] = f"{o}/ffn2"
        if i2v:  # Wan2.1 I2V image cross-attention stream
            m[f"{b}.attn2.add_k_proj"] = f"{o}/ca_k_img"
            m[f"{b}.attn2.add_v_proj"] = f"{o}/ca_v_img"
            m[f"{b}.attn2.norm_added_k"] = f"{o}/ca_k_img_norm"
    if i2v:  # CLIP-token projector (upstream WanImageEmbedding)
        m["condition_embedder.image_embedder.norm1"] = "img_emb_norm1"
        m["condition_embedder.image_embedder.ff.net.0.proj"] = "img_emb_fc1"
        m["condition_embedder.image_embedder.ff.net.2"] = "img_emb_fc2"
        m["condition_embedder.image_embedder.norm2"] = "img_emb_norm2"
    return m, raw


def flux2_transformer_key_map(num_double: int, num_single: int) -> Dict[str, str]:
    """Upstream FLUX.2 transformer module path → our param path.

    The per-block Linear layout is VERIFIED against the reference's
    ``default_target_modules`` (``src/flow_factory/models/flux/flux2.py:
    90-104``): double blocks keep the FLUX.1 attention naming but use
    ``ff.linear_in/linear_out`` FFNs; single blocks are natively FUSED
    upstream (``attn.to_qkv_mlp_proj`` + ``attn.to_out.0``) — exactly our
    ``linear1``/``linear2`` split, so no concat preprocessing is needed
    (unlike FLUX.1, :func:`fuse_flux_single_block_qkv_mlp`). FLUX.2 has no
    pooled-text embedder (the reference's transformer call passes only
    timestep/guidance/text states, ``flux2.py:816-825``); the top-level
    time/guidance embedder spelling is best-effort pending real weights.
    """
    m: Dict[str, str] = {
        "x_embedder": "x_embedder",
        "context_embedder": "context_embedder",
        "time_guidance_embed.timestep_embedder.linear_1": "time_embed/linear_1",
        "time_guidance_embed.timestep_embedder.linear_2": "time_embed/linear_2",
        "time_guidance_embed.guidance_embedder.linear_1": "guidance_embed/linear_1",
        "time_guidance_embed.guidance_embedder.linear_2": "guidance_embed/linear_2",
        "norm_out.linear": "norm_out/linear",
        "proj_out": "proj_out",
    }
    for i in range(num_double):
        b, o = f"transformer_blocks.{i}", f"double_{i}"
        m[f"{b}.norm1.linear"] = f"{o}/img_mod"
        m[f"{b}.norm1_context.linear"] = f"{o}/txt_mod"
        m[f"{b}.attn.to_q"] = f"{o}/img_q"
        m[f"{b}.attn.to_k"] = f"{o}/img_k"
        m[f"{b}.attn.to_v"] = f"{o}/img_v"
        m[f"{b}.attn.to_out.0"] = f"{o}/img_attn_out"
        m[f"{b}.attn.add_q_proj"] = f"{o}/txt_q"
        m[f"{b}.attn.add_k_proj"] = f"{o}/txt_k"
        m[f"{b}.attn.add_v_proj"] = f"{o}/txt_v"
        m[f"{b}.attn.to_add_out"] = f"{o}/txt_attn_out"
        m[f"{b}.attn.norm_q"] = f"{o}/img_qk_norm/q_norm"
        m[f"{b}.attn.norm_k"] = f"{o}/img_qk_norm/k_norm"
        m[f"{b}.attn.norm_added_q"] = f"{o}/txt_qk_norm/q_norm"
        m[f"{b}.attn.norm_added_k"] = f"{o}/txt_qk_norm/k_norm"
        m[f"{b}.ff.linear_in"] = f"{o}/img_ff/fc1"
        m[f"{b}.ff.linear_out"] = f"{o}/img_ff/fc2"
        m[f"{b}.ff_context.linear_in"] = f"{o}/txt_ff/fc1"
        m[f"{b}.ff_context.linear_out"] = f"{o}/txt_ff/fc2"
    for i in range(num_single):
        b, o = f"single_transformer_blocks.{i}", f"single_{i}"
        m[f"{b}.norm.linear"] = f"{o}/mod"
        m[f"{b}.attn.to_qkv_mlp_proj"] = f"{o}/linear1"
        m[f"{b}.attn.to_out.0"] = f"{o}/linear2"
        m[f"{b}.attn.norm_q"] = f"{o}/qk_norm/q_norm"
        m[f"{b}.attn.norm_k"] = f"{o}/qk_norm/k_norm"
    return m


def check_flux2_mlp_style(state_dict: Dict[str, np.ndarray], mlp_style: str) -> Dict[str, np.ndarray]:
    """Import-time guard: detect whether the checkpoint's double-block FFN is
    gated (``linear_in`` out = 2 × ``linear_out`` in → SwiGLU) and raise an
    actionable error if the configured ``mlp_style`` disagrees."""
    win = state_dict.get("transformer_blocks.0.ff.linear_in.weight")
    wout = state_dict.get("transformer_blocks.0.ff.linear_out.weight")
    if win is not None and wout is not None:
        gated = win.shape[0] == 2 * wout.shape[1]
        want = "swiglu" if gated else "gelu_tanh"
        if want != mlp_style:
            raise ValueError(
                f"FLUX.2 checkpoint FFN is {'gated (SwiGLU)' if gated else 'ungated'} "
                f"but the model was built with mlp_style={mlp_style!r}; set "
                f"model.mlp_style: {want!r} in the config."
            )
    return state_dict


def ltx2_transformer_key_map(num_layers: int) -> Tuple[Dict[str, str], Dict[str, str]]:
    """Upstream LTX-2 AV transformer module path → our param path.

    The per-block layout (6 attention groups + 2 FFN groups, 28 Linears) is
    VERIFIED against the reference's ``default_target_modules``
    (``src/flow_factory/models/ltx2/ltx2_t2av.py:176-218``, itself checked
    against ``LTX2VideoTransformerBlock.named_modules()``). The top-level
    embedder/time/head names follow the LTX family conventions
    (``time_embed`` AdaLayerNormSingle, top-level ``scale_shift_table``
    head tables) and are best-effort pending real upstream weights
    (PARITY.md gap 1). Returns ``(key_map, raw_map)``.
    """
    m: Dict[str, str] = {
        "proj_in": "video_embedder",
        "audio_proj_in": "audio_embedder",
        "time_embed.emb.timestep_embedder.linear_1": "time_embed/linear_1",
        "time_embed.emb.timestep_embedder.linear_2": "time_embed/linear_2",
        "time_embed.linear": "time_proj",
        "audio_time_embed.emb.timestep_embedder.linear_1": "audio_time_embed/linear_1",
        "audio_time_embed.emb.timestep_embedder.linear_2": "audio_time_embed/linear_2",
        "audio_time_embed.linear": "audio_time_proj",
        "proj_out": "video_head",
        "audio_proj_out": "audio_head",
    }
    raw: Dict[str, str] = {
        "scale_shift_table": "head_table",
        "audio_scale_shift_table": "audio_head_table",
    }
    attn_groups = {
        "attn1": "sa", "audio_attn1": "a_sa",
    }
    cross_groups = {
        "attn2": "ca", "audio_attn2": "a_ca",
        "audio_to_video_attn": "a2v", "video_to_audio_attn": "v2a",
    }
    for i in range(num_layers):
        b, o = f"transformer_blocks.{i}", f"block_{i}"
        raw[f"{b}.scale_shift_table"] = f"{o}/scale_shift_table"
        raw[f"{b}.audio_scale_shift_table"] = f"{o}/audio_scale_shift_table"
        for src, dst in attn_groups.items():
            m[f"{b}.{src}.to_q"] = f"{o}/{dst}_q"
            m[f"{b}.{src}.to_k"] = f"{o}/{dst}_k"
            m[f"{b}.{src}.to_v"] = f"{o}/{dst}_v"
            m[f"{b}.{src}.to_out.0"] = f"{o}/{dst}_out"
            m[f"{b}.{src}.norm_q"] = f"{o}/{dst}_qk_norm/q_norm"
            m[f"{b}.{src}.norm_k"] = f"{o}/{dst}_qk_norm/k_norm"
        for src, dst in cross_groups.items():
            m[f"{b}.{src}.to_q"] = f"{o}/{dst}/q"
            m[f"{b}.{src}.to_k"] = f"{o}/{dst}/k"
            m[f"{b}.{src}.to_v"] = f"{o}/{dst}/v"
            m[f"{b}.{src}.to_out.0"] = f"{o}/{dst}/out"
            m[f"{b}.{src}.norm_q"] = f"{o}/{dst}/qk_norm/q_norm"
            m[f"{b}.{src}.norm_k"] = f"{o}/{dst}/qk_norm/k_norm"
        m[f"{b}.ff.net.0.proj"] = f"{o}/ffn1"
        m[f"{b}.ff.net.2"] = f"{o}/ffn2"
        m[f"{b}.audio_ff.net.0.proj"] = f"{o}/a_ffn1"
        m[f"{b}.audio_ff.net.2"] = f"{o}/a_ffn2"
    return m, raw


def qwen_image_transformer_key_map(num_blocks: int) -> Dict[str, str]:
    """diffusers ``QwenImageTransformer2DModel`` module path → our param path.

    Qwen-Image is a pure double-stream MMDiT, which we express as a
    ``FluxTransformer`` with ``num_single_blocks=0`` (same joint-attention
    math; reference ``src/flow_factory/models/qwenimage.py``). The upstream
    modulations are ``nn.Sequential(SiLU, Linear)`` — hence the ``.1`` module
    index — and chunk (shift, scale, gate)×(attn, mlp), matching our block's
    6-way split. The pre-``txt_in`` RMSNorm maps onto ``cfg.txt_norm``.
    """
    m: Dict[str, str] = {
        "img_in": "x_embedder",
        "txt_norm": "txt_norm",
        "txt_in": "context_embedder",
        "time_text_embed.timestep_embedder.linear_1": "time_embed/linear_1",
        "time_text_embed.timestep_embedder.linear_2": "time_embed/linear_2",
        "norm_out.linear": "norm_out/linear",
        "proj_out": "proj_out",
    }
    for i in range(num_blocks):
        b, o = f"transformer_blocks.{i}", f"double_{i}"
        m[f"{b}.img_mod.1"] = f"{o}/img_mod"
        m[f"{b}.txt_mod.1"] = f"{o}/txt_mod"
        m[f"{b}.attn.to_q"] = f"{o}/img_q"
        m[f"{b}.attn.to_k"] = f"{o}/img_k"
        m[f"{b}.attn.to_v"] = f"{o}/img_v"
        m[f"{b}.attn.to_out.0"] = f"{o}/img_attn_out"
        m[f"{b}.attn.add_q_proj"] = f"{o}/txt_q"
        m[f"{b}.attn.add_k_proj"] = f"{o}/txt_k"
        m[f"{b}.attn.add_v_proj"] = f"{o}/txt_v"
        m[f"{b}.attn.to_add_out"] = f"{o}/txt_attn_out"
        m[f"{b}.attn.norm_q"] = f"{o}/img_qk_norm/q_norm"
        m[f"{b}.attn.norm_k"] = f"{o}/img_qk_norm/k_norm"
        m[f"{b}.attn.norm_added_q"] = f"{o}/txt_qk_norm/q_norm"
        m[f"{b}.attn.norm_added_k"] = f"{o}/txt_qk_norm/k_norm"
        m[f"{b}.img_mlp.net.0.proj"] = f"{o}/img_ff/fc1"
        m[f"{b}.img_mlp.net.2"] = f"{o}/img_ff/fc2"
        m[f"{b}.txt_mlp.net.0.proj"] = f"{o}/txt_ff/fc1"
        m[f"{b}.txt_mlp.net.2"] = f"{o}/txt_ff/fc2"
    return m


def load_component_config(path: str, subfolder: str) -> Optional[Dict[str, Any]]:
    """Read ``<path>/<subfolder>/config.json`` if present (diffusers layout)."""
    import json as _json
    import os as _os

    f = _os.path.join(path, subfolder, "config.json")
    if not _os.path.isfile(f):
        return None
    try:
        with open(f) as fh:
            return _json.load(fh)
    except Exception as e:  # malformed config: warn, fall back to preset
        logger.warning("Could not parse %s: %s", f, e)
        return None


def apply_config_json_overrides(preset_cfg: Any, path: Optional[str], subfolder: str,
                                overrides_fn) -> Any:
    """Self-configure a component dataclass from a checkpoint directory's
    diffusers ``config.json`` (the reference gets this for free from
    ``DiffusionPipeline.from_pretrained``; here the per-family
    ``*_overrides_from_config`` functions translate the key names)."""
    import dataclasses as _dc
    import os as _os

    if path and _os.path.isdir(path):
        cj = load_component_config(path, subfolder)
        if cj:
            return _dc.replace(preset_cfg, **overrides_fn(cj))
    return preset_cfg


def sd3_transformer_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers ``SD3Transformer2DModel`` config.json → MMDiTConfig overrides."""
    out: Dict[str, Any] = {}
    if "num_layers" in cfg:
        out["depth"] = int(cfg["num_layers"])
    if "num_attention_heads" in cfg:
        out["num_heads"] = int(cfg["num_attention_heads"])
        if "attention_head_dim" in cfg:
            out["hidden_dim"] = int(cfg["num_attention_heads"]) * int(cfg["attention_head_dim"])
    for src, dst in (("in_channels", "in_channels"), ("out_channels", "out_channels"),
                     ("patch_size", "patch_size"),
                     ("joint_attention_dim", "context_dim"),
                     ("pooled_projection_dim", "pooled_dim"),
                     ("pos_embed_max_size", "pos_embed_max_size")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    if "dual_attention_layers" in cfg:
        out["dual_attention_layers"] = tuple(int(i) for i in cfg["dual_attention_layers"])
    if "qk_norm" in cfg:
        out["qk_norm"] = bool(cfg["qk_norm"])
    if "out_channels" not in out and "in_channels" in out:
        out["out_channels"] = out["in_channels"]
    return out


def flux_transformer_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers ``FluxTransformer2DModel`` (and the Qwen-Image /
    FLUX.2 variants that keep its key names) config.json → FluxConfig
    overrides. Only keys present apply, so partial configs are safe."""
    out: Dict[str, Any] = {}
    if "num_layers" in cfg:
        out["num_double_blocks"] = int(cfg["num_layers"])
    if "num_single_layers" in cfg:
        out["num_single_blocks"] = int(cfg["num_single_layers"])
    if "num_attention_heads" in cfg:
        out["num_heads"] = int(cfg["num_attention_heads"])
        if "attention_head_dim" in cfg:
            out["hidden_dim"] = int(cfg["num_attention_heads"]) * int(cfg["attention_head_dim"])
    if cfg.get("in_channels") is not None:
        out["in_channels"] = int(cfg["in_channels"])
    if cfg.get("joint_attention_dim") is not None:
        out["context_dim"] = int(cfg["joint_attention_dim"])
    if cfg.get("pooled_projection_dim") is not None:
        out["pooled_dim"] = int(cfg["pooled_projection_dim"])
    if "guidance_embeds" in cfg:
        out["guidance_embeds"] = bool(cfg["guidance_embeds"])
    if "axes_dims_rope" in cfg:
        out["axes_dim"] = tuple(int(d) for d in cfg["axes_dims_rope"])
    return out


def wan_transformer_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers ``WanTransformer3DModel`` config.json → WanConfig overrides."""
    out: Dict[str, Any] = {}
    for src, dst in (("dim", "hidden_dim"), ("ffn_dim", "ffn_dim"),
                     ("num_heads", "num_heads"), ("num_layers", "num_layers"),
                     ("in_channels", "in_channels"), ("out_channels", "out_channels"),
                     ("text_dim", "context_dim"), ("freq_dim", "freq_dim"),
                     ("image_dim", "image_context_dim")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    if "patch_size" in cfg:
        out["patch_size"] = tuple(int(p) for p in cfg["patch_size"])
    if "qk_norm" in cfg:
        out["qk_norm"] = bool(cfg["qk_norm"])
    return out


def ltx2_transformer_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers LTX-Video/LTX-2 transformer config.json → LTX2Config
    overrides. Video keys follow ``LTXVideoTransformer3DModel`` spellings
    (num_layers / num_attention_heads / attention_head_dim /
    cross_attention_dim / in_channels); audio-side keys are accepted under
    the plausible ``audio_*`` spellings — best-effort pending real
    checkpoints, like the transformer key map."""
    out: Dict[str, Any] = {}
    if "num_layers" in cfg:
        out["num_layers"] = int(cfg["num_layers"])
    if "num_attention_heads" in cfg:
        out["num_heads"] = int(cfg["num_attention_heads"])
        if "attention_head_dim" in cfg:
            out["hidden_dim"] = int(cfg["num_attention_heads"]) * int(cfg["attention_head_dim"])
    # NOTE: no cross_attention_dim mapping — our context_dim is the text
    # encoder's hidden size (the connectors are in-transformer and consume
    # LM embeddings directly); the adapter reconciles it from the LM config
    if cfg.get("in_channels") is not None:
        out["video_channels"] = int(cfg["in_channels"])
    for src in ("audio_in_channels", "audio_channels"):
        if cfg.get(src) is not None:
            out["audio_channels"] = int(cfg[src])
            break
    if cfg.get("ffn_dim") is not None:
        out["ffn_dim"] = int(cfg["ffn_dim"])
    if cfg.get("rope_theta") is not None:
        out["rope_theta"] = float(cfg["rope_theta"])
    if cfg.get("rms_norm_eps") is not None:
        out["rms_eps"] = float(cfg["rms_norm_eps"])
    return out


def z_image_transformer_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Z-Image (S3-DiT) transformer config.json → ZImageConfig overrides.

    Accepts both diffusers-style (num_layers / num_attention_heads /
    attention_head_dim / joint_attention_dim) and Lumina-style
    (hidden_size / n_layers / n_heads / cap_feat_dim) spellings —
    best-effort pending real checkpoints. ``in_channels`` is the UNPACKED
    latent channel count upstream; ours is packed, so it scales by
    ``patch_size²`` when a patch_size is declared."""
    out: Dict[str, Any] = {}
    layers = cfg.get("num_layers", cfg.get("n_layers"))
    if layers is not None:
        out["num_layers"] = int(layers)
    heads = cfg.get("num_attention_heads", cfg.get("n_heads"))
    if heads is not None:
        out["num_heads"] = int(heads)
    hidden = cfg.get("hidden_size", cfg.get("dim"))
    if hidden is not None:
        out["hidden_dim"] = int(hidden)
    elif heads is not None and cfg.get("attention_head_dim") is not None:
        out["hidden_dim"] = int(heads) * int(cfg["attention_head_dim"])
    ctx = cfg.get("cap_feat_dim", cfg.get("joint_attention_dim"))
    if ctx is not None:
        out["context_dim"] = int(ctx)
    if cfg.get("in_channels") is not None:
        p = int(cfg.get("patch_size") or 1)
        out["in_channels"] = int(cfg["in_channels"]) * p * p
    axes = cfg.get("axes_dim_rope", cfg.get("axes_dims_rope"))
    if axes is not None:
        out["axes_dim"] = tuple(int(d) for d in axes)
    if cfg.get("ffn_dim") is not None:
        out["ffn_dim"] = int(cfg["ffn_dim"])
    if cfg.get("rope_theta") is not None:
        out["rope_theta"] = float(cfg["rope_theta"])
    if cfg.get("rms_norm_eps") is not None:
        out["rms_eps"] = float(cfg["rms_norm_eps"])
    return out


def ltx2_audio_vae_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """LTX-2 audio VAE config.json → our AudioVAEConfig overrides. The
    reference reads ``audio_vae.config.mel_bins`` (``ltx2_t2av.py:569``);
    the remaining spellings are best-effort."""
    out: Dict[str, Any] = {}
    for src, dst in (("latent_channels", "latent_channels"),
                     ("mel_bins", "n_mels"), ("n_mels", "n_mels"),
                     ("sampling_rate", "sample_rate"), ("sample_rate", "sample_rate"),
                     ("hop_length", "hop"), ("n_fft", "n_fft"),
                     ("base_channels", "base_channels")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    return out


def clip_text_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """transformers ``CLIPTextConfig`` config.json → our CLIPTextConfig."""
    out: Dict[str, Any] = {}
    for src, dst in (("vocab_size", "vocab_size"), ("hidden_size", "hidden_dim"),
                     ("num_hidden_layers", "num_layers"),
                     ("num_attention_heads", "num_heads"),
                     ("max_position_embeddings", "max_positions"),
                     ("projection_dim", "projection_dim"),
                     ("eos_token_id", "eos_token_id")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    if cfg.get("hidden_act"):
        out["hidden_act"] = str(cfg["hidden_act"])
    if cfg.get("layer_norm_eps") is not None:
        out["layer_norm_eps"] = float(cfg["layer_norm_eps"])
    return out


def t5_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """transformers ``T5Config``/``UMT5Config`` config.json → our T5Config."""
    out: Dict[str, Any] = {}
    for src, dst in (("vocab_size", "vocab_size"), ("d_model", "hidden_dim"),
                     ("d_ff", "ff_dim"), ("num_layers", "num_layers"),
                     ("num_heads", "num_heads"), ("d_kv", "head_dim"),
                     ("relative_attention_num_buckets", "rel_pos_buckets"),
                     ("relative_attention_max_distance", "rel_pos_max_distance")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    if str(cfg.get("model_type", "")) == "umt5":
        out["per_layer_rel_bias"] = True
    return out


def lm_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """transformers causal-LM config.json (Llama/Mistral/Qwen2/Gemma layout)
    → our LMConfig. Qwen2.x is detected by ``model_type`` for attn biases."""
    out: Dict[str, Any] = {}
    for src, dst in (("vocab_size", "vocab_size"), ("hidden_size", "hidden_dim"),
                     ("num_hidden_layers", "num_layers"),
                     ("num_attention_heads", "num_heads"),
                     ("num_key_value_heads", "num_kv_heads"),
                     ("head_dim", "head_dim"),
                     ("intermediate_size", "mlp_dim")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    if cfg.get("rope_theta") is not None:
        out["rope_theta"] = float(cfg["rope_theta"])
    if cfg.get("rms_norm_eps") is not None:
        out["rms_eps"] = float(cfg["rms_norm_eps"])
    if "head_dim" not in out and {"hidden_size", "num_attention_heads"} <= cfg.keys():
        out["head_dim"] = int(cfg["hidden_size"]) // int(cfg["num_attention_heads"])
    mt = str(cfg.get("model_type", ""))
    if mt.startswith("qwen2"):
        out["attn_bias"] = True
    elif mt:
        out["attn_bias"] = bool(cfg.get("attention_bias", False))
    if mt.startswith("gemma3"):
        out["arch"] = "gemma3"
        if cfg.get("query_pre_attn_scalar") is not None:
            out["query_pre_attn_scalar"] = float(cfg["query_pre_attn_scalar"])
        if cfg.get("sliding_window") is not None:
            out["sliding_window"] = int(cfg["sliding_window"])
        if cfg.get("sliding_window_pattern") is not None:
            out["sliding_window_pattern"] = int(cfg["sliding_window_pattern"])
        if cfg.get("rope_local_base_freq") is not None:
            out["rope_local_theta"] = float(cfg["rope_local_base_freq"])
        rs = cfg.get("rope_scaling") or {}
        if rs.get("factor") is not None:
            out["rope_scaling_factor"] = float(rs["factor"])
        lt = cfg.get("layer_types")
        if lt:
            # HF layer_types is authoritative; our LMConfig expresses the
            # regular interleave (sliding unless (i+1) % pattern == 0)
            fulls = [i for i, t in enumerate(lt) if t == "full_attention"]
            if not fulls:
                out["sliding_window_pattern"] = len(lt) + 1  # all sliding
            else:
                p = fulls[0] + 1
                if fulls == [i for i in range(len(lt)) if (i + 1) % p == 0]:
                    out["sliding_window_pattern"] = p
                else:
                    logger.warning(
                        "gemma3 layer_types is not a regular interleave; "
                        "keeping the (i+1) %% %d default — attention masks "
                        "may diverge from the checkpoint",
                        out.get("sliding_window_pattern", 6))
    return out


def image_vae_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers ``AutoencoderKL`` config.json → our image VAEConfig."""
    out: Dict[str, Any] = {}
    if cfg.get("block_out_channels"):
        blocks = [int(b) for b in cfg["block_out_channels"]]
        out["base_channels"] = blocks[0]
        out["channel_mults"] = tuple(b // blocks[0] for b in blocks)
    for src, dst in (("in_channels", "in_channels"),
                     ("latent_channels", "latent_channels"),
                     ("layers_per_block", "layers_per_block")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    for src, dst in (("scaling_factor", "scaling_factor"),
                     ("shift_factor", "shift_factor")):
        if cfg.get(src) is not None:
            out[dst] = float(cfg[src])
    if "mid_block_add_attention" in cfg:
        out["use_mid_attention"] = bool(cfg["mid_block_add_attention"])
    return out


def wan_vae_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers ``AutoencoderKLWan`` config.json → our VideoVAEConfig
    overrides (graph geometry + per-channel latent normalization), so a
    real checkpoint directory self-configures the VAE."""
    out: Dict[str, Any] = {}
    if "base_dim" in cfg:
        out["base_channels"] = int(cfg["base_dim"])
    if "z_dim" in cfg:
        out["latent_channels"] = int(cfg["z_dim"])
    if "dim_mult" in cfg:
        out["channel_mults"] = tuple(int(m) for m in cfg["dim_mult"])
    if "num_res_blocks" in cfg:
        out["layers_per_block"] = int(cfg["num_res_blocks"])
    if "attn_scales" in cfg:
        out["attn_scales"] = tuple(float(s) for s in cfg["attn_scales"])
    if "temperal_downsample" in cfg:  # upstream spelling
        out["temporal_down"] = 2 ** sum(bool(b) for b in cfg["temperal_downsample"])
    if cfg.get("patch_size"):
        out["spatial_patch"] = int(cfg["patch_size"])
    if "is_residual" in cfg:
        out["resample_residual"] = bool(cfg["is_residual"])
    if cfg.get("latents_mean") is not None:
        out["latents_mean"] = tuple(float(v) for v in cfg["latents_mean"])
    if cfg.get("latents_std") is not None:
        out["latents_std"] = tuple(float(v) for v in cfg["latents_std"])
    return out


def ltx_video_vae_overrides_from_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """diffusers ``AutoencoderKLLTXVideo`` config.json → our
    LTXVideoVAEConfig overrides. Decoder-side lists are stored in ENCODER
    orientation upstream (the torch decoder reverses them internally); we
    store them in decoder forward order, so they reverse here."""
    out: Dict[str, Any] = {}
    for src, dst in (("in_channels", "in_channels"), ("out_channels", "out_channels"),
                     ("latent_channels", "latent_channels"),
                     ("patch_size", "patch_size"), ("patch_size_t", "patch_size_t")):
        if cfg.get(src) is not None:
            out[dst] = int(cfg[src])
    if cfg.get("block_out_channels"):
        out["block_out_channels"] = tuple(int(c) for c in cfg["block_out_channels"])
    if cfg.get("decoder_block_out_channels"):
        out["decoder_block_out_channels"] = tuple(
            int(c) for c in reversed(cfg["decoder_block_out_channels"]))
    if cfg.get("layers_per_block"):
        out["layers_per_block"] = tuple(int(n) for n in cfg["layers_per_block"])
    if cfg.get("decoder_layers_per_block"):
        out["decoder_layers_per_block"] = tuple(int(n) for n in cfg["decoder_layers_per_block"])
    if cfg.get("spatio_temporal_scaling"):
        out["spatio_temporal_scaling"] = tuple(bool(b) for b in cfg["spatio_temporal_scaling"])
    if cfg.get("decoder_spatio_temporal_scaling"):
        out["decoder_spatio_temporal_scaling"] = tuple(
            bool(b) for b in reversed(cfg["decoder_spatio_temporal_scaling"]))
    if cfg.get("decoder_inject_noise"):
        out["decoder_inject_noise"] = tuple(
            bool(b) for b in reversed(cfg["decoder_inject_noise"]))
    if cfg.get("upsample_residual"):
        out["upsample_residual"] = tuple(bool(b) for b in reversed(cfg["upsample_residual"]))
    if cfg.get("upsample_factor"):
        out["upsample_factor"] = tuple(int(f) for f in reversed(cfg["upsample_factor"]))
    if "timestep_conditioning" in cfg:
        out["timestep_conditioning"] = bool(cfg["timestep_conditioning"])
    if "encoder_causal" in cfg:
        out["encoder_causal"] = bool(cfg["encoder_causal"])
    if "decoder_causal" in cfg:
        out["decoder_causal"] = bool(cfg["decoder_causal"])
    if cfg.get("resnet_norm_eps") is not None:
        out["resnet_norm_eps"] = float(cfg["resnet_norm_eps"])
    if cfg.get("scaling_factor") is not None:
        out["scaling_factor"] = float(cfg["scaling_factor"])
    if cfg.get("latents_mean") is not None:
        out["latents_mean"] = tuple(float(v) for v in cfg["latents_mean"])
    if cfg.get("latents_std") is not None:
        out["latents_std"] = tuple(float(v) for v in cfg["latents_std"])
    return out


def ltx_video_vae_key_map(cfg) -> Tuple[Dict[str, str], Dict[str, str]]:
    """diffusers ``AutoencoderKLLTXVideo`` module path → our
    ``ltx2/video_vae.py`` param path. Returns ``(key_map, raw_map)``.

    Covered: causal-conv leaves (bare ``.conv`` scopes both sides), the
    per-stage ``conv_out``/``conv_in`` channel-change resnets, stride-(2,2,2)
    ``downsamplers.0`` and pixel-shuffle ``upsamplers.0`` convs, per-resnet
    ``scale_shift_table`` AdaLN tables and ``per_channel_scale1/2`` noise
    amplitudes (raw copies), the decoder-level ``scale_shift_table`` and
    ``timestep_scale_multiplier``, and the time-embedder MLPs. Norms are
    parameter-free upstream (``elementwise_affine=False``) and contribute no
    keys. Time-embedder Linears upstream live under
    ``time_embedder.emb.timestep_embedder.linear_{1,2}`` (PixArt-α combined
    embedder) — spelled here as documented best-effort. ``latents_mean/std``
    state-dict buffers are NOT params here; pop them with
    :func:`pop_ltx_vae_latent_stats` and apply as config overrides.
    """
    m: Dict[str, str] = {}
    raw: Dict[str, str] = {}

    def causal(src: str, dst: str) -> None:
        m[src] = f"{dst}/conv"

    def resblock(src: str, dst: str, shortcut: bool, cond: bool = False,
                 noise: bool = False) -> None:
        causal(f"{src}.conv1", f"{dst}/conv1")
        causal(f"{src}.conv2", f"{dst}/conv2")
        if shortcut:
            causal(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")
        if cond:
            raw[f"{src}.scale_shift_table"] = f"{dst}/scale_shift_table"
        if noise:
            raw[f"{src}.per_channel_scale1"] = f"{dst}/per_channel_scale1"
            raw[f"{src}.per_channel_scale2"] = f"{dst}/per_channel_scale2"

    def time_embedder(src: str, dst: str) -> None:
        m[f"{src}.emb.timestep_embedder.linear_1"] = f"{dst}/linear_1"
        m[f"{src}.emb.timestep_embedder.linear_2"] = f"{dst}/linear_2"

    blocks = cfg.block_out_channels
    causal("encoder.conv_in", "encoder/conv_in")
    causal("encoder.conv_out", "encoder/conv_out")
    for i in range(len(blocks)):
        out_ch = blocks[i + 1] if i + 1 < len(blocks) else blocks[i]
        st, dst = f"encoder.down_blocks.{i}", f"encoder/down_blocks_{i}"
        for j in range(cfg.layers_per_block[i]):
            resblock(f"{st}.resnets.{j}", f"{dst}/resnets_{j}", shortcut=False)
        if cfg.spatio_temporal_scaling[i]:
            causal(f"{st}.downsamplers.0", f"{dst}/downsampler")
        if out_ch != blocks[i]:
            resblock(f"{st}.conv_out", f"{dst}/conv_out", shortcut=True)
    for j in range(cfg.layers_per_block[-1]):
        resblock(f"encoder.mid_block.resnets.{j}",
                 f"encoder/mid_block/resnets_{j}", shortcut=False)

    dblocks = cfg.decoder_block_out_channels
    cond = cfg.timestep_conditioning
    causal("decoder.conv_in", "decoder/conv_in")
    causal("decoder.conv_out", "decoder/conv_out")
    for j in range(cfg.decoder_layers_per_block[0]):
        resblock(f"decoder.mid_block.resnets.{j}",
                 f"decoder/mid_block/resnets_{j}", shortcut=False, cond=cond)
    if cond:
        time_embedder("decoder.mid_block.time_embedder", "decoder/mid_block/time_embedder")
        time_embedder("decoder.time_embedder", "decoder/time_embedder")
        raw["decoder.scale_shift_table"] = "decoder/scale_shift_table"
        raw["decoder.timestep_scale_multiplier"] = "decoder/timestep_scale_multiplier"
    width = dblocks[0]
    for i in range(len(dblocks)):
        out_ch = dblocks[i + 1] if i + 1 < len(dblocks) else dblocks[i]
        st, dst = f"decoder.up_blocks.{i}", f"decoder/up_blocks_{i}"
        scale = cfg.decoder_spatio_temporal_scaling[i]
        mid_ch = out_ch * cfg.upsample_factor[i] if scale else out_ch
        if width != mid_ch:
            resblock(f"{st}.conv_in", f"{dst}/conv_in", shortcut=True, cond=False)
        if scale:
            causal(f"{st}.upsamplers.0", f"{dst}/upsampler/conv")
        if cond:
            time_embedder(f"{st}.time_embedder", f"{dst}/time_embedder")
        n = (cfg.decoder_layers_per_block[i + 1]
             if i + 1 < len(cfg.decoder_layers_per_block)
             else cfg.decoder_layers_per_block[-1])
        for j in range(n):
            resblock(f"{st}.resnets.{j}", f"{dst}/resnets_{j}", shortcut=False,
                     cond=cond, noise=cfg.decoder_inject_noise[i])
        width = out_ch
    return m, raw


def pop_ltx_vae_latent_stats(
    state_dict: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], Optional[Tuple[float, ...]], Optional[Tuple[float, ...]]]:
    """Pop the ``latents_mean``/``latents_std`` buffers an LTX VAE checkpoint
    stores in its state dict (they are config on our side, not params)."""
    mean = state_dict.pop("latents_mean", None)
    std = state_dict.pop("latents_std", None)
    to_t = lambda v: tuple(float(x) for x in np.asarray(v).reshape(-1)) if v is not None else None
    return state_dict, to_t(mean), to_t(std)


def fuse_weight_norm(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fuse torch ``weight_norm`` parameter pairs: ``w = g · v / ||v||``
    (norm over all dims except the out-channel dim 0). HiFi-GAN vocoders
    ship every conv this way; our flax modules hold the fused kernel."""
    out: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if k.endswith(".weight_g"):
            base = k[: -len(".weight_g")]
            wv = np.asarray(state_dict[base + ".weight_v"], np.float32)
            g = np.asarray(v, np.float32)
            axes = tuple(range(1, wv.ndim))
            norm = np.sqrt(np.sum(np.square(wv), axis=axes, keepdims=True))
            out[base + ".weight"] = (g * wv / np.maximum(norm, 1e-12)).astype(wv.dtype)
        elif k.endswith(".weight_v"):
            continue
        else:
            out[k] = v
    return out


def hifigan_vocoder_key_map(cfg, prefix: str = "") -> Dict[str, str]:
    """Public HiFi-GAN ``Generator`` module path → our ``Vocoder`` param
    path (nested under the AudioVAE's ``vocoder`` scope). ``prefix``
    handles checkpoints whose keys lead with ``generator.`` — strip or
    pass it through. Run :func:`fuse_weight_norm` on the state dict first.
    ConvTranspose weights are (in, out, k) upstream: pre-swap the leading
    axes in a preprocess (the generic rank-3 handler assumes (out, in, k));
    the flip convention is pinned when real weights exist."""
    from ..models.ltx2.audio import vocoder_upsample_rates

    m: Dict[str, str] = {}
    m[f"{prefix}conv_pre"] = "vocoder/conv_pre"
    m[f"{prefix}conv_post"] = "vocoder/conv_post"
    rates = vocoder_upsample_rates(cfg.hop)
    nk = len(cfg.resblock_kernels)
    for i in range(len(rates)):
        m[f"{prefix}ups.{i}"] = f"vocoder/ups_{i}"
        for r in range(nk):
            flat = i * nk + r
            for j in range(len(cfg.resblock_dilations)):
                m[f"{prefix}resblocks.{flat}.convs1.{j}"] = f"vocoder/resblocks_{i}_{r}/convs1_{j}"
                m[f"{prefix}resblocks.{flat}.convs2.{j}"] = f"vocoder/resblocks_{i}_{r}/convs2_{j}"
    return m


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Merge every ``*.safetensors`` file in a directory into one state dict
    (diffusers shards a component across multiple files with an index)."""
    import glob as _glob
    import os as _os

    from safetensors.numpy import load_file

    out: Dict[str, np.ndarray] = {}
    for f in sorted(_glob.glob(_os.path.join(path, "*.safetensors"))):
        out.update(load_file(f))
    return out


def z_image_transformer_key_map(num_layers: int) -> Dict[str, str]:
    """Upstream Z-Image (S3-DiT) module path → our param path.

    The per-block Linear layout (attention.{to_q,to_k,to_v,to_out.0} +
    feed_forward.{w1,w2,w3} SwiGLU) is VERIFIED against the reference's
    ``default_target_modules`` (``src/flow_factory/models/z_image/
    z_image.py:70-75``). Norm/adaLN/embedder spellings follow the NextDiT
    family conventions Z-Image derives from and are best-effort pending
    real weights (PARITY.md gap 1).
    """
    m: Dict[str, str] = {
        "x_embedder": "x_embedder",
        "cap_embedder.0": "cap_norm",
        "cap_embedder.1": "cap_embedder",
        "t_embedder.mlp.0": "t_embedder/linear_1",
        "t_embedder.mlp.2": "t_embedder/linear_2",
        "final_layer.adaLN_modulation.1": "final_adaLN",
        "final_layer.linear": "final_linear",
    }
    for i in range(num_layers):
        b, o = f"layers.{i}", f"layer_{i}"
        m[f"{b}.attention.to_q"] = f"{o}/to_q"
        m[f"{b}.attention.to_k"] = f"{o}/to_k"
        m[f"{b}.attention.to_v"] = f"{o}/to_v"
        m[f"{b}.attention.to_out.0"] = f"{o}/to_out"
        m[f"{b}.attention.norm_q"] = f"{o}/qk_norm/q_norm"
        m[f"{b}.attention.norm_k"] = f"{o}/qk_norm/k_norm"
        m[f"{b}.feed_forward.w1"] = f"{o}/w1"
        m[f"{b}.feed_forward.w2"] = f"{o}/w2"
        m[f"{b}.feed_forward.w3"] = f"{o}/w3"
        m[f"{b}.attention_norm1"] = f"{o}/attention_norm1"
        m[f"{b}.attention_norm2"] = f"{o}/attention_norm2"
        m[f"{b}.ffn_norm1"] = f"{o}/ffn_norm1"
        m[f"{b}.ffn_norm2"] = f"{o}/ffn_norm2"
        m[f"{b}.adaLN_modulation.1"] = f"{o}/adaLN_modulation"
    return m


def wan_vae_key_map(
    channel_mults: Tuple[int, ...],
    layers_per_block: int,
    temporal_down: int = 4,
    attn_scales: Tuple[float, ...] = (),
    base_channels: int = 96,
    residual: bool = False,
) -> Tuple[Dict[str, str], Dict[str, str]]:
    """diffusers ``AutoencoderKLWan`` module path → our ``wan/video_vae.py``.

    Mirrors the upstream flat ``down_blocks``/``up_blocks`` ModuleList
    indexing (resblocks, optional attention at configured scales, resample
    per stage), the ``mid_block.resnets.{0,1}/attentions.0`` mid block, the
    ``resample.1`` spatial conv inside each WanResample, per-norm ``gamma``
    parameters (raw copies), and the quant convs. ``WanCausalConv3d`` leaves
    are bare convs upstream but nested ``.../conv`` scopes here. Shortcut
    convs exist only where a residual block changes width. Returns
    ``(key_map, raw_map)``.
    """
    n_spatial = len(channel_mults) - 1
    n_temporal = {1: 0, 2: 1, 4: 2}[temporal_down]
    t_flags = tuple(i >= n_spatial - n_temporal for i in range(n_spatial))

    m: Dict[str, str] = {}
    raw: Dict[str, str] = {}

    def causal(src: str, dst: str) -> None:
        m[src] = f"{dst}/conv"

    def resblock(src: str, dst: str, shortcut: bool) -> None:
        raw[f"{src}.norm1.gamma"] = f"{dst}/norm1/gamma"
        raw[f"{src}.norm2.gamma"] = f"{dst}/norm2/gamma"
        causal(f"{src}.conv1", f"{dst}/conv1")
        causal(f"{src}.conv2", f"{dst}/conv2")
        if shortcut:
            causal(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")

    def attnblock(src: str, dst: str) -> None:
        raw[f"{src}.norm.gamma"] = f"{dst}/norm/gamma"
        m[f"{src}.to_qkv"] = f"{dst}/to_qkv"
        m[f"{src}.proj"] = f"{dst}/proj"

    for side in ("encoder", "decoder"):
        causal(f"{side}.conv_in", f"{side}/conv_in")
        causal(f"{side}.conv_out", f"{side}/conv_out")
        raw[f"{side}.norm_out.gamma"] = f"{side}/norm_out/gamma"
        resblock(f"{side}.mid_block.resnets.0", f"{side}/mid_block/resnets_0", False)
        resblock(f"{side}.mid_block.resnets.1", f"{side}/mid_block/resnets_1", False)
        attnblock(f"{side}.mid_block.attentions.0", f"{side}/mid_block/attentions_0")
    causal("quant_conv", "quant_conv")
    causal("post_quant_conv", "post_quant_conv")

    if residual:
        # Wan 2.2 graph: one residual stage per mult, nested scopes; the
        # avg/dup shortcuts are param-free
        prev = base_channels
        for i, mult in enumerate(channel_mults):
            ch = base_channels * mult
            st = f"encoder.down_blocks.{i}"
            dst = f"encoder/down_blocks_{i}"
            for j in range(layers_per_block):
                resblock(f"{st}.resnets.{j}", f"{dst}/resnets_{j}",
                         shortcut=(j == 0 and prev != ch))
            prev = ch
            if i < n_spatial:
                m[f"{st}.downsampler.resample.1"] = f"{dst}/downsampler/resample_1"
                if t_flags[i]:
                    causal(f"{st}.downsampler.time_conv", f"{dst}/downsampler/time_conv")
        mults = tuple(reversed(channel_mults))
        up_flags = tuple(reversed(t_flags))
        prev = base_channels * mults[0]
        for i, mult in enumerate(mults):
            ch = base_channels * mult
            st = f"decoder.up_blocks.{i}"
            dst = f"decoder/up_blocks_{i}"
            for j in range(layers_per_block + 1):
                resblock(f"{st}.resnets.{j}", f"{dst}/resnets_{j}",
                         shortcut=(j == 0 and prev != ch))
            if i < n_spatial:
                m[f"{st}.upsampler.resample.1"] = f"{dst}/upsampler/resample_1"
                if up_flags[i]:
                    causal(f"{st}.upsampler.time_conv", f"{dst}/upsampler/time_conv")
                prev = ch // 2
            else:
                prev = ch
        return m, raw

    # encoder stages
    idx, scale, prev = 0, 1.0, base_channels
    for i, mult in enumerate(channel_mults):
        ch = base_channels * mult
        for _ in range(layers_per_block):
            resblock(f"encoder.down_blocks.{idx}", f"encoder/down_blocks_{idx}",
                     shortcut=prev != ch)
            prev = ch
            idx += 1
            if scale in attn_scales:
                attnblock(f"encoder.down_blocks.{idx}", f"encoder/down_blocks_{idx}")
                idx += 1
        if i < n_spatial:
            m[f"encoder.down_blocks.{idx}.resample.1"] = f"encoder/down_blocks_{idx}/resample_1"
            if t_flags[i]:
                causal(f"encoder.down_blocks.{idx}.time_conv",
                       f"encoder/down_blocks_{idx}/time_conv")
            idx += 1
            scale /= 2.0

    # decoder stages (reversed mults; upsample halves width, so the next
    # stage's first resblock sees prev//2 input channels)
    mults = tuple(reversed(channel_mults))
    up_flags = tuple(reversed(t_flags))
    idx, scale, prev = 0, 1.0 / (2 ** n_spatial), base_channels * mults[0]
    for i, mult in enumerate(mults):
        ch = base_channels * mult
        for _ in range(layers_per_block + 1):
            resblock(f"decoder.up_blocks.{idx}", f"decoder/up_blocks_{idx}",
                     shortcut=prev != ch)
            prev = ch
            idx += 1
            if scale in attn_scales:
                attnblock(f"decoder.up_blocks.{idx}", f"decoder/up_blocks_{idx}")
                idx += 1
        if i < n_spatial:
            m[f"decoder.up_blocks.{idx}.resample.1"] = f"decoder/up_blocks_{idx}/resample_1"
            if up_flags[i]:
                causal(f"decoder.up_blocks.{idx}.time_conv",
                       f"decoder/up_blocks_{idx}/time_conv")
            idx += 1
            scale *= 2.0
            prev = ch // 2
    return m, raw


def clip_text_encoder_key_map(num_layers: int) -> Tuple[Dict[str, str], Dict[str, str]]:
    """transformers ``CLIPTextModel(WithProjection)`` → our ``CLIPTextEncoder``.

    Embeddings ride ``raw_map`` (torch ``nn.Embedding`` weights are (vocab,
    dim) — same layout as flax ``Embed``; the generic 2-D-weight transpose
    must not apply).
    """
    m: Dict[str, str] = {
        "text_model.final_layer_norm": "final_ln",
        "text_projection": "text_projection",
    }
    raw: Dict[str, str] = {
        "text_model.embeddings.token_embedding.weight": "token_embedding/embedding",
        "text_model.embeddings.position_embedding.weight": "position_embedding",
    }
    for i in range(num_layers):
        b, o = f"text_model.encoder.layers.{i}", f"layer_{i}"
        m[f"{b}.layer_norm1"] = f"{o}/ln1"
        m[f"{b}.layer_norm2"] = f"{o}/ln2"
        m[f"{b}.self_attn.q_proj"] = f"{o}/q_proj"
        m[f"{b}.self_attn.k_proj"] = f"{o}/k_proj"
        m[f"{b}.self_attn.v_proj"] = f"{o}/v_proj"
        m[f"{b}.self_attn.out_proj"] = f"{o}/out_proj"
        m[f"{b}.mlp.fc1"] = f"{o}/fc1"
        m[f"{b}.mlp.fc2"] = f"{o}/fc2"
    return m, raw


def t5_encoder_key_map(
    num_layers: int, per_layer_rel_bias: bool = False
) -> Tuple[Dict[str, str], Dict[str, str]]:
    """transformers ``T5EncoderModel``/``UMT5EncoderModel`` → our ``T5Encoder``.

    T5's layer norms are bare scale parameters our modules also call
    ``weight`` — they and the embeddings ride ``raw_map`` verbatim.
    ``per_layer_rel_bias`` selects the UMT5 layout (every block owns a
    relative-attention bias table; Wan's text encoder).
    """
    m: Dict[str, str] = {}
    raw: Dict[str, str] = {
        "shared.weight": "token_embedding/embedding",
        "encoder.final_layer_norm.weight": "final_ln/weight",
    }
    bias_layers = range(num_layers) if per_layer_rel_bias else (0,)
    for i in bias_layers:
        raw[f"encoder.block.{i}.layer.0.SelfAttention.relative_attention_bias.weight"] = (
            f"block_{i}/attn/rel_bias"
        )
    for i in range(num_layers):
        b, o = f"encoder.block.{i}", f"block_{i}"
        raw[f"{b}.layer.0.layer_norm.weight"] = f"{o}/ln1/weight"
        raw[f"{b}.layer.1.layer_norm.weight"] = f"{o}/ln2/weight"
        m[f"{b}.layer.0.SelfAttention.q"] = f"{o}/attn/q"
        m[f"{b}.layer.0.SelfAttention.k"] = f"{o}/attn/k"
        m[f"{b}.layer.0.SelfAttention.v"] = f"{o}/attn/v"
        m[f"{b}.layer.0.SelfAttention.o"] = f"{o}/attn/o"
        m[f"{b}.layer.1.DenseReluDense.wi_0"] = f"{o}/wi_0"
        m[f"{b}.layer.1.DenseReluDense.wi_1"] = f"{o}/wi_1"
        m[f"{b}.layer.1.DenseReluDense.wo"] = f"{o}/wo"
    return m, raw


def lm_decoder_key_map(
    num_layers: int, gemma: bool = False
) -> Tuple[Dict[str, str], Dict[str, str]]:
    """transformers causal-LM (Llama/Mistral/Qwen2/Gemma3 layout) → our
    ``LMEncoder``.

    Covers both the no-bias layout (Mistral/Gemma) and Qwen2.x's q/k/v
    biases (present when the config sets ``attn_bias=True``; extra bias keys
    for a no-bias config are skipped with a warning). ``gemma=True`` maps
    the Gemma3 sandwich norms — there ``post_attention_layernorm`` is the
    norm BEFORE the attention residual add (our ``post_attn_ln``), the MLP
    pre-norm is ``pre_feedforward_layernorm``, and q/k carry per-head
    RMSNorms (HF ``modeling_gemma3.py:Gemma3DecoderLayer``).
    """
    m: Dict[str, str] = {}
    raw: Dict[str, str] = {
        "model.embed_tokens.weight": "token_embedding/embedding",
        "model.norm.weight": "final_ln/weight",
    }
    for i in range(num_layers):
        b, o = f"model.layers.{i}", f"layer_{i}"
        raw[f"{b}.input_layernorm.weight"] = f"{o}/ln1/weight"
        if gemma:
            raw[f"{b}.post_attention_layernorm.weight"] = f"{o}/post_attn_ln/weight"
            raw[f"{b}.pre_feedforward_layernorm.weight"] = f"{o}/ln2/weight"
            raw[f"{b}.post_feedforward_layernorm.weight"] = f"{o}/post_ff_ln/weight"
            raw[f"{b}.self_attn.q_norm.weight"] = f"{o}/q_norm/weight"
            raw[f"{b}.self_attn.k_norm.weight"] = f"{o}/k_norm/weight"
        else:
            raw[f"{b}.post_attention_layernorm.weight"] = f"{o}/ln2/weight"
        m[f"{b}.self_attn.q_proj"] = f"{o}/q"
        m[f"{b}.self_attn.k_proj"] = f"{o}/k"
        m[f"{b}.self_attn.v_proj"] = f"{o}/v"
        m[f"{b}.self_attn.o_proj"] = f"{o}/o"
        m[f"{b}.mlp.gate_proj"] = f"{o}/gate"
        m[f"{b}.mlp.up_proj"] = f"{o}/up"
        m[f"{b}.mlp.down_proj"] = f"{o}/down"
    return m, raw


def vae_key_map(channel_mults: Tuple[int, ...], layers_per_block: int,
                mid_attention: bool = True) -> Dict[str, str]:
    """diffusers ``AutoencoderKL`` → our ``models/vae.py`` tree.

    Covers the SD3/FLUX VAE variant (``use_quant_conv=False``); resnet,
    downsampler/upsampler, and mid-block names map one-to-one.
    """
    m: Dict[str, str] = {
        "encoder.conv_in": "encoder/conv_in",
        "encoder.conv_norm_out": "encoder/norm_out",
        "encoder.conv_out": "encoder/conv_out",
        "decoder.conv_in": "decoder/conv_in",
        "decoder.conv_norm_out": "decoder/norm_out",
        "decoder.conv_out": "decoder/conv_out",
    }

    def resnet(src: str, dst: str, shortcut: bool) -> None:
        # conv_shortcut exists exactly where channels change (both in
        # diffusers ResnetBlock2D and our ResnetBlock) — emitting it
        # unconditionally would leave map targets pointing at nonexistent
        # leaves (test_keymap_completeness.py direction A)
        parts = ("norm1", "conv1", "norm2", "conv2") + (
            ("conv_shortcut",) if shortcut else ())
        for part in parts:
            m[f"{src}.{part}"] = f"{dst}/{part}"

    n = len(channel_mults)
    rmults = tuple(reversed(channel_mults))
    for i in range(n):
        for j in range(layers_per_block):
            # encoder block i maps block_out[i-1] → block_out[i] on its
            # first resnet; later resnets keep channels
            sc = j == 0 and i > 0 and channel_mults[i] != channel_mults[i - 1]
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", f"encoder/down_{i}_res_{j}", sc)
        if i < n - 1:
            m[f"encoder.down_blocks.{i}.downsamplers.0.conv"] = f"encoder/down_{i}_conv"
        for j in range(layers_per_block + 1):
            # decoder up_blocks run deepest→shallowest over reversed mults
            sc = j == 0 and i > 0 and rmults[i] != rmults[i - 1]
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", f"decoder/up_{i}_res_{j}", sc)
        if i < n - 1:
            m[f"decoder.up_blocks.{i}.upsamplers.0.conv"] = f"decoder/up_{i}_conv"
    for side in ("encoder", "decoder"):
        resnet(f"{side}.mid_block.resnets.0", f"{side}/mid_res_1", False)
        resnet(f"{side}.mid_block.resnets.1", f"{side}/mid_res_2", False)
        if mid_attention:
            m[f"{side}.mid_block.attentions.0.group_norm"] = f"{side}/mid_attn/norm"
            m[f"{side}.mid_block.attentions.0.to_q"] = f"{side}/mid_attn/to_q"
            m[f"{side}.mid_block.attentions.0.to_k"] = f"{side}/mid_attn/to_k"
            m[f"{side}.mid_block.attentions.0.to_v"] = f"{side}/mid_attn/to_v"
            m[f"{side}.mid_block.attentions.0.to_out.0"] = f"{side}/mid_attn/to_out"
    return m


def clip_vision_encoder_key_map(num_layers: int) -> Tuple[Dict[str, str], Dict[str, str]]:
    """transformers ``CLIPVisionModel`` → our ``CLIPVisionEncoder``.

    Note transformers' historical ``pre_layrnorm`` spelling. The class and
    position embeddings and patch conv ride the usual rules; blocks share
    the text-block layout.
    """
    m: Dict[str, str] = {
        "vision_model.embeddings.patch_embedding": "patch_embedding",
        "vision_model.pre_layrnorm": "pre_ln",
        "vision_model.post_layernorm": "post_ln",
    }
    raw: Dict[str, str] = {
        "vision_model.embeddings.class_embedding": "class_embedding",
        "vision_model.embeddings.position_embedding.weight": "position_embedding",
    }
    for i in range(num_layers):
        b, o = f"vision_model.encoder.layers.{i}", f"layer_{i}"
        m[f"{b}.layer_norm1"] = f"{o}/ln1"
        m[f"{b}.layer_norm2"] = f"{o}/ln2"
        m[f"{b}.self_attn.q_proj"] = f"{o}/q_proj"
        m[f"{b}.self_attn.k_proj"] = f"{o}/k_proj"
        m[f"{b}.self_attn.v_proj"] = f"{o}/v_proj"
        m[f"{b}.self_attn.out_proj"] = f"{o}/out_proj"
        m[f"{b}.mlp.fc1"] = f"{o}/fc1"
        m[f"{b}.mlp.fc2"] = f"{o}/fc2"
    return m, raw


def qwen_vl_vision_key_map(depth: int) -> Tuple[Dict[str, str], Dict[str, str]]:
    """Qwen2.5-VL ``visual`` tower → our ``VLVisionTower``.

    Upstream layout (public Qwen2.5-VL): conv3d patch embed, fused-qkv
    blocks with RMSNorms, SwiGLU MLP with biases, ``merger`` =
    RMSNorm(ln_q) + 2-layer MLP over 2×2 merge groups. Use with
    :func:`qwen_vl_vision_preprocess` (strips the optional ``model.``
    prefix and flattens the conv3d patch kernel to the Dense layout).
    """
    m: Dict[str, str] = {
        "visual.patch_embed.proj": "patch_embed",
        "visual.merger.mlp.0": "merger_fc1",
        "visual.merger.mlp.2": "merger_fc2",
    }
    raw: Dict[str, str] = {"visual.merger.ln_q.weight": "ln_q/weight"}
    for i in range(depth):
        b, o = f"visual.blocks.{i}", f"block_{i}"
        raw[f"{b}.norm1.weight"] = f"{o}/norm1/weight"
        raw[f"{b}.norm2.weight"] = f"{o}/norm2/weight"
        m[f"{b}.attn.qkv"] = f"{o}/qkv"
        m[f"{b}.attn.proj"] = f"{o}/proj"
        m[f"{b}.mlp.gate_proj"] = f"{o}/gate"
        m[f"{b}.mlp.up_proj"] = f"{o}/up"
        m[f"{b}.mlp.down_proj"] = f"{o}/down"
    return m, raw


def qwen_vl_vision_preprocess(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize a Qwen2.5-VL state dict for the vision key map:

    * strip an optional ``model.`` prefix off ``visual.*`` keys (newer
      transformers nest the tower under ``model.visual``),
    * flatten the conv3d patch-embed kernel (out, C, T, ph, pw) to 2-D
      (out, C·T·ph·pw) so the generic linear rule transposes it onto our
      Dense — the host preprocessor flattens patches in the same
      (C, T, ph, pw) row-major order (``vl_vision.preprocess_vision_image``).
    """
    out = {}
    for k, v in sd.items():
        if k.startswith("model.visual."):
            k = k[len("model."):]
        if k == "visual.patch_embed.proj.weight":
            v = np.asarray(v).reshape(v.shape[0], -1)
        out[k] = v
    return out
