"""Bidirectional key-map ↔ template completeness for EVERY adapter family
(VERDICT r3 Next #4).

The seven "best-effort pending real weights" spellings in
``utils/checkpoint.py`` (FLUX.2 time/guidance embedder, LTX-2 audio
embedders/head tables, LTX/Wan VAE embedders, Z-Image top level) cannot be
validated against upstream here — ``diffusers`` is not installed and the
reference's submodule is empty. What CAN be pinned locally is everything
short of upstream's exact string:

  direction A (map → template): every key-map/raw-map TARGET resolves to a
    real subtree of the adapter's parameter template — a stale or misspelled
    OUR-side path can never silently no-op;
  direction B (template → map): every template leaf is covered by the map —
    a real checkpoint that matches the map fills the whole tree, so strict
    mode's missing/unmatched diagnostics are the ONLY residual risk surface,
    and that surface is exactly upstream's spelling.

Together with ``test_pretrained_import.py`` (strict mode raises on a
misspelled checkpoint) this means a wrong best-effort spelling fails LOUDLY
with the offending key named, never a silent random-init component.
"""
import re

import numpy as np
import pytest

import jax

from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.utils.checkpoint import import_diffusers_params

from test_adapter_families import _cfg
from test_utils_aux import _synth_torch_state_dict

# one representative per adapter class that defines pretrained_component_maps
FAMILIES = [
    "sd3-5",
    "flux1",
    "flux2",
    "flux2-klein",
    "qwen-image",
    "qwen-image-edit-plus",
    "z-image",
    "wan2-t2v",
    "wan2-i2v",
    "ltx2-t2av",
]

#: template leaves a real checkpoint intentionally does NOT provide —
#: each entry documents why. Leaf paths are matched by top-level prefix.
EXPECTED_UNCOVERED = {
    # the text connectors are a separate upstream pipeline component shipped
    # outside the transformer safetensors (reference ltx2_t2av.py encodes
    # them via the connector pipeline, not the transformer state dict)
    ("ltx2-t2av", "transformer"): {"video_connector", "audio_connector"},
    # the mel VAE halves are a documented architectural stand-in (audio.py
    # module docstring): upstream's audio autoencoder graph lives in the
    # diffusers submodule, which is empty here, and the reference itself
    # touches only its config (mel_bins/latents_mean/std) — only the
    # HiFi-GAN vocoder half has a verifiable upstream layout and a map.
    # PARITY.md records this as a known import gap.
    ("ltx2-t2av", "audio_vae"): {"encoder", "decoder"},
}


#: targets that two checkpoint spellings legitimately share, because a
#: state-dict preprocess guarantees at most one fires per real checkpoint
ALLOWED_DUPLICATE_TARGETS = {
    # FLUX.1 single blocks: upstream ships attn.to_q/k/v + proj_mlp
    # separately; fuse_flux_single_block_qkv_mlp concatenates them INTO
    # attn.to_q before mapping, so the proj_mlp alias never co-fires
    ("flux1", "transformer"): re.compile(r"^single_\d+/linear1$"),
}


def _leaf_paths(template):
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    return {
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for path, _ in flat
    }


@pytest.mark.parametrize("model_type", FAMILIES)
def test_keymap_bidirectional_completeness(model_type):
    adapter = load_adapter(_cfg(model_type))
    maps = adapter.pretrained_component_maps()
    assert maps, f"{model_type}: no pretrained import maps declared"

    for comp, spec in maps.items():
        subfolder, key_map, raw_map, _preprocess, *rest = spec
        if comp not in adapter.params:
            continue
        template = adapter.params[comp]
        leaves = _leaf_paths(template)
        label = f"{model_type}/{comp}"

        # ---- direction A: every map target exists in the template -------
        for tk, our in key_map.items():
            ok = any(lp == our or lp.startswith(our + "/") for lp in leaves)
            assert ok, f"{label}: key map target {our!r} (from {tk!r}) not in template"
        for tk, our in (raw_map or {}).items():
            assert our in leaves, f"{label}: raw map target {our!r} (from {tk!r}) not a leaf"

        # no two checkpoint keys may land on the same target (the second
        # import would silently overwrite the first)
        targets = list(key_map.values()) + list((raw_map or {}).values())
        allowed_dup = ALLOWED_DUPLICATE_TARGETS.get((model_type, comp))
        dupes = {
            t for t in targets
            if targets.count(t) > 1 and not (allowed_dup and allowed_dup.match(t))
        }
        assert not dupes, f"{label}: duplicate key-map targets {sorted(dupes)[:4]}"

        # ---- direction B: every template leaf is covered by the map -----
        sd = _synth_torch_state_dict(template, key_map, raw_map=raw_map, seed=31)
        reports: list = []
        import_diffusers_params(
            sd, key_map, template, raw_map=raw_map, report_out=reports,
            component=comp,
        )
        rep = reports[0]
        # every synthesized key consumed: a map entry whose spelling the
        # importer cannot parse back would show up here
        assert not rep.unmatched, f"{label}: unconsumed synthesized keys {rep.unmatched[:6]}"
        allowed = EXPECTED_UNCOVERED.get((model_type, comp), set())
        uncovered = sorted(
            m for m in rep.missing if m.split("/")[0] not in allowed
        )
        assert not uncovered, (
            f"{label}: template leaves NOT covered by the key map "
            f"({len(uncovered)}): {uncovered[:8]}"
        )
        # the allowlist must stay honest: drop entries that became covered
        for top in allowed:
            assert any(m.split("/")[0] == top for m in rep.missing), (
                f"{label}: EXPECTED_UNCOVERED entry {top!r} is now covered — "
                "remove it from the allowlist"
            )
