"""Model adapter registry (reference: ``src/flow_factory/models/registry.py``).

Same 13 public keys as the reference's ``_MODEL_ADAPTER_REGISTRY``
(``models/registry.py:29-43``), lazily imported; unknown keys fall back to a
dotted python path ``pkg.module:ClassName``.
"""
from __future__ import annotations

import importlib
from typing import Dict, Type

_MODEL_ADAPTER_REGISTRY: Dict[str, str] = {
    "sd3-5": "flow_factory_tpu.models.sd3.adapter:SD35Adapter",
    "sd3.5": "flow_factory_tpu.models.sd3.adapter:SD35Adapter",
    "flux1": "flow_factory_tpu.models.flux.adapter:Flux1Adapter",
    "flux1-kontext": "flow_factory_tpu.models.flux.kontext:Flux1KontextAdapter",
    "flux2": "flow_factory_tpu.models.flux.flux2:Flux2Adapter",
    "flux2-klein": "flow_factory_tpu.models.flux.flux2:Flux2KleinAdapter",
    "qwen-image": "flow_factory_tpu.models.qwen_image.adapter:QwenImageAdapter",
    "qwen-image-edit-plus": "flow_factory_tpu.models.qwen_image.edit_plus:QwenImageEditPlusAdapter",
    "z-image": "flow_factory_tpu.models.z_image.adapter:ZImageAdapter",
    "wan2-t2v": "flow_factory_tpu.models.wan.t2v:WanT2VAdapter",
    "wan2-i2v": "flow_factory_tpu.models.wan.i2v:WanI2VAdapter",
    "wan21": "flow_factory_tpu.models.wan.t2v:WanT2VAdapter",
    "wan22": "flow_factory_tpu.models.wan.t2v:WanT2VAdapter",
    "wan2-v2v": "flow_factory_tpu.models.wan.v2v:WanV2VAdapter",
    "ltx2-t2av": "flow_factory_tpu.models.ltx2.t2av:LTX2T2AVAdapter",
    "ltx2-i2av": "flow_factory_tpu.models.ltx2.i2av:LTX2I2AVAdapter",
}


def resolve_adapter_class(model_type: str) -> Type:
    """Registry key or dotted path → adapter class."""
    target = _MODEL_ADAPTER_REGISTRY.get(model_type, model_type)
    if ":" in target:
        module_name, cls_name = target.split(":")
    elif "." in target:
        module_name, cls_name = target.rsplit(".", 1)
    else:
        raise KeyError(
            f"Unknown model_type {model_type!r}; known: {sorted(_MODEL_ADAPTER_REGISTRY)}"
        )
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)


def register_adapter(key: str, target: str) -> None:
    _MODEL_ADAPTER_REGISTRY[key] = target


def available_adapters() -> Dict[str, str]:
    return dict(_MODEL_ADAPTER_REGISTRY)
