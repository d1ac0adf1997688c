"""Trainer registry (reference: ``src/flow_factory/trainers/registry.py:29``)."""
from __future__ import annotations

import importlib
from typing import Type

_TRAINER_REGISTRY = {
    "grpo": "flow_factory_tpu.trainers.grpo:GRPOTrainer",
    "grpo_guard": "flow_factory_tpu.trainers.grpo:GRPOGuardTrainer",
    "grpo-guard": "flow_factory_tpu.trainers.grpo:GRPOGuardTrainer",
    "dpo": "flow_factory_tpu.trainers.dpo:DPOTrainer",
    "nft": "flow_factory_tpu.trainers.nft:NFTTrainer",
    "awm": "flow_factory_tpu.trainers.awm:AWMTrainer",
    "dgpo": "flow_factory_tpu.trainers.dgpo:DGPOTrainer",
    "crd": "flow_factory_tpu.trainers.crd:CRDTrainer",
}


def resolve_trainer_class(trainer_type: str) -> Type:
    target = _TRAINER_REGISTRY.get(str(trainer_type).lower(), trainer_type)
    if ":" in target:
        module_name, cls_name = target.split(":")
    elif "." in target:
        module_name, cls_name = target.rsplit(".", 1)
    else:
        raise KeyError(
            f"Unknown trainer_type {trainer_type!r}; known: {sorted(_TRAINER_REGISTRY)}"
        )
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)


def register_trainer(key: str, target: str) -> None:
    _TRAINER_REGISTRY[key] = target


def available_trainers():
    return dict(_TRAINER_REGISTRY)
