"""Trainer factory (reference: ``src/flow_factory/trainers/loader.py:35-91``).

The reference creates an ``Accelerator`` here; the TPU equivalent is the
device mesh + (optional) multi-host init, then adapter + trainer construction.
"""
from __future__ import annotations

import logging

from ..models import load_adapter
from ..parallel.dist import initialize_multihost
from ..parallel.mesh import MeshConfig, create_mesh
from .registry import resolve_trainer_class

logger = logging.getLogger(__name__)


def load_trainer(config):
    import jax

    if config.num_processes and jax.process_count() > 1:
        initialize_multihost()

    ma = config.model_args
    mesh = None
    if ma.fsdp_size > 1 or ma.tensor_size > 1 or len(jax.devices()) > 1:
        mesh = create_mesh(MeshConfig(fsdp_size=ma.fsdp_size, tensor_size=ma.tensor_size))
        logger.info("Mesh: %s", dict(mesh.shape))

    adapter = load_adapter(config, mesh=mesh)
    trainer_cls = resolve_trainer_class(config.training_args.trainer_type)
    return trainer_cls(config, adapter)
