"""CLI launcher (reference: ``src/flow_factory/cli.py``).

``fft-train config.yaml [--key value ...]``

The reference builds an ``accelerate launch`` subprocess (one process per
GPU); on TPU there is exactly ONE process per host controlling all local
chips, so the launcher collapses to: resolve multi-host env → apply
3-layer config overrides (CLI > env > YAML, reference ``cli.py:160-186``)
→ run the trainer in-process.

Multi-host env contract (superset of the reference's
``_ENV_VAR_MAPPINGS``, ``cli.py:34-41``):
  coordinator:  COORDINATOR_ADDRESS | MASTER_IP | MASTER_ADDR | CHIEF_IP
  process id:   PROCESS_ID | MACHINE_RANK | NODE_RANK | INDEX
  num hosts:    NUM_PROCESSES | NUM_MACHINES | NUM_NODES | HOST_NUM
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Any, Dict, List, Optional

import yaml

logger = logging.getLogger(__name__)

_ENV_ALIASES = {
    "coordinator_address": ("COORDINATOR_ADDRESS", "MASTER_IP", "MASTER_ADDR", "CHIEF_IP"),
    "process_id": ("PROCESS_ID", "MACHINE_RANK", "NODE_RANK", "INDEX"),
    "num_processes": ("NUM_PROCESSES", "NUM_MACHINES", "NUM_NODES", "HOST_NUM"),
}


def resolve_multihost_env() -> Dict[str, Optional[str]]:
    out: Dict[str, Optional[str]] = {}
    for key, names in _ENV_ALIASES.items():
        out[key] = next((os.environ[n] for n in names if os.environ.get(n)), None)
    return out


def _set_nested(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _parse_value(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def train_cli(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(
        prog="fft-train",
        description="Flow-Factory-TPU trainer launcher",
    )
    parser.add_argument("config", help="YAML config file")
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE", help="dotted config override, e.g. --set train.learning_rate=1e-4",
    )
    parser.add_argument("--coordinator-address", default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    args, unknown = parser.parse_known_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s")

    with open(args.config) as f:
        cfg: Dict[str, Any] = yaml.safe_load(f) or {}

    # layer 2: env
    env = resolve_multihost_env()
    # layer 3: CLI flags win
    coordinator = args.coordinator_address or env["coordinator_address"]
    process_id = args.process_id if args.process_id is not None else (
        int(env["process_id"]) if env["process_id"] else None
    )
    num_processes = args.num_processes if args.num_processes is not None else (
        int(env["num_processes"]) if env["num_processes"] else None
    )

    for ov in args.overrides:
        if "=" not in ov:
            raise SystemExit(f"--set expects KEY=VALUE, got {ov!r}")
        k, v = ov.split("=", 1)
        _set_nested(cfg, k, _parse_value(v))
    # also accept bare --a.b.c value pairs (reference CLI style)
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if tok.startswith("--") and i + 1 < len(unknown):
            _set_nested(cfg, tok[2:], _parse_value(unknown[i + 1]))
            i += 2
        else:
            i += 1

    if num_processes and num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "Initialized multi-host JAX: process %s/%s via %s",
            process_id, num_processes, coordinator,
        )

    from .hparams.args import Arguments
    from .trainers import load_trainer

    config = Arguments.from_dict(cfg)
    config.config_file = args.config
    trainer = load_trainer(config)
    try:
        trainer.start()
    except KeyboardInterrupt:
        trainer.cleanup()
        os._exit(0)


if __name__ == "__main__":
    train_cli()
