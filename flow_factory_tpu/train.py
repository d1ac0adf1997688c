"""Training entry point (reference: ``src/flow_factory/train.py``).

``python -m flow_factory_tpu.train config.yaml``
"""
from __future__ import annotations

import logging
import os
import sys


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: python -m flow_factory_tpu.train <config.yaml>")
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from .hparams.args import Arguments
    from .trainers import load_trainer

    config = Arguments.load_from_yaml(argv[0])
    trainer = load_trainer(config)
    try:
        trainer.start()
    except KeyboardInterrupt:
        logging.getLogger(__name__).info("Interrupted; cleaning up")
        trainer.cleanup()
        os._exit(0)


if __name__ == "__main__":
    main()
