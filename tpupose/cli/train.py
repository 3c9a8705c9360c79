"""Config-driven training CLI.

Capability parity with the reference entries (pose/train.py:13-48 and
HPE/main.py:10-26): parse args -> merge YAML -> Builder -> Trainer.train().
No torchrun/process-group management: single- or multi-host is decided by
the environment (tpupose/parallel/mesh.py).

Usage:
    python -m tpupose.cli.train --cfg tpupose/configs/method/simple_baseline.yaml
    python -m tpupose.cli.train train.epochs=2 data.name=synthetic
"""

from __future__ import annotations

from tpupose.configs import default_config, parse_args, update_config
from tpupose.engine.trainer import Trainer
from tpupose.utils.logging import printE, printS


def main(argv=None):
    args = parse_args(argv)
    cfg = update_config(default_config(), args)
    try:
        if cfg.model.name == "fskd":
            from tpupose.engine.episodic_trainer import EpisodicTrainer

            EpisodicTrainer(cfg).train()
            return 0
        if cfg.model.name == "fcmae":
            from tpupose.engine.episodic_trainer import MAETrainer

            MAETrainer(cfg).train()
            return 0
        trainer = Trainer(cfg)
        if args.test:
            loss = trainer.validate()
            metrics = trainer.evaluate()
            printS(f"validation loss: {loss:.5f} | "
                   + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
            return 0
        trainer.train()
        return 0
    except Exception as e:  # mirror the reference's guarded main
        printE(f"training failed: {e}")
        raise


if __name__ == "__main__":
    raise SystemExit(main())
