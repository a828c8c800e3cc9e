"""Training CLI (reference train.py:21-38 argparse surface).

Usage:
    python -m speech2lip_tpu.cli.train configs/may/may.yaml \
        [--exit-after SECONDS] [--max-iters N]

Multi-chip runs need no launcher: the mesh spans all visible devices
(replacing torch.distributed.launch, reference scripts/example/train_may.sh).
"""

from __future__ import annotations

import argparse


def main():
    from speech2lip_tpu.core.platform import apply_env_platform
    apply_env_platform()  # JAX_PLATFORMS honored despite sitecustomize
    parser = argparse.ArgumentParser(description="Train a Speech2Lip model.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--exit-after", type=int, default=-1,
                        help="Checkpoint and exit(3) after N seconds "
                             "(preemptible scheduling contract).")
    parser.add_argument("--max-iters", type=int, default=None)
    args = parser.parse_args()

    from speech2lip_tpu.parallel.distributed import initialize_if_needed
    initialize_if_needed()

    from speech2lip_tpu.core.config import load_config
    from speech2lip_tpu.train.trainer import fit

    cfg = load_config(args.config)
    fit(cfg, max_iters=args.max_iters,
        exit_after=args.exit_after if args.exit_after > 0 else None)


if __name__ == "__main__":
    main()
