"""Train a SyncNet lip-sync expert for one identity.

The reference's sync stage requires a pretrained Wav2Lip expert
(``lipsync_expert.pth``) whose training code it does not ship (it is loaded
frozen in reference training.py:83-95).  This CLI derives that artifact
from the identity's own ground-truth frames + audio, producing a
checkpoint consumable as ``training.syncnet_weights`` by both the sync
stage and ``cli.evaluate --sync``:

    python -m speech2lip_tpu.cli.train_syncnet configs/may/may.yaml \
        --out models/syncnet_may.ckpt [--steps 400] [--batch 16]
"""

from __future__ import annotations

import argparse


def main():
    from speech2lip_tpu.core.platform import apply_env_platform
    apply_env_platform()
    ap = argparse.ArgumentParser(
        description="Train a per-identity SyncNet lip-sync expert.")
    ap.add_argument("config", type=str)
    ap.add_argument("--out", required=True, help="checkpoint output path")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from speech2lip_tpu.core import checkpoint as ckpt_io
    from speech2lip_tpu.core.config import load_config
    from speech2lip_tpu.train.syncnet_pretrain import pretrain_teacher

    cfg = load_config(args.config)
    teacher, history = pretrain_teacher(
        cfg, steps=args.steps, batch=args.batch, lr=args.lr, seed=args.seed)
    ckpt_io.save(args.out, teacher)
    print(f"saved {args.out} (bce {history[0]:.4f} -> {history[-1]:.4f})")


if __name__ == "__main__":
    main()
