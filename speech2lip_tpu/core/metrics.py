"""Metrics / logging / observability.

Replaces the reference's tensorboard SummaryWriter + file logger stack
(reference train.py:152-218, src/config.py:204-219) with a dependency-free
JSONL metrics stream plus standard logging, gated to process 0 (the
``dist.get_rank() == 0`` equivalent, reference train.py:66-73).
Tensorboard-compatible event files can be layered on later; JSONL is the
machine-readable source of truth.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_logger(out_dir: str, logfile: str = "train.log") -> logging.Logger:
    """File + console logger (reference src/config.py:204-219)."""
    logger = logging.getLogger("speech2lip_tpu")
    logger.setLevel(logging.INFO if is_main_process() else logging.WARNING)
    if not logger.handlers:
        os.makedirs(out_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(out_dir, logfile), mode="a")
        fh.setFormatter(logging.Formatter(
            "[%(levelname)s] %(asctime)s: %(message)s", datefmt="%m-%d %H:%M"))
        logger.addHandler(fh)
        ch = logging.StreamHandler()
        ch.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
        logger.addHandler(ch)
    return logger


class MetricsWriter:
    """Append-only JSONL scalar stream: {"it": N, "tag": ..., "value": ...},
    mirrored to a TensorBoard event file (the reference's SummaryWriter
    surface, train.py:206-209) via core/tb_events — no TF dependency."""

    def __init__(self, out_dir: str, name: str = "metrics.jsonl",
                 tensorboard: bool = True):
        self.path = os.path.join(out_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        self._f = open(self.path, "a") if is_main_process() else None
        self._tb = None
        if tensorboard and self._f is not None:
            from speech2lip_tpu.core.tb_events import EventFileWriter
            self._tb = EventFileWriter(os.path.join(out_dir, "tensorboard"))

    def scalars(self, it: int, values: Dict[str, Any], prefix: str = ""):
        if self._f is None:
            return
        rec = {"it": int(it), "t": time.time()}
        for k, v in values.items():
            try:
                rec[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("it", "t"):
                    self._tb.scalar(int(it), k, v, wall_time=rec["t"])
            self._tb.flush()

    def image(self, it: int, tag: str, img, out_subdir: str = "images"):
        """Dump a [H, W, 3] float image in [0,1] as jpg (the tensorboard
        image-panel equivalent, reference training.py:728-738)."""
        if self._f is None:
            return
        import numpy as np
        d = os.path.join(os.path.dirname(self.path), out_subdir)
        os.makedirs(d, exist_ok=True)
        arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype("uint8")
        try:
            import cv2
            cv2.imwrite(os.path.join(d, f"{tag}_{it:08d}.jpg"),
                        cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
        except Exception:
            pass

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
