"""Preprocessing-scale benchmark: the 3DMM tracker at PRODUCTION budgets.

VERDICT r2 missing #4 / next #5: the reference's face_tracker burns hours
in find_focal (10 focal candidates × 4500 Adam iters,
face_tracker.py:213-281) and the 4-phase fit (1500 + 2000 landmark iters
over all frames, 71 photometric iters against the differentiable renderer
on 50 key frames, sliding 50-frame windows × 50 iters,
face_tracker.py:305-533).  This tool runs OUR tracker — every phase an
XLA ``fori_loop`` Adam program, rasterization on-device — at 500² with a
Basel-sized synthetic 3DMM (34,650 verts / id 100 / exp 79 / tex 100) on
~50 frames and reports wall-clock per phase.

    python tools/bench_preprocess.py [--frames 50] [--verts 34650]
        [--no-focal] [--json out.json]

Prints one JSON line with phase timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--verts", type=int, default=34650)
    ap.add_argument("--no-focal", action="store_true",
                    help="skip the find_focal grid search")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np
    from speech2lip_tpu.preprocess import face_3dmm as bfm
    from speech2lip_tpu.preprocess.tracker import FaceTracker, TrackerConfig

    print(f"# building {args.verts}-vertex synthetic BFM "
          f"(Basel scale: 34650 verts, id 100/exp 79/tex 100)...",
          file=sys.stderr)
    assets = bfm.synthetic_assets(n_verts=args.verts, id_dim=100,
                                  exp_dim=79, tex_dim=100)

    n, h, w = args.frames, 500, 500
    rng = np.random.default_rng(0)
    # plausible landmark tracks (smooth per-frame drift around the center)
    base_lms = rng.uniform(150, 350, (68, 2)).astype(np.float32)
    drift = 3.0 * np.sin(np.arange(n)[:, None, None] / 7.0
                         + rng.uniform(0, 6, (1, 68, 2)))
    lms = (base_lms[None] + drift).astype(np.float32)
    images = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)

    cfg = TrackerConfig()  # defaults = the reference iteration budgets
    tracker = FaceTracker(assets, lms, cfg)

    report = {"frames": n, "verts": args.verts,
              "backend": jax.default_backend(),
              "budgets": {"iters_pose": cfg.iters_pose,
                          "iters_idexp": cfg.iters_idexp,
                          "iters_photo": cfg.iters_photo,
                          "iters_window": cfg.iters_window,
                          "focal_grid": "600..1500 step 100 x "
                                        f"{cfg.iters_focal_pose}+"
                                        f"{cfg.iters_focal_idexp} iters"}}

    if not args.no_focal:
        t0 = time.perf_counter()
        focal = tracker.find_focal()
        report["find_focal_s"] = round(time.perf_counter() - t0, 1)
        report["focal"] = focal
        print(f"# find_focal: {report['find_focal_s']}s -> {focal}",
              file=sys.stderr)
    else:
        focal = 1200.0

    timings = {}
    t0 = time.perf_counter()
    tracker.fit(focal, images=images, timings=timings)
    report["fit_total_s"] = round(time.perf_counter() - t0, 1)
    report.update({k + "_s": round(v, 1) for k, v in timings.items()})
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
