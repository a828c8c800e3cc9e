"""BASELINE config-5 serving benchmark: 8 identities, streaming request
rounds, 512² post-fusion geometry (VERDICT r2 missing #5 / next #6).

    python tools/bench_serving.py [--identities 8] [--face 512]
        [--batch 16] [--rounds 8]

Builds N random-weight identities sharing the May lip size (120×80) at a
512² face, streams ``rounds`` request waves of ``batch`` frames per
identity through MultiSpeakerServer.render_all (the fused-kernel path at
batch >= 16 on TPU), and reports aggregate throughput and per-wave
latency.  Prints one JSON line.
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
    ap.add_argument("--identities", type=int, default=8)
    ap.add_argument("--face", type=int, default=512)
    ap.add_argument("--lip-h", type=int, default=80)
    ap.add_argument("--lip-w", type=int, default=120)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--static", action="store_true", help=(
        "static-scene renderers (the new-audio serving regime: canonical "
        "artifacts fixed per identity, U-Net on the lip-window crop only)"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.data.synthetic import synthetic_batch
    from speech2lip_tpu.data.windows import compute_warp_window
    from speech2lip_tpu.infer.pipeline import MultiSpeakerServer
    from speech2lip_tpu.models import talking_face as tfm
    from speech2lip_tpu.models import unet_light

    face, lip_h, lip_w = args.face, args.lip_h, args.lip_w
    cfg = default_config()
    cfg["data"]["height"], cfg["data"]["width"] = lip_h, lip_w
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face

    raw, geo = synthetic_batch(args.batch, face=face, lip_h=lip_h,
                               lip_w=lip_w)
    box = tfm.expanded_lip_box(lip_h, lip_w, geo["lip_x"], geo["lip_y"])
    window = compute_warp_window(
        [raw["coord"][i] for i in range(args.batch)], box, face, face,
        margin=16)

    param_sets = []
    for s in range(args.identities):
        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        param_sets.append((tfm.init(k1, cfg), *unet_light.init(k2)))

    rng = np.random.default_rng(0)
    if args.static:
        from speech2lip_tpu.infer.static_scene import StaticSceneRenderer
        base = {k: np.asarray(raw[k][0])
                for k in ("rgb_face_zero", "rgb_face_ori",
                          "mask_lip_canonical", "coord")}
        renderers = [StaticSceneRenderer(cfg, *ps, base=base,
                                         window=tuple(window),
                                         lip_x=geo["lip_x"],
                                         lip_y=geo["lip_y"])
                     for ps in param_sets]
        audio = [rng.standard_normal((args.batch, 16, 29)).astype(np.float32)
                 for _ in range(args.identities)]
        t_idx = np.arange(args.batch, dtype=np.float32)

        class _SrvShim:
            _fused_fns = {0: True}
            FUSED_BATCH_THRESHOLD = 0

            def render_all(self, _):
                return [{"face": r(a, t_idx)}
                        for r, a in zip(renderers, audio)]
        server = _SrvShim()
        batches = [None] * args.identities
        crop = renderers[0].geo
        print(f"# static-scene crop: "
              f"{crop['ch']}x{crop['cw']} of {face}^2" if crop
              else "# static-scene: full-frame fallback", file=sys.stderr)
    else:
        server = MultiSpeakerServer(
            cfg, param_sets,
            [(geo["lip_x"], geo["lip_y"])] * args.identities,
            window=tuple(window))

        # per-identity streaming batches: same geometry, distinct audio
        batches = []
        for s in range(args.identities):
            b = dict(raw)
            b["audio"] = rng.standard_normal(raw["audio"].shape).astype(
                np.float32)
            batches.append(jax.tree.map(jnp.asarray, b))

    def sync(outs):
        return float(jnp.sum(outs[-1]["face"][0, 0, 0]))

    outs = server.render_all(batches)   # compile
    sync(outs)
    lat, t_all0 = [], time.perf_counter()
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        outs = server.render_all(batches)
        sync(outs)
        lat.append(time.perf_counter() - t0)
    total_s = time.perf_counter() - t_all0
    frames = args.identities * args.batch * args.rounds
    fps = frames / total_s
    realtime_per_identity = fps / args.identities / 25.0

    print(json.dumps({
        "metric": f"serving_fps_{args.identities}id_{face}sq",
        "value": round(fps, 1),
        "unit": "frames/s aggregate",
        "identities": args.identities,
        "face": face,
        "batch_per_identity": args.batch,
        "wave_latency_ms_p50": round(1e3 * sorted(lat)[len(lat) // 2], 1),
        "wave_latency_ms_max": round(1e3 * max(lat), 1),
        "realtime_factor_per_identity_25fps": round(realtime_per_identity, 2),
        "backend": jax.default_backend(),
        "static_scene": args.static,
        "path": "static-window" if args.static else (
            "fused" if (server._fused_fns
                        and args.batch >= server.FUSED_BATCH_THRESHOLD)
            else "vmap-xla"),
    }))


if __name__ == "__main__":
    main()
