#!/usr/bin/env python
"""What does the fused U-Net's NHWC→HCW ingest transpose cost, and would a
host-HCW data layout pay?

The fused serving U-Net (unet_light.apply_infer_fused) takes the composite
in NHWC and immediately transposes to the kernels' [B, H, C, W] layout
(TODO.md measured this at ~1.7 ms/batch-32 once).  A host-side HCW layout
would remove the full-frame transpose but ADD a window-sized transpose in
the composite (the blended lip window must be rotated into HCW before the
paste).  This tool times, at bench geometry:

  a) full-frame transpose [B,500,500,3] -> [B,500,3,500]  (what we'd save)
  b) window transpose [B,wh,ww,3] -> [B,wh,3,ww]          (what we'd pay)
  c) apply_infer_fused from NHWC vs from pre-transposed HCW (end to end)

Usage: python tools/bench_hcw_ingest.py [--batch 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *a, n=20):
    import jax
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--face", type=int, default=500)
    ap.add_argument("--win", type=int, nargs=2, default=[320, 352])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.models import unet_light

    b, s = args.batch, args.face
    wh, ww = args.win
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (b, s, s, 3), jnp.bfloat16)
    xw = jax.random.uniform(key, (b, wh, ww, 3), jnp.bfloat16)

    tr = jax.jit(lambda t: jnp.transpose(t, (0, 1, 3, 2)))
    t_full = timeit(tr, x)
    t_win = timeit(tr, xw)
    print(f"full-frame transpose [{b},{s},{s},3]: {t_full*1e3:.2f} ms")
    print(f"window transpose     [{b},{wh},{ww},3]: {t_win*1e3:.2f} ms")
    print(f"net if gt were host-HCW: save {(t_full - t_win)*1e3:.2f} ms/batch"
          f" = {(t_full - t_win)/b*1e6:.1f} us/frame")

    p, st = unet_light.init(jax.random.PRNGKey(1))
    cast = lambda t: jax.tree.map(lambda v: v.astype(jnp.bfloat16)
                                  if v.dtype == jnp.float32 else v, t)
    p, st = cast(p), cast(st)
    f_nhwc = jax.jit(lambda xx: unet_light.apply_infer_fused(p, st, xx))
    t_unet = timeit(f_nhwc, x, n=10)
    print(f"apply_infer_fused from NHWC: {t_unet*1e3:.2f} ms/batch "
          f"({t_unet/b*1e3:.3f} ms/frame)")

    # (c) end to end: the same forward fed pre-transposed + channel-padded
    # HCW input (what a host-HCW data layout would deliver), so the delta
    # is the ingest transpose's REAL in-graph cost, not an isolated
    # layout-assignment no-op.
    x_hcw = jnp.pad(jnp.transpose(x, (0, 1, 3, 2)),
                    ((0, 0), (0, 0), (0, 16 - 3), (0, 0)))
    f_hcw = jax.jit(lambda xx: unet_light.apply_infer_fused(
        p, st, xx, hcw_input=True))
    t_hcw = timeit(f_hcw, x_hcw, n=10)
    print(f"apply_infer_fused from HCW:  {t_hcw*1e3:.2f} ms/batch "
          f"({t_hcw/b*1e3:.3f} ms/frame)")
    print(f"-> end-to-end ingest cost: {(t_unet - t_hcw)*1e3:+.2f} ms/batch "
          f"= {(t_unet - t_hcw)/t_unet*100:+.1f}% of the U-Net")


if __name__ == "__main__":
    main()
