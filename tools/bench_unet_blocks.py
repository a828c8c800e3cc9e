#!/usr/bin/env python
"""Per-block timing of the fused Pallas U-Net at May geometry.

The composed U-Net (unet_light.apply_infer_fused) measures ~52 ms/batch-32
bf16 on v5e against a ~37 ms machine-MAC floor (TODO.md roofline).  This
tool times each of the five fused blocks in isolation at its real shape
and reports achieved vs floor per block, so optimization effort lands on
the block that actually carries the overhead.

Usage: python tools/bench_unet_blocks.py [--batch 32] [--size 500]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=500)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from speech2lip_tpu.models import unet_light
    from speech2lip_tpu.ops.pallas.conv_hcw import fused_block_hcw, halo2_pad
    from speech2lip_tpu.ops.pallas.conv_block import fold_bn

    dtype = jnp.bfloat16
    b, h = args.batch, args.size
    w = h
    key = jax.random.PRNGKey(0)
    params, state = unet_light.init(key, 3, 3, dtype=jnp.float32)
    params = jax.tree.map(lambda a: a.astype(dtype)
                          if a.dtype == jnp.float32 else a, params)

    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3), dtype)

    def blk_args(name, cpad=0):
        p, s = params[name], state[name]
        s1, b1 = fold_bn(p["bn1"], s["bn1"])
        s2, b2 = fold_bn(p["bn2"], s["bn2"])
        w1 = p["conv1"]["w"]
        if cpad:
            w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, cpad), (0, 0)))
        return (w1, s1.astype(dtype), b1.astype(dtype), p["conv2"]["w"],
                s2.astype(dtype), b2.astype(dtype))

    # stage shapes (mirrors apply_infer_fused)
    xh = jnp.transpose(x, (0, 1, 3, 2))
    xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 13), (0, 0)))
    xh = halo2_pad(xh, 16)
    hp1 = -(-h // 16) * 16
    rt2 = 16 if (hp1 // 2) % 16 == 0 else 8
    hp3 = hp1 // 4
    rt3 = 16 if hp3 % 16 == 0 else (8 if hp3 % 8 == 0 else 4)
    h2, w2 = h // 2, w // 2
    h3, w3 = h2 // 2, w2 // 2

    specs = [
        ("inc", [("direct", None)], h, w, 16, True, 13),
        ("down1", [("direct", None)], h2, w2, rt2, True, 0),
        ("down2", [("direct", None)], h3, w3, rt3, False, 0),
        ("up1", [("direct", None), ("up2x", None)], h2, w2, 8, False, 0),
        ("up2", [("direct", None), ("up2x", None)], h, w, 8, False, 0),
    ]

    # run the chain once to get real intermediates
    def run_blk(name, sources, hh, ww, rt, pool, cpad):
        a = blk_args(name, cpad)
        return fused_block_hcw(sources, a[0], a[1], a[2], a[3], a[4], a[5],
                               hh, ww, row_tile=rt, pool_out=pool)

    x1, x1p = run_blk("inc", [("direct", xh)], h, w, 16, True, 13)
    x2, x2p = run_blk("down1", [("direct", x1p)], h2, w2, rt2, True, 0)
    x3 = run_blk("down2", [("direct", x2p)], h3, w3, rt3, False, 0)
    u1 = run_blk("up1", [("direct", x2), ("up2x", x3)], h2, w2, 8, False, 0)

    inputs = {
        "inc": [("direct", xh)],
        "down1": [("direct", x1p)],
        "down2": [("direct", x2p)],
        "up1": [("direct", x2), ("up2x", x3)],
        "up2": [("direct", x1), ("up2x", u1)],
    }

    # machine MACs per block: sum over the two convs of
    # hh*ww*9*cin_packed*cout*(p+2)/3 ... equivalently M*K*wp-style; use
    # true MACs x (p+2)/3 density correction with the padded cin.
    def machine_macs(name, hh, ww, cpad):
        p = params[name]
        w1, w2_ = p["conv1"]["w"], p["conv2"]["w"]
        out = 0
        for wt in (w1, w2_):
            cin, cout = wt.shape[2], wt.shape[3]
            if wt is w1 and cpad:
                cin += cpad
            pp = max(1, 128 // cout)
            out += hh * ww * 9 * cin * cout * (pp + 2) / 3
        return out * b

    peak = 163e12  # measured v5e bf16 dot peak
    total_ms = 0.0
    total_floor = 0.0
    print(f"# batch {b}, {h}x{w}, bf16")
    for name, _, hh, ww, rt, pool, cpad in specs:
        srcs = inputs[name]
        fn = jax.jit(lambda *ins, name=name, hh=hh, ww=ww, rt=rt,
                     pool=pool, cpad=cpad, kinds=[s[0] for s in srcs]:
                     run_blk(name, list(zip(kinds, ins)), hh, ww, rt,
                             pool, cpad))
        ins = [s[1] for s in srcs]
        o = fn(*ins)
        jax.block_until_ready(o)
        ms = float("inf")
        for _trial in range(5):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                o = fn(*ins)
            jax.block_until_ready(o)
            ms = min(ms, (time.perf_counter() - t0) / args.reps * 1e3)
        mm = machine_macs(name, hh, ww, cpad)
        floor = 2 * mm / peak * 1e3
        total_ms += ms
        total_floor += floor
        print(f"{name:6s}: {ms:7.2f} ms | floor {floor:6.2f} ms | "
              f"{floor / ms * 100:5.1f}% of peak | "
              f"{2 * mm / (ms / 1e3) / 1e12:6.1f} TF/s")
    print(f"TOTAL : {total_ms:7.2f} ms | floor {total_floor:6.2f} ms | "
          f"{total_floor / total_ms * 100:5.1f}%")


if __name__ == "__main__":
    main()
