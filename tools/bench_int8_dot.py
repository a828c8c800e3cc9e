#!/usr/bin/env python
"""Does Mosaic (Pallas TPU) lower int8 dots to the int8 MXU mode?

v5e peaks measured earlier via XLA dot_general: bf16 ~163 TF/s, int8
~276 TOP/s (1.7x) — but XLA only reaches the int8 mode for dot_general,
not convolutions.  The HCW conv kernels' inner op IS a dot
([P*Cout, (P+2)*3*Cin] x [K, Wp]) with the im2col scratch in VMEM, so if
Mosaic hits the int8 MXU at those shapes, an int8 serving variant of the
U-Net halves its compute time.  This tool times a grid of kernel-shaped
dots in bf16 vs int8 inside pallas_call.

Usage: python tools/bench_int8_dot.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # conv-kernel-ish shapes: lhs [M=128, K=768] (packed weights), rhs
    # [K=768, N=512] (sxi activations); G sequential dots per program
    # over a SHARED rhs bank (so host->device transfer stays tiny under
    # the tunnel), T grid programs
    M, K, N, G, T = 128, 768, 512, 8, 256

    def make(dtype, acc_dtype):
        def kernel(lhs_ref, rhs_ref, out_ref):
            acc = jnp.zeros((M, N), acc_dtype)
            for g in range(G):
                acc = acc + jnp.dot(lhs_ref[...], rhs_ref[g],
                                    preferred_element_type=acc_dtype)
            out_ref[0] = acc

        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, K, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, M, N), acc_dtype),
        )

    rng = np.random.default_rng(0)
    flops = 2 * M * K * N * G * T

    for name, dt, acc in (("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)):
        if dt == jnp.int8:
            lhs = jnp.asarray(rng.integers(-127, 127, (M, K)), dt)
            rhs = jnp.asarray(rng.integers(-127, 127, (G, K, N)), dt)
        else:
            lhs = jnp.asarray(rng.standard_normal((M, K)), dt)
            rhs = jnp.asarray(rng.standard_normal((G, K, N)), dt)
        try:
            call = make(dt, acc)
            f = jax.jit(lambda l, r, c=call: jnp.sum(
                c(l, r).astype(jnp.float32)))
            float(f(lhs, rhs))  # compile + warm
            t0 = time.perf_counter()
            n = 30
            for _ in range(n):
                r = f(lhs, rhs)
            float(r)
            dt_s = (time.perf_counter() - t0) / n
            print(f"{name}: {dt_s*1e3:7.3f} ms -> "
                  f"{flops/dt_s/1e12:6.1f} T{'OP' if name=='int8' else 'F'}/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:150]}", flush=True)


if __name__ == "__main__":
    main()
