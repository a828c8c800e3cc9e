"""Fused DoubleConv Pallas kernel: parity vs the XLA eval-mode path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from speech2lip_tpu.models import unet_light
from speech2lip_tpu.ops.pallas.conv_block import double_conv_infer, fold_bn


@pytest.mark.parametrize("shape", [(1, 40, 24, 3, 16, 16),
                                   (2, 37, 30, 8, 8, 12)])
def test_double_conv_matches_xla(rng, shape):
    b, h, w, cin, cmid, cout = shape
    key = jax.random.PRNGKey(0)
    params, state = unet_light._double_conv_init(key, cin, cmid, cout,
                                                 jnp.float32)
    # non-trivial BN stats
    state = jax.tree.map(
        lambda x: x + jnp.asarray(
            rng.uniform(0.1, 0.5, x.shape).astype(np.float32)), state)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))

    ref, _ = unet_light._double_conv(params, state, x, train=False)

    s1, b1 = fold_bn(params["bn1"], state["bn1"])
    s2, b2 = fold_bn(params["bn2"], state["bn2"])
    with pltpu.force_tpu_interpret_mode():
        out = double_conv_infer(x, params["conv1"]["w"], s1, b1,
                                params["conv2"]["w"], s2, b2, row_tile=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
