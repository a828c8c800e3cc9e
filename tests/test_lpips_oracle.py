"""Numeric oracle for the LPIPS port (VERDICT r2 missing #3).

The pip ``lpips``/``torchvision`` packages are unavailable, so
tools/lpips_oracle.py reimplements ``lpips.LPIPS(net='alex', version='0.1')``
from the published algorithm in plain torch.  These tests pin

  (a) models/lpips.py `lpips_distance` against the oracle forward through
      the production converter (tools/convert_weights.convert_lpips — the
      same mapping the real alex.pth artifacts will take), and
  (b) train/losses.perceptual_loss against the reference's
      ``add_perceptual_loss`` arithmetic (training.py:655-674: inputs in
      [0,1], scaled to [-1,1], LPIPS, mean, weight).

With these green, the perceptual term is no longer dark in the integration
suite (tests/test_reference_parity.py runs the reference Trainer with the
perceptual loss ON using the same oracle as its ``lpips`` module).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def oracle_and_params():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.lpips_oracle import LPIPS
    from tools.convert_weights import convert_lpips

    torch.manual_seed(0)
    oracle = LPIPS(net="alex", version="0.1", model_path=None)
    sd = oracle.state_dict()
    params = jax.tree.map(jnp.asarray, convert_lpips(sd, sd))
    return oracle, params


def test_lpips_distance_matches_torch_oracle(oracle_and_params):
    from speech2lip_tpu.models.lpips import lpips_distance

    oracle, params = oracle_and_params
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.from_numpy(y).permute(0, 3, 1, 2))
    theirs = theirs.numpy().reshape(-1)

    ours = np.asarray(lpips_distance(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_lpips_identical_inputs_zero(oracle_and_params):
    from speech2lip_tpu.models.lpips import lpips_distance

    _, params = oracle_and_params
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 48, 48, 3)).astype(np.float32)
    d = float(lpips_distance(params, jnp.asarray(x), jnp.asarray(x))[0])
    assert abs(d) < 1e-8


def test_perceptual_loss_matches_reference_arithmetic(oracle_and_params):
    """losses.perceptual_loss == the reference add_perceptual_loss body:
    (img - 0.5) * 2 on both sides -> lpips -> .mean() * weight
    (training.py:665-672)."""
    from speech2lip_tpu.train.losses import perceptual_loss

    oracle, params = oracle_and_params
    rng = np.random.default_rng(2)
    pred = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    w = 0.01

    with torch.no_grad():
        recon_x = (torch.from_numpy(pred).permute(0, 3, 1, 2) - 0.5) * 2
        x = (torch.from_numpy(tgt).permute(0, 3, 1, 2) - 0.5) * 2
        theirs = float(oracle(recon_x, x).mean() * w)

    ours = float(perceptual_loss(params, jnp.asarray(pred), jnp.asarray(tgt),
                                 weight=w))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-8)
