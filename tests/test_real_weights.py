"""Real-artifact weight-port validation (VERDICT r4 next #8).

The six reference weight artifacts (reference README.md:57 — model_may.pt,
lipsync_expert.pth, LPIPS alex.pth + linear head, 79999_iter.pth BiSeNet,
2DFAN4.pth, the DeepSpeech .pb — plus the DSFD/S3FD detectors its
preprocess scripts download) are license/network-blocked in this
environment, so these tests AUTO-SKIP here.  On a host that has them:

    export SPEECH2LIP_WEIGHTS_DIR=/path/to/downloaded_weights
    python -m pytest tests/test_real_weights.py -v

or equivalently drop the files under <repo>/weights_src/.  One fixture
runs the one-command conversion (``tools/convert_weights.py --all``) and
each test then pins, per artifact kind: (a) the real state_dict converts
cleanly (every expected key present — the converter indexes by name, so a
renamed upstream release fails loudly), (b) the converted tree is
structurally identical to the module's ``init`` tree (shape-for-shape),
and (c) a forward pass through the JAX graph is finite.  The forward
*math* under these converters is pinned by tests/test_reference_parity.py
(whole-graph activation parity vs the actual reference torch code with
seeded random weights) — together the two files make real-weight parity a
switch-on, not a port (PARITY.md §"Real artifacts").
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS_DIR = os.environ.get("SPEECH2LIP_WEIGHTS_DIR",
                             os.path.join(REPO, "weights_src"))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(WEIGHTS_DIR),
        reason=f"real reference weights not present ({WEIGHTS_DIR}; "
               "set SPEECH2LIP_WEIGHTS_DIR)"),
]


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    """Run the one-command conversion over whatever artifacts exist."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import convert_weights as cw

    out_dir = str(tmp_path_factory.mktemp("converted"))
    return cw.convert_all(WEIGHTS_DIR, out_dir), out_dir


def _need(converted, kind):
    done, _ = converted
    if kind not in done:
        pytest.skip(f"{kind} source artifact not in {WEIGHTS_DIR}")
    return done[kind]


def _assert_same_structure(loaded, initd):
    import chex
    chex.assert_trees_all_equal_shapes(loaded, initd)


def _assert_finite(tree):
    import jax
    for leaf in jax.tree.leaves(tree):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


def test_talking_face_real(converted, tmp_path):
    import jax
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.core.config import load_config
    from speech2lip_tpu.models import talking_face as tf
    from speech2lip_tpu.models import unet_light

    _need(converted, "talking_face")
    _, out_dir = converted
    cfg = load_config(os.path.join(REPO, "configs/may/may.yaml"))
    like = tf.init(jax.random.PRNGKey(0), cfg)
    params = ckpt.load(os.path.join(out_dir, "talking_face.ckpt"),
                       like=like)[0]
    _assert_same_structure(params, like)
    _assert_finite(params)

    up0, us0 = unet_light.init(jax.random.PRNGKey(1))
    unet = ckpt.load(os.path.join(out_dir, "unet.ckpt"),
                     like={"params": up0, "state": us0})[0]
    _assert_same_structure(unet, {"params": up0, "state": us0})

    # forward: audio encoder + a small trunk render must be finite
    import jax.numpy as jnp
    audio = jnp.zeros((2, 16, 29))
    codes = tf.encode_audio(params, audio)
    _assert_finite(codes)
    base, skip = tf.frame_feature(params, codes, jnp.zeros((2,)))
    _assert_finite((base, skip))


def test_syncnet_real(converted):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import syncnet as syncnet_mod

    path = _need(converted, "syncnet")
    like = syncnet_mod.init(jax.random.PRNGKey(0))
    tree = ckpt.load(path, like=like)[0]
    _assert_same_structure(tree, like)
    p, s = tree
    a, v, _ = syncnet_mod.apply(p, s, jnp.zeros((1, 80, 16, 1)),
                                jnp.zeros((1, 48, 96, 15)))
    _assert_finite((a, v))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=1),
                               1.0, rtol=1e-4)


def test_lpips_real(converted):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import lpips as lpips_mod

    path = _need(converted, "lpips")
    like = lpips_mod.init(jax.random.PRNGKey(0))
    params = ckpt.load(path, like=like)[0]
    _assert_same_structure(params, like)
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    d_same = lpips_mod.lpips_distance(params, x, x)
    d_diff = lpips_mod.lpips_distance(params, x, 1.0 - x)
    assert float(np.max(np.abs(np.asarray(d_same)))) < 1e-5
    assert float(np.min(np.asarray(d_diff))) > 1e-3  # real weights separate


def test_bisenet_real(converted):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import bisenet

    path = _need(converted, "bisenet")
    p0, s0 = bisenet.init(jax.random.PRNGKey(0))
    tree = ckpt.load(path, like={"params": p0, "state": s0})[0]
    _assert_same_structure(tree, {"params": p0, "state": s0})
    seg = bisenet.apply(tree["params"], tree["state"],
                        jnp.zeros((1, 64, 64, 3)))
    _assert_finite(seg)


def test_fan_real(converted):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import fan

    path = _need(converted, "fan")
    p0, s0 = fan.init(jax.random.PRNGKey(0))
    tree = ckpt.load(path, like={"params": p0, "state": s0})[0]
    _assert_same_structure(tree, {"params": p0, "state": s0})
    heatmaps = fan.apply(tree["params"], tree["state"],
                         jnp.zeros((1, 256, 256, 3)))
    lms = fan.decode_heatmaps(heatmaps[-1])
    assert lms.shape == (1, 68, 2)
    _assert_finite(lms)


def test_dsfd_real(converted):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import dsfd

    path = _need(converted, "dsfd")
    p0, s0 = dsfd.init(jax.random.PRNGKey(0))
    tree = ckpt.load(path, like={"params": p0, "state": s0})[0]
    _assert_same_structure(tree, {"params": p0, "state": s0})
    outs = dsfd.apply(tree["params"], tree["state"],
                      jnp.zeros((1, 128, 128, 3)))
    _assert_finite(outs)


def test_s3fd_real(converted):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import s3fd

    path = _need(converted, "s3fd")
    like = s3fd.init(jax.random.PRNGKey(0))
    params = ckpt.load(path, like=like)[0]
    _assert_same_structure(params, like)
    outs = s3fd.apply(params, jnp.zeros((1, 128, 128, 3)))
    _assert_finite(outs)


def test_deepspeech_real(converted):
    import jax
    import jax.numpy as jnp
    from speech2lip_tpu.core import checkpoint as ckpt
    from speech2lip_tpu.models import deepspeech

    path = _need(converted, "deepspeech")
    like = deepspeech.init(jax.random.PRNGKey(0))
    params = ckpt.load(path, like=like)[0]
    _assert_same_structure(params, like)
    logits = deepspeech.apply(params, jnp.zeros((16, deepspeech.INPUT_DIM)))
    _assert_finite(logits)
