"""Per-identity SyncNet expert pretraining (train/syncnet_pretrain.py).

The reference's sync stage leans on a pretrained Wav2Lip expert
(lipsync_expert.pth, reference training.py:83-95) whose training code it
never ships.  These tests pin our re-derivation: the contrastive BCE must
fall on a learnable identity, and the trained teacher must actually
discriminate matched from shifted audio — which a random-init teacher
cannot (its sync-confidence is noise, VERDICT r3 weak evidence on the
sync metric).
"""

import numpy as np
import pytest

from speech2lip_tpu.data.synthetic import make_learnable_tree, synthetic_config
from speech2lip_tpu.train.syncnet_pretrain import (build_sync_arrays,
                                                   pretrain_teacher)


@pytest.fixture(scope="module")
def identity(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sync_id") / "identity")
    geo = make_learnable_tree(root, n_frames=48, face=48, lip_h=16, lip_w=24)
    cfg = synthetic_config(root, geo)
    cfg["data"]["val_split_frames"] = 8
    return cfg


def test_build_sync_arrays_contract(identity):
    windows, mels = build_sync_arrays(identity)
    # 40 train frames -> 36 windows of 5; syncnet face/audio input shapes
    assert windows.shape == (36, 48, 96, 15)
    assert mels.shape == (36, 80, 16)
    assert windows.dtype == np.float32 and mels.dtype == np.float32
    assert 0.0 <= windows.min() and windows.max() <= 1.0


@pytest.mark.heavy  # 60 CPU train steps of the [32,48,96,15] SyncNet
#   (~260 s — over a third of the whole quick gate; the quick tier keeps
#   the build_sync_arrays contract, and the full learning proof runs in
#   the `-m "not slow"` tier and inside CONVERGENCE_SYNC_V2)
def test_pretrain_learns_and_discriminates(identity):
    import jax.numpy as jnp

    from speech2lip_tpu.models import syncnet as syncnet_mod
    from speech2lip_tpu.train import metrics_eval as me

    (params, state), hist = pretrain_teacher(identity, steps=60, batch=8,
                                             lr=3e-4, log_every=10,
                                             log=lambda *_: None)
    # the contrastive objective must move off the ~ln(2) random floor
    assert hist[-1] < hist[0] - 0.1, hist
    assert hist[-1] < 0.55, hist

    # the trained teacher separates matched from offset audio: on GT
    # windows the confidence (max-over-offsets minus mean) must be
    # positive with the argmax at offset 0
    windows, mels = build_sync_arrays(identity)
    conf, offset = me.sync_confidence(params, state, mels, windows)
    assert conf > 0.05, (conf, offset)
    assert offset == 0, (conf, offset)

    # and embeddings are unit-norm (checkpoint/consumer contract)
    a, v, _ = syncnet_mod.apply(params, state,
                                jnp.asarray(mels[:2])[..., None],
                                jnp.asarray(windows[:2]))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=1),
                               1.0, rtol=1e-4)
