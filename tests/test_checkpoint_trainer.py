"""Checkpoint round-trip, retention policy, and trainer-loop smoke tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech2lip_tpu.core import checkpoint as ckpt
from speech2lip_tpu.core.checkpoint import CheckpointManager


def _tree():
    return {"a": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)},
            "list": [jnp.zeros(2), jnp.full((2, 2), 7.0)]}


def test_save_load_roundtrip(tmp_path):
    t = _tree()
    p = str(tmp_path / "m.ckpt")
    ckpt.save(p, t, {"it": 42, "loss_val_best": 1.5})
    loaded, scalars = ckpt.load(p, like=jax.tree.map(jnp.zeros_like, t))
    assert scalars == {"it": 42, "loss_val_best": 1.5}
    for a, b in zip(jax.tree.leaves(t), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tolerant_load_architecture_drift(tmp_path):
    t = _tree()
    p = str(tmp_path / "m.ckpt")
    ckpt.save(p, t)
    # template with an extra leaf and a shape-changed leaf
    like = {"a": {"w": jnp.zeros((2, 3)), "b": jnp.zeros(3),
                  "new": jnp.full(4, -1.0)},
            "list": [jnp.zeros(2), jnp.zeros((3, 3))]}
    loaded, _ = ckpt.load(p, like)
    np.testing.assert_array_equal(np.asarray(loaded["a"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(loaded["a"]["new"]),
                                  np.full(4, -1.0))      # kept from template
    assert loaded["list"][1].shape == (3, 3)              # shape drift kept


def test_manager_retention_and_autoselect(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    t = _tree()
    mgr.save_latest(t, it=10)
    mgr.save_step(t, 20000)
    mgr.save_step(t, 40000)
    mgr.save_best(t, it=25)
    mgr.save_best(t, it=30)  # must create a timestamped backup of the old best
    files = os.listdir(str(tmp_path))
    assert "model.ckpt" in files
    assert "model_40000.ckpt" in files
    assert any(f.startswith("model_best.ckpt.") for f in files)
    assert mgr.latest_step_file().endswith("model_40000.ckpt")
    restored, scalars = mgr.restore(jax.tree.map(jnp.zeros_like, t))
    assert scalars["it"] == 40000


def test_restore_fresh_when_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    t = _tree()
    restored, scalars = mgr.restore(t)
    assert scalars == {}
    assert restored is t


@pytest.mark.slow
def test_trainer_fit_and_resume(tmp_path):
    from speech2lip_tpu.data.synthetic import make_synthetic_tree, synthetic_config
    from speech2lip_tpu.train.trainer import fit

    root = str(tmp_path / "data")
    geo = make_synthetic_tree(root, n_frames=12, face=64, lip_h=32, lip_w=32)
    cfg = synthetic_config(root, geo)
    cfg["training"].update({
        "out_dir": str(tmp_path / "out"),
        "checkpoint_every": 2,
        "backup_every": 4,
        "validate_every": 4,
        "print_every": 1,
        "use_syncloss": False,   # keep the smoke test light
    })
    state = fit(cfg, max_iters=4)
    assert int(state.it) == 4
    out = str(tmp_path / "out")
    assert os.path.exists(os.path.join(out, "model.ckpt"))
    assert os.path.exists(os.path.join(out, "model_4.ckpt"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    # resume continues from it=4
    state2 = fit(cfg, max_iters=6)
    assert int(state2.it) == 6


def test_unflatten_roundtrip(tmp_path):
    t = {"a": {"list": [jnp.zeros(2), {"w": jnp.ones((2, 2))}],
               "x": jnp.arange(3.0)}}
    p = str(tmp_path / "u.ckpt")
    ckpt.save(p, t)
    from speech2lip_tpu.core.checkpoint import load_nested
    rebuilt, _ = load_nested(p)
    assert isinstance(rebuilt["a"]["list"], list)
    np.testing.assert_array_equal(np.asarray(rebuilt["a"]["list"][1]["w"]),
                                  np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(rebuilt["a"]["x"]),
                                  np.arange(3.0))


def test_async_save_and_check_weights(tmp_path):
    from speech2lip_tpu.core.checkpoint import check_weights
    mgr = CheckpointManager(str(tmp_path))
    t = _tree()
    mgr.save_latest(t, async_=True, it=7)
    mgr.wait()
    restored, scalars = mgr.restore(jax.tree.map(jnp.zeros_like, t))
    assert scalars["it"] == 7
    assert check_weights(t) == []
    bad = {"a": jnp.array([1.0, jnp.nan])}
    assert check_weights(bad) == ["a"]


def test_metrics_writer(tmp_path):
    import json
    from speech2lip_tpu.core.metrics import MetricsWriter
    w = MetricsWriter(str(tmp_path))
    w.scalars(5, {"loss": jnp.float32(0.25), "skipme": "str"}, prefix="train/")
    w.image(5, "panel", np.zeros((8, 8, 3), np.float32))
    w.close()
    lines = open(str(tmp_path / "metrics.jsonl")).read().strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["it"] == 5 and rec["train/loss"] == 0.25
    assert "train/skipme" not in rec
    import os
    assert any(f.startswith("panel_") for f in
               os.listdir(str(tmp_path / "images")))
