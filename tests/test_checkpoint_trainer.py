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


def test_chunked_ray_stepping(tmp_path):
    """batch_rays < H*W runs the per-chunk optimizer stepping path
    (reference training.py:404,559-561; VERDICT r1 missing #7): loss
    decreases, and invalid flag combinations are rejected like the
    reference would crash."""
    import copy
    from speech2lip_tpu.data.synthetic import make_synthetic_tree, synthetic_config
    from speech2lip_tpu.train import trainer as trainer_mod

    root = str(tmp_path / "tree")
    geo = make_synthetic_tree(root, n_frames=16, face=64, lip_h=16, lip_w=16)
    cfg = synthetic_config(root, geo)
    cfg["training"].update({
        "out_dir": str(tmp_path / "out"),
        "batch_rays": 16 * 16 // 4,       # 4 chunks / frame
        "use_syncloss": False, "use_perceptual_loss": False,
        "use_canonical_depth_loss_photo_v2": False,
        "checkpoint_every": -1, "backup_every": -1, "validate_every": -1,
        "visualize_every": -1, "print_every": 1,
    })
    cfg["model"]["use_post_fusion"] = False

    state = trainer_mod.fit(cfg, max_iters=6)
    import json
    recs = [json.loads(l) for l in
            open(os.path.join(cfg["training"]["out_dir"], "metrics.jsonl"))]
    losses_seen = [r["train/loss"] for r in recs if "train/loss" in r]
    assert len(losses_seen) >= 2
    assert losses_seen[-1] < losses_seen[0]

    # invalid combination: post-fusion with chunked rays must be rejected
    bad = copy.deepcopy(cfg)
    bad["model"]["use_post_fusion"] = True
    bad["training"]["out_dir"] = str(tmp_path / "out_bad")
    with pytest.raises(ValueError, match="per-chunk"):
        trainer_mod.fit(bad, max_iters=1)


def test_batch_larger_than_dataset_rejected(tmp_path):
    """A per-host batch larger than the host's dataset slice must raise
    instead of spinning zero-batch epochs forever (found via a hung
    chunked-stepping test: 8 virtual devices inflate batch_size x8)."""
    from speech2lip_tpu.data.dataset import LipDataset
    from speech2lip_tpu.data.synthetic import make_synthetic_tree, synthetic_config
    from speech2lip_tpu.train.trainer import batch_iterator

    root = str(tmp_path / "tree")
    geo = make_synthetic_tree(root, n_frames=8, face=32, lip_h=16, lip_w=16)
    cfg = synthetic_config(root, geo)
    ds = LipDataset(root, "train", cfg)
    with pytest.raises(ValueError, match="exceeds"):
        next(batch_iterator(ds, len(ds) + 1, shuffle=False, seed=0))


def test_sharded_checkpoint_roundtrip_and_resharding(tmp_path):
    """save_sharded on a (2,4) mesh, restore on an (8,) mesh with a
    different layout: values must round-trip exactly; replicated leaves
    are written once (replica_id==0 dedup); tolerant restore keeps
    template values for unknown keys."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from speech2lip_tpu.core import checkpoint_sharded as cs

    devs = np.array(jax.devices()[:8])
    mesh_a = Mesh(devs.reshape(2, 4), ("data", "pixel"))
    mesh_b = Mesh(devs, ("data",))

    w = jnp.arange(64.0 * 8).reshape(64, 8)
    b = jnp.arange(16.0)
    tree = {
        "w": jax.device_put(w, NamedSharding(mesh_a, P("data", "pixel"))),
        "b": jax.device_put(b, NamedSharding(mesh_a, P(None))),  # replicated
        "host": np.full((3,), 2.5, np.float32),
    }
    d = str(tmp_path / "sharded")
    cs.save_sharded(d, tree, {"it": 7})

    # single process: exactly one shard file; replicated leaf stored once
    import json
    with open(os.path.join(d, "index-p0.json")) as f:
        idx = json.load(f)
    assert len(idx["b"]["blocks"]) == 1
    assert len(idx["w"]["blocks"]) == 8
    with open(os.path.join(d, "meta.json")) as f:
        assert json.load(f)["processes"] == 1

    like = {
        "w": jax.device_put(jnp.zeros((64, 8)),
                            NamedSharding(mesh_b, P("data"))),
        "b": jax.device_put(jnp.zeros(16), NamedSharding(mesh_b, P(None))),
        "host": np.zeros(3, np.float32),
        "extra": np.ones(2, np.float32),
    }
    restored, scalars = cs.restore_sharded(d, like)
    assert scalars == {"it": 7}
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(restored["b"]), np.asarray(b))
    np.testing.assert_array_equal(restored["host"],
                                  np.full((3,), 2.5, np.float32))
    np.testing.assert_array_equal(restored["extra"], np.ones(2, np.float32))
    # the restored sharded leaf actually lives on the new mesh layout
    assert restored["w"].sharding.spec == P("data")

    # NamedTuple templates keep their structure (trainer resume passes a
    # TrainState; a digit-keyed unflatten would return a plain list)
    from speech2lip_tpu.train.train_step import TrainState
    st = TrainState(
        {"w": jax.device_put(w, NamedSharding(mesh_a,
                                              P("data", "pixel")))},
        {"b": b}, {"m": np.zeros(2, np.float32)}, None, jnp.int32(3))
    d2 = str(tmp_path / "sharded_state")
    cs.save_sharded(d2, st, {"it": 9})
    like_st = TrainState(
        {"w": jax.device_put(jnp.zeros((64, 8)),
                             NamedSharding(mesh_b, P("data")))},
        {"b": jnp.zeros(16)}, {"m": np.ones(2, np.float32)}, None,
        jnp.int32(0))
    rst, sc = cs.restore_sharded(d2, like_st)
    assert isinstance(rst, TrainState) and sc == {"it": 9}
    np.testing.assert_array_equal(np.asarray(rst.params["w"]),
                                  np.asarray(w))
    assert int(rst.it) == 3
    # dtype cast + shape-drift tolerance, like the dense loader
    like_bf = {"w": jax.device_put(jnp.zeros((64, 8), jnp.bfloat16),
                                   NamedSharding(mesh_b, P("data"))),
               "b": jnp.zeros(99)}
    r2, _ = cs.restore_sharded(d, like_bf)
    assert r2["w"].dtype == jnp.bfloat16
    assert r2["b"].shape == (99,)


def test_sharded_manager_retention_and_resume(tmp_path):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    t = {"w": jax.device_put(jnp.arange(32.0).reshape(8, 4),
                             NamedSharding(mesh, P("data")))}
    m = CheckpointManager(str(tmp_path), sharded=True)
    m.save_latest(t, it=1)
    m.save_step(t, 40)
    like = {"w": jax.device_put(jnp.zeros((8, 4)),
                                NamedSharding(mesh, P("data")))}
    restored, scalars = m.restore(like)
    assert scalars["it"] == 40
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(32.0).reshape(8, 4))
    m.save_best(t, it=40)
    m.save_best(t, it=41)  # second best triggers the timestamped copytree
    assert any(f.startswith("model_best.ckpt.") for f in
               os.listdir(str(tmp_path)))
