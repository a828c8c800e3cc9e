"""Serving paths: new-audio pipeline, multi-speaker server, pose editing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech2lip_tpu.data.synthetic import synthetic_batch


def _models(cfg):
    from speech2lip_tpu.models import talking_face as tf
    from speech2lip_tpu.models import unet_light
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return tf.init(k1, cfg), *unet_light.init(k2)


def test_multispeaker_server(rng):
    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.infer.pipeline import MultiSpeakerServer

    face, lip = 64, 32
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    cfg["data"]["height"] = cfg["data"]["width"] = lip

    param_sets = []
    for s in range(3):
        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        from speech2lip_tpu.models import talking_face as tf
        from speech2lip_tpu.models import unet_light
        p = tf.init(k1, cfg)
        up, us = unet_light.init(k2)
        param_sets.append((p, up, us))

    batch, geo = synthetic_batch(2, face=face, lip_h=lip, lip_w=lip)
    batch = jax.tree.map(jnp.asarray, batch)
    positions = [(geo["lip_x"], geo["lip_y"])] * 3
    srv = MultiSpeakerServer(cfg, param_sets, positions, use_pallas=False)
    out0 = srv.render(0, batch)
    out2 = srv.render(2, batch)
    assert out0["face"].shape == (2, face, face, 3)
    # different identities produce different outputs
    assert not np.allclose(np.asarray(out0["face"]), np.asarray(out2["face"]))


def test_new_audio_pipeline(tmp_path, rng):
    from speech2lip_tpu.data.dataset import LipDataset
    from speech2lip_tpu.data.synthetic import make_synthetic_tree, synthetic_config
    from speech2lip_tpu.infer.pipeline import new_audio_frames
    from speech2lip_tpu.models import deepspeech
    from speech2lip_tpu.train.train_step import TrainState

    root = str(tmp_path / "tree")
    geo = make_synthetic_tree(root, n_frames=8, face=64, lip_h=32, lip_w=32)
    cfg = synthetic_config(root, geo)
    ds = LipDataset(root, "test", cfg)
    params, unet_p, unet_s = _models(cfg)
    state = TrainState(params, unet_p, unet_s, None, jnp.int32(0))
    ds_params = deepspeech.init(jax.random.PRNGKey(1), hidden=32)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1 s

    frames = list(new_audio_frames(cfg, state, ds, ds_params, wav, 16000,
                                   batch=4))
    total = sum(f.shape[0] for f in frames)
    assert total == 25  # 1 s @ 25 fps windows
    assert frames[0].shape[1:] == (64, 64, 3)
    assert all(np.isfinite(f).all() for f in frames)


def test_pose_edit_forward_warp(rng):
    from speech2lip_tpu.infer.pose_edit import edited_rel_pose, forward_warp_to_pose

    h = w = 32
    depth = np.full((h, w), 2.0, np.float32)
    depth[:4] = 0.0  # holes
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    # identity edit: same pose -> (near-)identity warp on valid pixels
    rel = edited_rel_pose(np.zeros(3, np.float32),
                          np.array([0, 0, 2.0], np.float32), "euler", 0, 0.0)
    np.testing.assert_allclose(np.asarray(rel), np.eye(4), atol=1e-6)
    out = np.asarray(forward_warp_to_pose(jnp.asarray(img), jnp.asarray(depth),
                                          rel, focal=40.0))
    valid = depth > 0
    # identity projection hits ~same pixel; nearest splat is exact here
    match = np.isclose(out[valid], img[valid], atol=1e-5).mean()
    assert match > 0.95
    assert (out[~valid] == 0).all()

    # a translation edit shifts content
    rel2 = edited_rel_pose(np.zeros(3, np.float32),
                           np.array([0, 0, 2.0], np.float32), "trans", 0, 0.3)
    out2 = np.asarray(forward_warp_to_pose(jnp.asarray(img),
                                           jnp.asarray(depth), rel2, 40.0))
    assert not np.allclose(out2, out)


def test_multispeaker_render_all_vmapped(rng):
    """render_all serves every identity from ONE jitted vmapped call per
    offset group and matches the per-identity path (VERDICT r1 next #8)."""
    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.infer.pipeline import MultiSpeakerServer
    from speech2lip_tpu.models import talking_face as tf
    from speech2lip_tpu.models import unet_light

    face, lip = 64, 32
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    cfg["data"]["height"] = cfg["data"]["width"] = lip

    param_sets = []
    for s in range(3):
        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        param_sets.append((tf.init(k1, cfg), *unet_light.init(k2)))

    batch0, geo = synthetic_batch(2, face=face, lip_h=lip, lip_w=lip)
    batches = []
    for s in range(3):
        b = dict(jax.tree.map(jnp.asarray, batch0))
        b["audio"] = b["audio"] + 0.1 * s  # distinct inputs per identity
        batches.append(b)

    # two offset groups: identities 0+2 share an offset, 1 differs
    positions = [(geo["lip_x"], geo["lip_y"]),
                 (geo["lip_x"] - 2, geo["lip_y"] + 1),
                 (geo["lip_x"], geo["lip_y"])]
    srv = MultiSpeakerServer(cfg, param_sets, positions, use_pallas=False)
    assert len(srv.groups) == 2
    assert sorted(sum(srv.groups.values(), [])) == [0, 1, 2]

    outs = srv.render_all(batches)
    assert len(outs) == 3
    for i in range(3):
        ref = srv.render(i, batches[i])
        np.testing.assert_allclose(np.asarray(outs[i]["face"]),
                                   np.asarray(ref["face"]),
                                   rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(outs[0]["face"]),
                           np.asarray(outs[2]["face"]))


def test_serve_cli_static_scene(tmp_path, monkeypatch):
    """cli.serve --static routes requests through the StaticSceneRenderer
    (windowed U-Net) and still produces full-size frames + .done."""
    import os
    import sys
    import yaml
    from speech2lip_tpu.data.synthetic import (make_learnable_tree,
                                               synthetic_config)

    root = str(tmp_path / "id0")
    geo = make_learnable_tree(root, n_frames=12, face=96, lip_h=16,
                              lip_w=24)
    cfg = synthetic_config(root, geo)
    cfg["training"]["out_dir"] = str(tmp_path / "out0")
    p = str(tmp_path / "cfg0.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)

    queue = tmp_path / "queue"
    outd = tmp_path / "served"
    queue.mkdir()
    rng_l = np.random.default_rng(0)
    np.save(str(queue / "0__reqS.npy"),
            rng_l.standard_normal((4, 16, 29)).astype(np.float32))

    from speech2lip_tpu.cli import serve as serve_cli
    monkeypatch.setattr(sys, "argv", [
        "serve", p, "--queue", str(queue), "--out", str(outd),
        "--batch", "4", "--once", "--static"])
    serve_cli.main()

    assert (outd / "reqS.done").exists()
    frames = sorted(os.listdir(outd / "reqS"))
    assert len(frames) == 4
    import cv2
    img = cv2.imread(str(outd / "reqS" / frames[0]))
    assert img.shape == (96, 96, 3)


def test_multispeaker_identity_sharded_mesh(rng):
    """Multi-chip serving (BASELINE config 5 scale-out): 8 identities
    sharded one-per-device over the 8-device CPU mesh produce exactly the
    single-device vmapped outputs."""
    from speech2lip_tpu.core.config import default_config
    from speech2lip_tpu.infer.pipeline import MultiSpeakerServer
    from speech2lip_tpu.models import talking_face as tf
    from speech2lip_tpu.models import unet_light
    from speech2lip_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    face, lip = 32, 16
    cfg = default_config()
    cfg["model"]["canonical_depth_height"] = face
    cfg["model"]["canonical_depth_width"] = face
    cfg["data"]["height"] = cfg["data"]["width"] = lip

    param_sets = []
    for s in range(8):
        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        param_sets.append((tf.init(k1, cfg), *unet_light.init(k2)))

    batch0, geo = synthetic_batch(2, face=face, lip_h=lip, lip_w=lip)
    batches = []
    for s in range(8):
        b = dict(jax.tree.map(jnp.asarray, batch0))
        b["audio"] = b["audio"] + 0.1 * s
        batches.append(b)
    positions = [(geo["lip_x"], geo["lip_y"])] * 8

    mesh = make_mesh((8, 1))
    sharded = MultiSpeakerServer(cfg, param_sets, positions,
                                 use_pallas=False, mesh=mesh)
    plain = MultiSpeakerServer(cfg, param_sets, positions, use_pallas=False)

    outs_s = sharded.render_all(batches)
    outs_p = plain.render_all(batches)
    off = next(iter(sharded.groups))
    leaf = jax.tree.leaves(sharded._stacked[off])[0]
    assert len(leaf.sharding.device_set) == 8  # actually distributed
    for i in range(8):
        np.testing.assert_allclose(np.asarray(outs_s[i]["face"]),
                                   np.asarray(outs_p[i]["face"]),
                                   rtol=1e-5, atol=1e-5)


def test_serve_cli_filesystem_queue(tmp_path, monkeypatch):
    """cli.serve drains a filesystem queue: .npy audio-window requests per
    identity -> frames + .done markers; bad requests leave .err."""
    import os
    import sys
    import yaml
    from speech2lip_tpu.data.synthetic import (make_synthetic_tree,
                                               synthetic_config)

    roots = []
    cfgs = []
    for s in range(2):
        root = str(tmp_path / f"id{s}")
        geo = make_synthetic_tree(root, n_frames=8, face=64, lip_h=32,
                                  lip_w=32)
        cfg = synthetic_config(root, geo)
        cfg["training"]["out_dir"] = str(tmp_path / f"out{s}")
        p = str(tmp_path / f"cfg{s}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        roots.append(root)
        cfgs.append(p)

    queue = tmp_path / "queue"
    outd = tmp_path / "served"
    queue.mkdir()
    rng = np.random.default_rng(0)
    np.save(str(queue / "1__reqA.npy"),
            rng.standard_normal((5, 16, 29)).astype(np.float32))
    np.save(str(queue / "9__reqBad.npy"),   # identity out of range
            rng.standard_normal((2, 16, 29)).astype(np.float32))

    from speech2lip_tpu.cli import serve as serve_cli
    monkeypatch.setattr(sys, "argv", [
        "serve", *cfgs, "--queue", str(queue), "--out", str(outd),
        "--batch", "4", "--once"])
    serve_cli.main()

    assert (outd / "reqA.done").exists()
    frames = sorted(os.listdir(outd / "reqA"))
    assert len(frames) == 5
    import cv2
    img = cv2.imread(str(outd / "reqA" / frames[0]))
    assert img.shape == (64, 64, 3)
    assert (outd / "reqBad.err").exists()
    assert not os.listdir(queue)


def test_serve_cli_wav_requests_in_order(tmp_path, monkeypatch, capsys):
    """Daemon-loop loopback (VERDICT r4 #9): N raw .wav requests for a
    mel-mode identity drain through cli.serve in queue (sorted-name) order,
    each producing its own frame dir + .done — covering the wav->mel
    ingest (serve._audio_windows) and the request loop end to end, in both
    standard and --static modes."""
    import os
    import sys
    import yaml
    from scipy.io import wavfile
    from speech2lip_tpu.data.synthetic import (make_learnable_tree,
                                               synthetic_config)

    root = str(tmp_path / "id0")
    geo = make_learnable_tree(root, n_frames=12, face=96, lip_h=16, lip_w=24)
    cfg = synthetic_config(root, geo)
    cfg["model"]["use_audio_mel"] = True  # .wav requests need mel mode
    cfg["training"]["out_dir"] = str(tmp_path / "out0")
    cfg_path = str(tmp_path / "cfg0.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    rng_l = np.random.default_rng(3)

    def make_queue(name):
        queue = tmp_path / name
        queue.mkdir()
        for req in ("reqA", "reqB", "reqC"):
            wav = (0.2 * rng_l.standard_normal(8000)).astype(np.float32)
            wavfile.write(str(queue / f"0__{req}.wav"), 16000, wav)
        return queue

    from speech2lip_tpu.cli import serve as serve_cli

    for mode, flags in (("standard", []), ("static", ["--static"])):
        queue = make_queue(f"queue_{mode}")
        outd = tmp_path / f"served_{mode}"
        monkeypatch.setattr(sys, "argv", [
            "serve", cfg_path, "--queue", str(queue), "--out", str(outd),
            "--batch", "8", "--once"] + flags)
        serve_cli.main()
        log = capsys.readouterr().out

        n_frames = []
        for req in ("reqA", "reqB", "reqC"):
            assert (outd / f"{req}.done").exists(), (mode, req, log)
            frames = sorted(os.listdir(outd / req))
            # frame files are contiguous %05d.jpg from 0
            assert frames == [f"{i:05d}.jpg" for i in range(len(frames))]
            n_frames.append(len(frames))
            assert int((outd / f"{req}.done").read_text()) == len(frames)
        assert min(n_frames) >= 1
        # the daemon serves the queue in sorted-name order
        order = [log.index(f"request {r}:") for r in ("reqA", "reqB",
                                                      "reqC")]
        assert order == sorted(order), log
        assert not os.listdir(queue)
