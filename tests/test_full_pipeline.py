"""Raw-video-to-talking-head integration: tools/full_pipeline_run.py drives
the reference's ENTIRE workflow (reference README.md "Data Preparation" →
preprocess_may.sh STEP0–6 → train.py → inference.py) from a synthesized
MJPG+PCM AVI through every production CLI — extract, crop_face, landmarks
(FAN+DSFD), track (find_focal + 4-phase fit), warp, uv_mapping, masks,
crop_lip, audio_features — into training, best-checkpoint rendering, and
scoring.  The assertion is the chain's integrity, not model quality (the
convergence artifacts CONVERGENCE*.json pin quality at honest budgets)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_full_pipeline_from_raw_video(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "pipe")
    report_path = str(tmp_path / "report.json")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "full_pipeline_run.py"),
         "--out", out, "--cpu", "--frames", "10", "--crop", "64",
         "--margin", "16", "--lip-w", "16", "--lip-h", "12",
         "--verts", "200", "--iters", "12", "--batch", "2",
         "--val-frames", "4", "--validate-every", "6",
         "--track-scale", "0.02", "--json", report_path],
        check=True, env=env, cwd=repo, timeout=2700)

    with open(report_path) as f:
        rep = json.load(f)

    # every phase ran and was timed
    for phase in ("extract", "crop_face", "landmarks", "track", "warp",
                  "uv_mapping", "masks", "crop_lip", "audio_features",
                  "train", "infer"):
        assert phase in rep["phase_seconds"], phase

    # At this 10-frame/0.02-budget smoke scale the focal grid search is
    # plumbing-only (too few Adam iters to separate candidates — measured:
    # it sits on the 600 grid edge).  The RECOVERY requirement (within one
    # grid step of focal_true) is asserted on the committed production-
    # budget artifact by test_committed_pipeline_artifact_recovered_focal.
    assert 600 <= rep["focal_found"] <= 1500

    # training validated and selected a best checkpoint; rendering scored
    assert rep["best_checkpoint_selected"]
    assert len(rep["val_psnr_trajectory"]) >= 1
    import math
    assert math.isfinite(rep["rendered_val_metrics"]["psnr"])

    # the artifact tree satisfies the dataset contract end-to-end
    root = os.path.join(out, "identity")
    for rel in ("track_params.pt.npz", "depth_face_canonical.npy",
                "canonical_face_mask.jpg", "canonical_head_mask.jpg",
                "canonical_lip_mask.jpg", "face_bbox_dict.npy",
                os.path.join("audio", "audio.npy"),
                os.path.join("audio", "audio.wav")):
        assert os.path.exists(os.path.join(root, rel)), rel
    n_rendered = len(os.listdir(os.path.join(
        out, "rendering_result", "pipeline", "postfusion")))
    assert n_rendered >= 1


@pytest.mark.quick
def test_committed_pipeline_artifact_recovered_focal():
    """The committed PIPELINE.json (the ≥64-frame artifact the driver
    records) must carry an exactly-recovered focal — the round-4 artifact
    predated the identifiability fix (commit 2daf96b) and sat on the 600
    grid edge with focal_true=900."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PIPELINE.json")) as f:
        rep = json.load(f)
    assert rep["geometry"]["frames"] >= 64
    assert abs(rep["focal_found"] - rep["focal_true"]) <= 100, (
        rep["focal_found"], rep["focal_true"])
    assert rep["best_checkpoint_selected"]
