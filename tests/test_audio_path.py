"""Tests of the new-audio path: MFCC pipeline, DeepSpeech RNN, windowing,
and the torch-checkpoint weight converter."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speech2lip_tpu.models import deepspeech
from speech2lip_tpu.ops import mfcc as mfcc_mod
from speech2lip_tpu.preprocess.audio_features import (interpolate_features,
                                                      make_windows,
                                                      wav_to_deepspeech_windows)


def test_mfcc_shapes_and_energy(rng):
    sig = (rng.standard_normal(16000) * 8000).astype(np.int16)  # 1s
    feats = mfcc_mod.mfcc(sig)
    # python_speech_features framing: 1 + ceil((16000-400)/160) = 99 frames
    assert feats.shape == (99, 26)
    # appendEnergy: coeff 0 is log total frame energy, strictly > dct output
    assert np.isfinite(feats).all()


def test_deepspeech_input_vector_shape(rng):
    sig = (rng.standard_normal(16000) * 8000).astype(np.int16)
    x = mfcc_mod.deepspeech_input_vector(sig)
    assert x.shape == (50, 494)  # 99 frames stride-2 -> 50, 26*19 context
    np.testing.assert_allclose(x.mean(), 0, atol=1e-5)
    np.testing.assert_allclose(x.std(), 1, atol=1e-4)


def test_deepspeech_apply_and_lstm_matches_torch(rng):
    params = deepspeech.init(jax.random.PRNGKey(0), input_dim=20, hidden=8,
                             n_logits=5)
    x = rng.standard_normal((7, 20)).astype(np.float32)
    out = deepspeech.apply(params, jnp.asarray(x))
    assert out.shape == (7, 5)

    # LSTM cell parity vs torch (TF BasicLSTMCell gate order i,j,f,o with
    # forget_bias=1 maps onto torch's i,f,g,o with zero bias)
    kernel = np.asarray(params["lstm_fw"]["kernel"])  # [in+h, 4h]
    h_in = kernel.shape[0] - 8
    i_k, j_k, f_k, o_k = np.split(kernel, 4, axis=1)
    cell = torch.nn.LSTMCell(h_in, 8)
    w = np.concatenate([i_k, f_k, j_k, o_k], axis=1)  # torch order i,f,g,o
    cell.weight_ih.data = torch.from_numpy(w[:h_in].T.copy())
    cell.weight_hh.data = torch.from_numpy(w[h_in:].T.copy())
    bias = np.zeros(4 * 8, np.float32)
    bias[8:16] = 1.0  # forget_bias
    cell.bias_ih.data = torch.from_numpy(bias)
    cell.bias_hh.data = torch.zeros(4 * 8)

    xs = rng.standard_normal((5, h_in)).astype(np.float32)
    ours = deepspeech._lstm_scan(params["lstm_fw"], jnp.asarray(xs))
    h = c = torch.zeros(1, 8)
    torch_out = []
    with torch.no_grad():
        for t in range(5):
            h, c = cell(torch.from_numpy(xs[t:t + 1]), (h, c))
            torch_out.append(h[0].numpy())
    np.testing.assert_allclose(np.asarray(ours), np.stack(torch_out),
                               rtol=1e-4, atol=1e-5)


def test_make_windows_matches_reference_loop(rng):
    feats = rng.standard_normal((20, 3)).astype(np.float32)
    w = make_windows(feats, win_size=16, stride=2)
    # reference loop (deepspeech_features.py:66-75)
    pad = np.zeros((8, 3), np.float32)
    net = np.concatenate([pad, feats, pad], 0)
    ref = [net[i:i + 16] for i in range(0, net.shape[0] - 16, 2)]
    np.testing.assert_array_equal(w, np.stack(ref))


def test_interpolate_features_matches_reference(rng):
    f = rng.standard_normal((50, 4))
    out = interpolate_features(f, 50, 25, 25)
    for j in range(4):
        ref = np.interp(np.arange(25) / 25.0, np.arange(50) / 50.0, f[:, j])
        np.testing.assert_allclose(out[:, j], ref)


def test_wav_to_windows_end_to_end(rng):
    params = deepspeech.init(jax.random.PRNGKey(0), input_dim=494, hidden=32,
                             n_logits=29)
    wav = (rng.standard_normal(16000) * 8000).astype(np.int16)  # 1 s
    w = wav_to_deepspeech_windows(wav, 16000, params, batch_t=64)
    # 50 logit steps -> stride-2 windows: range(0, 50, 2) -> 25 (25 fps)
    assert w.shape == (25, 16, 29)
    assert np.isfinite(w).all()


def test_convert_talking_face_weights(rng):
    """Round-trip: fake reference-named torch state_dict → converter →
    our audio encoder output matches a torch oracle with those weights."""
    from tools.convert_weights import convert_talking_face
    from speech2lip_tpu.models import talking_face as tfm

    torch.manual_seed(0)  # deterministic regardless of suite order
    sd = {}
    chans = [(29, 32), (32, 32), (32, 64), (64, 64)]
    for k, (ci, co) in zip((0, 2, 4, 6), chans):
        sd[f"encoder_conv.{k}.weight"] = torch.randn(co, ci, 3) * 0.1
        sd[f"encoder_conv.{k}.bias"] = torch.randn(co) * 0.1
    sd["encoder_fc1.0.weight"] = torch.randn(64, 64) * 0.1
    sd["encoder_fc1.0.bias"] = torch.randn(64) * 0.1
    sd["encoder_fc1.2.weight"] = torch.randn(64, 64) * 0.1
    sd["encoder_fc1.2.bias"] = torch.randn(64) * 0.1
    for name, (i, o) in {"fc_uv": (42, 256), "fc_uv_skip": (42, 256),
                         "fc_audio": (64, 256), "fc_audio_skip": (64, 256),
                         "fc_time": (20, 256), "fc_time_skip": (20, 256),
                         "output_linear": (256, 3)}.items():
        sd[f"{name}.weight"] = torch.randn(o, i) * 0.05
        sd[f"{name}.bias"] = torch.randn(o) * 0.05
    for i in range(8):
        in_dim = 512 if i == 5 else 256
        sd[f"pts_linears.{i}.weight"] = torch.randn(256, in_dim) * 0.05
        sd[f"pts_linears.{i}.bias"] = torch.randn(256) * 0.05
    sd["canonical_depth_head"] = torch.rand(16, 16)

    def dconv_sd(prefix, cin, cmid, cout):
        sd[f"{prefix}.double_conv.0.weight"] = torch.randn(cmid, cin, 3, 3)
        for tag, c in (("1", cmid), ("4", cout)):
            sd[f"{prefix}.double_conv.{tag}.weight"] = torch.rand(c)
            sd[f"{prefix}.double_conv.{tag}.bias"] = torch.randn(c)
            sd[f"{prefix}.double_conv.{tag}.running_mean"] = torch.randn(c)
            sd[f"{prefix}.double_conv.{tag}.running_var"] = torch.rand(c) + 0.5
        sd[f"{prefix}.double_conv.3.weight"] = torch.randn(cout, cmid, 3, 3)

    dconv_sd("post_fusion_unet.inc", 3, 64, 64)
    dconv_sd("post_fusion_unet.down1.maxpool_conv.1", 64, 128, 128)
    dconv_sd("post_fusion_unet.down2.maxpool_conv.1", 128, 128, 128)
    dconv_sd("post_fusion_unet.up1.conv", 256, 128, 64)
    dconv_sd("post_fusion_unet.up2.conv", 128, 64, 64)
    sd["post_fusion_unet.outc.conv.weight"] = torch.randn(3, 64, 1, 1)
    sd["post_fusion_unet.outc.conv.bias"] = torch.randn(3)

    params, unet_p, unet_s = convert_talking_face(sd)

    # audio-encoder functional parity
    audio = np.random.default_rng(1).standard_normal((2, 16, 29)).astype(np.float32)
    ours = tfm.encode_audio(params, jnp.asarray(audio))
    x = torch.from_numpy(audio).permute(0, 2, 1)
    with torch.no_grad():
        for k in (0, 2, 4, 6):
            x = torch.nn.functional.conv1d(
                x, sd[f"encoder_conv.{k}.weight"], sd[f"encoder_conv.{k}.bias"],
                stride=2, padding=1)
            x = torch.nn.functional.leaky_relu(x, 0.02)
        x = x.squeeze(-1)
        x = torch.nn.functional.leaky_relu(
            x @ sd["encoder_fc1.0.weight"].T + sd["encoder_fc1.0.bias"], 0.02)
        x = x @ sd["encoder_fc1.2.weight"].T + sd["encoder_fc1.2.bias"]
    np.testing.assert_allclose(np.asarray(ours), x.numpy(), rtol=1e-4,
                               atol=1e-4)

    # U-Net applies with converted weights
    from speech2lip_tpu.models import unet_light
    img = np.random.default_rng(2).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    out, _ = unet_light.apply(unet_p, unet_s, jnp.asarray(img), train=False)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
