"""wav → DeepSpeech feature windows (the audio.npy producer).

TPU-native equivalent of the reference's DeepSpeech feature extraction
(reference preprocess/deepspeech_features/deepspeech_features.py:16-75 and
extract_ds_features.py): resample → MFCC-26 ±9-context stride-2 →
DeepSpeech-0.1.0 logits (jitted JAX RNN, models/deepspeech.py) → 50 fps →
video-fps interpolation → zero-padded sliding 16-step windows.

Two windowing variants exist in the reference; both are reproduced:
- driver path (extract_ds_features.py defaults): features at 50 fps,
  window 16 / stride 2 → one window per 25 fps video frame;
- generic path: interpolate to the video fps, window 16 / stride 1.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from speech2lip_tpu.ops.mfcc import deepspeech_input_vector


def interpolate_features(features: np.ndarray, input_rate: float,
                         output_rate: float,
                         output_len: int) -> np.ndarray:
    """Per-feature linear time interpolation
    (reference deepspeech_features.py:245-278)."""
    input_len, n = features.shape
    in_t = np.arange(input_len) / float(input_rate)
    out_t = np.arange(output_len) / float(output_rate)
    out = np.zeros((output_len, n))
    for j in range(n):
        out[:, j] = np.interp(out_t, in_t, features[:, j])
    return out


def make_windows(features: np.ndarray, win_size: int = 16,
                 stride: int = 1) -> np.ndarray:
    """Zero-pad win/2 each side, slide (reference deepspeech_features.py:66-75,
    175-183: range stops at len(padded) - win_size exclusive)."""
    pad = np.zeros((win_size // 2, features.shape[1]), features.dtype)
    padded = np.concatenate([pad, features, pad], axis=0)
    return np.stack([padded[i:i + win_size]
                     for i in range(0, padded.shape[0] - win_size, stride)])


def wav_to_deepspeech_windows(audio: np.ndarray, sample_rate: int,
                              ds_params, fps: float = 25.0,
                              num_frames: Optional[int] = None,
                              batch_t: int = 4096) -> np.ndarray:
    """Full pipeline: raw audio → [N, 16, 29] windows (audio.npy contract).

    Args:
      audio: int16 or float waveform; sample_rate: its rate;
      ds_params: models/deepspeech.py param pytree;
      num_frames: target video frame count (None → driver-default path:
        features kept at 50 fps, windows strided by 2 → 25 fps windows).
    """
    import jax.numpy as jnp
    from speech2lip_tpu.models import deepspeech

    if audio.dtype != np.int16:
        peak = np.abs(audio).max() or 1.0
        audio = (audio / peak * 32767 * 0.95).astype(np.int16)
    if sample_rate != 16000:
        from math import gcd
        from scipy.signal import resample_poly
        g = gcd(int(sample_rate), 16000)
        audio_f = resample_poly(audio.astype(np.float64),
                                16000 // g, sample_rate // g)
        audio = audio_f.astype(np.int16)
        sample_rate = 16000

    x = deepspeech_input_vector(audio)  # [T, 494]
    # pad T to a multiple for stable jit shapes, run, crop
    t = x.shape[0]
    t_pad = -(-t // batch_t) * batch_t
    xp = np.pad(x, ((0, t_pad - t), (0, 0)))
    logits = np.asarray(deepspeech.apply(ds_params, jnp.asarray(xp)))[:t]

    if num_frames is None:
        return make_windows(logits, win_size=16, stride=2)
    audio_len_s = len(audio) / sample_rate
    video_fps = num_frames / audio_len_s
    feats = interpolate_features(logits, 50.0, video_fps, num_frames)
    return make_windows(feats.astype(np.float32), win_size=16, stride=1)
