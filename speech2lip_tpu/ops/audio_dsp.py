"""Audio DSP: Wav2Lip-style mel-spectrogram pipeline in JAX.

TPU-native equivalent of the reference's librosa/scipy audio path
(reference src/data/audio.py:19-114 with the frozen hyperparameters of
src/data/hparams.py:30-66): preemphasis → STFT (n_fft 800, hop 200, win 800,
hann, center/reflect) → 80-mel (Slaney scale + norm) → dB → symmetric [-4, 4]
normalization.

The mel filterbank is built once in numpy (matching librosa.filters.mel
defaults: htk=False, norm='slaney'); the per-clip transform is a jitted JAX
program (frame + rfft + one [n_freq, n_mels] matmul) that runs on TPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MelParams:
    """Frozen Wav2Lip hyperparameters (reference hparams.py:30-66)."""
    sample_rate: int = 16000
    n_fft: int = 800
    hop_size: int = 200
    win_size: int = 800
    num_mels: int = 80
    fmin: float = 55.0
    fmax: float = 7600.0
    preemphasis: float = 0.97
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    max_abs_value: float = 4.0


def _hz_to_mel_slaney(f):
    """Slaney mel scale: linear below 1 kHz, log above (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float) -> np.ndarray:
    """[n_mels, n_fft//2+1] Slaney-normalized triangular filterbank,
    numerically matching librosa.filters.mel(htk=False, norm='slaney')."""
    fftfreqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]  # [n_mels+2, n_freq]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def preemphasis(wav: jnp.ndarray, k: float = 0.97) -> jnp.ndarray:
    """y[t] = x[t] - k*x[t-1], y[0] = x[0] (scipy lfilter([1,-k],[1],x),
    reference audio.py:19-22)."""
    return jnp.concatenate([wav[:1], wav[1:] - k * wav[:-1]])


def stft_magnitude(wav: jnp.ndarray, n_fft: int, hop: int,
                   win: int) -> jnp.ndarray:
    """|STFT| with librosa conventions: center=True, reflect padding, hann
    window (periodic).  Returns [n_fft//2+1, n_frames]."""
    pad = n_fft // 2
    y = jnp.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])  # [T, n_fft]
    frames = y[idx]
    window = jnp.asarray(np.hanning(win + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.abs(spec).T.astype(jnp.float32)


def _amp_to_db(x: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    min_level = jnp.exp(min_level_db / 20.0 * jnp.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def _normalize(s: jnp.ndarray, p: MelParams) -> jnp.ndarray:
    return jnp.clip(
        (2 * p.max_abs_value) * ((s - p.min_level_db) / (-p.min_level_db))
        - p.max_abs_value, -p.max_abs_value, p.max_abs_value)


@functools.partial(jax.jit, static_argnames=("params",))
def _melspectrogram_jit(wav: jnp.ndarray, basis: jnp.ndarray,
                        params: MelParams) -> jnp.ndarray:
    d = stft_magnitude(preemphasis(wav, params.preemphasis),
                       params.n_fft, params.hop_size, params.win_size)
    s = _amp_to_db(basis @ d, params.min_level_db) - params.ref_level_db
    return _normalize(s, params)


def melspectrogram(wav, fmin: float = 55.0,
                   params: MelParams = MelParams()) -> np.ndarray:
    """wav [T] float32 -> mel [80, n_frames] in [-4, 4]
    (reference audio.py:44-50)."""
    if fmin != params.fmin:
        params = MelParams(**{**params.__dict__, "fmin": float(fmin)})
    basis = mel_filterbank(params.sample_rate, params.n_fft, params.num_mels,
                           params.fmin, params.fmax)
    return np.asarray(_melspectrogram_jit(jnp.asarray(wav, jnp.float32),
                                          jnp.asarray(basis), params))


def load_wav(path: str, sr: int = 16000) -> np.ndarray:
    """Read a wav file to float32 [-1, 1] at the target rate (replacement for
    librosa.core.load, reference audio.py:9-10)."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly
    rate, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if rate != sr:
        from math import gcd
        g = gcd(rate, sr)
        data = resample_poly(data, sr // g, rate // g).astype(np.float32)
    return data


def crop_audio_window(spec: np.ndarray, start_frame: int, fps: int = 25,
                      mel_step_size: int = 16) -> np.ndarray:
    """Crop the 16-mel-frame window aligned to a video frame (reference
    someones_lip_dataset.py:401-414).  spec: [T, 80]."""
    start_idx = int(80.0 * (start_frame / float(fps)))
    end_idx = start_idx + mel_step_size
    if end_idx > spec.shape[0]:
        start_idx = spec.shape[0] - mel_step_size
        end_idx = spec.shape[0]
    return spec[start_idx:end_idx, :]
