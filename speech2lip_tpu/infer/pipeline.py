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
    """Batched multi-identity serving: one compiled program, S identities
    (BASELINE config 5).

    Identities are grouped by lip paste offset (the offset is a static slice
    position, so it must be uniform within a compiled program); within a
    group the per-identity parameter pytrees are stacked along a leading
    axis and the render step is ``vmap``-ed over (params, frame batch) — one
    jitted call serves every identity of the group per step.  All identities
    share geometry (lip/face sizes).
    """

    def __init__(self, cfg: Dict[str, Any], param_sets: List[tuple],
                 lip_positions: List[tuple], window: Optional[tuple] = None,
                 use_pallas: Optional[bool] = None, mesh=None):
        """param_sets: [(params, unet_params, unet_state)] per identity.

        ``mesh``: optional jax.sharding.Mesh — the stacked identity axis of
        each offset group shards over the mesh's 'data' axis, so the
        vmapped program serves identities on different chips in one SPMD
        call (multi-chip serving; group sizes must divide the axis or be
        1).  Frame batches passed to render_all are sharded the same way.
        """
        import functools
        d = cfg["data"]
        lip_h, lip_w = int(d["height"]), int(d["width"])
        if use_pallas is None:
            # TPU only ("axon" is the tunneled-TPU backend name some
            # environments report): the fused kernels are Mosaic programs
            # and, unlike Renderer, the server has no lowering fallback
            use_pallas = jax.default_backend() in ("tpu", "axon")
        self.n_identities = len(param_sets)

        # identity groups: offset -> ordered list of identity ids
        self.groups: Dict[tuple, List[int]] = {}
        for i, (x, y) in enumerate(lip_positions):
            self.groups.setdefault((int(x), int(y)), []).append(i)

        # per-group stacked parameter pytrees, cast to the compute dtype
        # (param sets usually arrive fp32; the bf16 serving path needs
        # matching operand dtypes)
        cdt = jnp.bfloat16 if use_pallas else jnp.float32
        param_sets = [jax.tree.map(
            lambda x: x.astype(cdt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, ps)
            for ps in param_sets]
        self._param_sets = param_sets
        self._stacked = {
            off: jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[param_sets[i] for i in ids])
            for off, ids in self.groups.items()
        }
        self._mesh = mesh
        self._identity_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._identity_sharding = NamedSharding(mesh,
                                                    PartitionSpec("data"))
            self._stacked = {
                off: jax.device_put(tree, self._identity_sharding)
                if len(self.groups[off]) > 1 else tree
                for off, tree in self._stacked.items()
            }

        def render_one(params3, batch, lip_x, lip_y, pallas=False):
            p, up, us = params3
            return render_face_batch(
                p, up, us, batch,
                lip_x=lip_x, lip_y=lip_y, lip_h=lip_h, lip_w=lip_w,
                use_pallas=pallas,
                window=window,
                compute_dtype=jnp.bfloat16 if use_pallas else jnp.float32)

        self._render_one = render_one
        self.use_pallas = use_pallas
        # one compiled program per group: vmap over stacked identities
        # (the vmapped program keeps the XLA graph — vmap over the manual-
        # DMA Pallas kernels adds a grid dim Mosaic hasn't been validated
        # on here; the sequential fused path below covers large batches)
        def group_fn(off, n_ids):
            vm = jax.vmap(functools.partial(render_one, lip_x=off[0],
                                            lip_y=off[1]))
            if mesh is not None and n_ids > 1 \
                    and n_ids % mesh.shape["data"] == 0:
                # multi-chip: shard_map over the identity axis — each device
                # renders its own identity slice.  (Plain jit on the vmapped
                # program does NOT partition here: vmap batches the U-Net
                # convs via feature_group_count, which the SPMD partitioner
                # cannot split across the group axis.)
                from jax import shard_map
                from jax.sharding import PartitionSpec as P
                vm = shard_map(vm, mesh=mesh,
                               in_specs=(P("data"), P("data")),
                               out_specs=P("data"), check_vma=False)
            return jax.jit(vm)

        self._group_fns = {
            off: group_fn(off, len(ids))
            for off, ids in self.groups.items()
        }
        # per-offset single-identity programs on the full Pallas path
        # (fused U-Net + window/MLP kernels): identity params are traced
        # ARGUMENTS, so one compile serves every identity of the group
        self._fused_fns = {
            off: jax.jit(functools.partial(
                render_one, lip_x=off[0], lip_y=off[1], pallas=True))
            for off in self.groups
        } if use_pallas else {}
        self._single_fns = {}

    def param_shardings(self) -> Dict[tuple, Any]:
        """Public placement view: {offset group -> jax.sharding.Sharding} of
        the stacked identity parameters.  Exists so external checks (the
        driver dryrun, ops tooling) can assert identities are actually
        distributed without reaching into the server's internals."""
        return {off: jax.tree.leaves(tree)[0].sharding
                for off, tree in self._stacked.items()}

    # past this per-identity frame count the sequential fused-kernel path
    # out-runs the vmapped XLA program (the fused U-Net is ~1.4x XLA and
    # needs no cross-identity batching to saturate the chip at batch>=16)
    FUSED_BATCH_THRESHOLD = 16

    def render_all(self, batches: List[Dict[str, Any]]):
        """Serve every identity, one compiled call per offset group.

        batches: per-identity frame batches (same frame-batch size B across
        identities).  Returns a list of outputs indexed by identity.
        Small per-identity batches run the vmapped all-identity XLA
        program; large ones run each identity through the shared fused-
        kernel program (params are traced args — still one compile per
        offset group).
        """
        if len(batches) != self.n_identities:
            raise ValueError(f"need {self.n_identities} batches, "
                             f"got {len(batches)}")
        out: List[Any] = [None] * self.n_identities
        bsz = next(iter(batches[0].values())).shape[0] if batches else 0
        use_fused = self._fused_fns and bsz >= self.FUSED_BATCH_THRESHOLD
        for off, ids in self.groups.items():
            if use_fused:
                # per-identity pytrees are pre-sliced at construction —
                # eager param indexing per call would cost hundreds of
                # tiny device dispatches
                for i in ids:
                    out[i] = self._fused_fns[off](self._param_sets[i],
                                                  batches[i])
                continue
            stacked_batch = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[batches[i] for i in ids])
            if self._identity_sharding is not None and len(ids) > 1:
                stacked_batch = jax.device_put(stacked_batch,
                                               self._identity_sharding)
            res = self._group_fns[off](self._stacked[off], stacked_batch)
            for k, i in enumerate(ids):
                out[i] = jax.tree.map(lambda x: x[k], res)
        return out

    def render_fast(self, identity: int, batch: Dict[str, Any]):
        """Render one identity's batch on the fastest available path (the
        fused-kernel program when the server was built with use_pallas)."""
        off = next(o for o, ids in self.groups.items() if identity in ids)
        if self._fused_fns:
            return self._fused_fns[off](self._param_sets[identity], batch)
        return self.render(identity, batch)

    def render(self, identity: int, batch: Dict[str, Any]):
        """Render a frame batch for one identity (compiled per lip offset)."""
        off = next(o for o, ids in self.groups.items() if identity in ids)
        if off not in self._single_fns:
            import functools
            self._single_fns[off] = jax.jit(functools.partial(
                self._render_one, lip_x=off[0], lip_y=off[1]))
        k = self.groups[off].index(identity)
        params3 = jax.tree.map(lambda x: x[k], self._stacked[off])
        return self._single_fns[off](params3, batch)
