"""speech2lip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) reimplementation of the
Speech2Lip capability set (reference: CVMI-Lab/Speech2Lip).

The framework learns a person-specific audio→lip-video renderer from a single
short talking-head video and synthesizes photorealistic lip-synced frames for
arbitrary speech.  It is a ground-up TPU-first design, not a port:

- compute path: pure-functional JAX modules, jitted end-to-end, Pallas kernels
  for the hot fused-MLP renderer, NHWC layouts, bf16-friendly matmul chains;
- parallelism: `jax.sharding.Mesh` + pjit data/pixel sharding replacing the
  reference's NCCL DistributedDataParallel (reference train.py:58-61);
- data contract: byte-compatible with the reference's preprocessed dataset
  tree (reference src/data/someones_lip_dataset.py).

Package layout (see SURVEY.md §7):
  core/      config (YAML inherit), checkpointing, logging/metrics
  ops/       geometry, grid-sample, coords, embedders, audio DSP, Pallas kernels
  models/    talking_face, unet_light, syncnet, lpips, deepspeech
  data/      dataset-contract reader, sample pytrees, batching
  train/     loss library, jitted train step, schedules, trainer loop
  infer/     jitted frame renderer, batched serving path
  parallel/  mesh + sharding rules (DP over frames, SP over pixels)
  cli/       train / infer entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"
