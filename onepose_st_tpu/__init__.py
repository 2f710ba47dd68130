"""onepose_st_tpu — TPU-native one-shot object pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
OnePose_ST pipeline (mizeller/OnePose_ST):

  * detector-free dense 2D-2D matching (LoFTR-style coarse-to-fine)
  * keypoint-free structure-from-motion with depth-only / full bundle
    adjustment (Levenberg-Marquardt, Gauss-Newton normal equations on device)
  * 2D-3D attention matcher (OnePose++ GATs-style) with vectorized RANSAC PnP
  * temporal pose refinement via windowed point tracking
  * multi-host execution over a `jax.sharding.Mesh` (data/track sharding,
    collective reductions) — no Ray, no COLMAP, no DeepLM binaries.

Package layout:
  core/      geometry & camera math (pure JAX, jit-able, static shapes)
  ops/       hot ops: Pallas kernels + XLA compositions (attention, dual-softmax)
  models/    flax modules: backbone, transformers, matchers
  sfm/       keypoint-free SfM engine (pairs, tracks, triangulation, BA)
  solvers/   RANSAC PnP / affine RANSAC / LM optimizers
  train/     losses, supervision, sharded train step, checkpointing
  infer/     object detector, pose inference pipeline, temporal tracker
  data/      host-side dataset parsers & synthetic scene generation
  parallel/  mesh construction and sharding helpers
  utils/     profiling, logging
"""

__version__ = "0.1.0"
