"""VEGS-TPU: a TPU-native (JAX/XLA/Pallas) framework for urban-scene 3D Gaussian
Splatting with learned priors — a from-scratch re-design of the capabilities of
deepshwang/vegs (ECCV'24) for TPU hardware.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  L0  vegs_tpu.ops        — Pallas/XLA rasterization kernels (project/bin/blend)
  L1  vegs_tpu.render     — differentiable renderer API (render/render_all/render_dyn)
  L2  vegs_tpu.gaussians  — Gaussian field pytree + activations + densify/prune
  L3  vegs_tpu.scene      — cameras, dataset readers (KITTI-360/KITTI/COLMAP/Blender)
  L4  vegs_tpu.losses     — photometric/normal-guidance/perceptual/SD-LoRA guidance
  L5  vegs_tpu.train      — training driver
  L6  vegs_tpu.render_video, vegs_tpu.metrics — offline tools
  L7  vegs_tpu.config     — config tree (parameter names mirror the reference CLI)
  ∥   vegs_tpu.parallel   — device-mesh sharding of the train step (shard_map/pjit)
"""

__version__ = "0.1.0"
