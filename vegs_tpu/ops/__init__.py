"""Rasterization kernels and supporting ops (the TPU-native replacement for the
reference's CUDA `diff_gaussian_rasterization` extension, SURVEY.md §2.3).

Pipeline (mirrors the CUDA design's stages, re-architected for XLA/Pallas):
  projection.py   — frustum cull, perspective project, EWA 2D conic, SH->RGB
  binning.py      — tile expansion, (tile|depth) key sort, tile ranges
  blend_ref.py    — pure-XLA per-tile alpha compositing (golden reference; CPU-runnable)
  blend_pallas.py — Pallas TPU kernels for the compositing fwd/bwd
  rasterize.py    — end-to-end differentiable rasterizer with the reference's
                    6-output contract (rgb, depth, quat, scale, alpha, radii)
  knn.py          — mean-sq-distance-to-kNN for scale init (simple-knn parity)
"""
