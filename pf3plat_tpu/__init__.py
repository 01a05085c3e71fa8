"""pf3plat_tpu — TPU-native pose-free feed-forward 3D Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
cvlab-kaist/PF3plat (arXiv 2410.22128): given N uncalibrated RGB images,
a single feed-forward pass predicts multi-view-consistent metric depth,
camera poses, and a pixel-aligned 3D Gaussian field, rendered to novel
views with a differentiable TPU tile rasterizer.

Design notes (TPU-first, not a port):
  * compute path: pure-functional JAX under jit/pjit; Pallas kernels for
    the splatting hot loop (MXU matmul formulation of alpha compositing);
  * parallelism: `jax.sharding.Mesh` with a `data` axis (DP) and a `tile`
    axis (rasterizer pixel/tile sharding) — XLA collectives over ICI;
  * static shapes everywhere: fixed-K keypoints, padded tile bins,
    fixed-iteration RANSAC (no data-dependent Python control flow).
"""

__version__ = "0.1.0"
