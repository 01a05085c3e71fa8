"""Public rasterizer API: batched differentiable rendering + depth modes.

Mirrors the surface of the reference's `render_cuda` / `render_depth_cuda` /
`render_cuda_orthographic` (`src/model/decoder/cuda_splatting.py:47-269`) —
including the scale-invariant 1/near world renormalization (`:63-70`) and the
depth rendering modes (`:223-269`) — but fully batched under vmap/jit with no
per-sample Python loop, returning channel-last (b, h, w, c) images
(TPU-native layout; the reference returns channel-first).

`impl` selects the compositing backend (consolidated set, one per role):
  * "streamed"   — PRODUCTION DEFAULT: sort-carried Pallas pipeline with
                   in-kernel DMA streaming + mesh sharding (streamed.py)
  * "pallas"     — dense-table Pallas kernels; the alternate hardware path
                   and bench fallback (pallas_impl.py)
  * "tiled"      — pure-XLA binned scan; the CPU-fast reference path
  * "bruteforce" — O(pixels x gaussians) oracle for tests

(Two earlier experimental backends were removed after losing hardware
A/Bs to "streamed": `anchored` — per-anchor-segment DMA with in-kernel
bitonic merge, 2.67 Mrays/s vs streamed 4.88 on the bench scene — and the
standalone XLA `sharded` variant, superseded by `mesh=` on the
streamed/pallas paths. See git history for both.)
"""

from __future__ import annotations

import math
from typing import Literal

import jax
import jax.numpy as jnp

from ...geometry.projection import se3_inverse
from .binning import bin_gaussians, bin_gaussians_batched
from .project import make_camera, project_gaussians
from .reference_impl import composite_bruteforce
from .tiled import composite_tiles
from .types import RasterizeConfig

Array = jax.Array

DepthRenderingMode = Literal["depth", "disparity", "relative_disparity", "log"]

DEFAULT_CONFIG = RasterizeConfig()


def render(
    extrinsics: Array,       # (b, 4, 4) c2w
    intrinsics: Array,       # (b, 3, 3) normalized
    near: Array,             # (b,)
    far: Array,              # (b,)
    image_shape: tuple[int, int],
    background: Array,       # (b, c)
    means: Array,            # (b, n, 3)
    covariances: Array,      # (b, n, 3, 3)
    sh: Array,               # (b, n, c, d_sh)
    opacities: Array,        # (b, n)
    scale_invariant: bool = True,
    use_sh: bool = True,
    impl: str = "tiled",
    config: RasterizeConfig = DEFAULT_CONFIG,
    mesh=None,
) -> Array:
    """Render each batch element's gaussians into its camera. -> (b, h, w, c).

    `mesh`: optional `jax.sharding.Mesh` — shards the pallas compositing's
    (batch * tiles) rows over all mesh axes (see pallas_impl); other impls
    ignore it.
    """
    if scale_invariant:
        # Reference `cuda_splatting.py:63-70`: put the world in a numerically
        # friendly range by scaling so near == 1.
        scale = 1.0 / near
        extrinsics = extrinsics.at[..., :3, 3].mul(scale[:, None])
        covariances = covariances * (scale[:, None, None, None] ** 2)
        means = means * scale[:, None, None]
        near = near * scale
        far = far * scale

    d_sh = sh.shape[-1]
    sh_degree = int(math.isqrt(d_sh)) - 1

    camera = make_camera(extrinsics, intrinsics, image_shape)

    if impl == "streamed":
        from .streamed import composite_streamed_batched

        screen = jax.vmap(
            lambda cam, m, c, o, s: project_gaussians(
                cam, m, c, o, s, sh_degree, config, use_sh=use_sh
            )
        )(camera, means, covariances, opacities, sh)
        return composite_streamed_batched(
            screen, image_shape, background, config, mesh=mesh
        )

    if impl == "pallas":
        # Flat-batch path: projection is pure elementwise math (vmap is
        # free), but binning + compositing fold the batch into the tile
        # grid — batching those under vmap lowers ~4x slower on TPU.
        from .pallas_impl import composite_tiles_pallas_batched

        screen = jax.vmap(
            lambda cam, m, c, o, s: project_gaussians(
                cam, m, c, o, s, sh_degree, config, use_sh=use_sh
            )
        )(camera, means, covariances, opacities, sh)
        binned = bin_gaussians_batched(screen, image_shape, config)
        return composite_tiles_pallas_batched(
            screen, binned, image_shape, background, config, mesh=mesh
        )

    def render_one(cam, mean, cov, op, sh_one, bg):
        screen = project_gaussians(
            cam, mean, cov, op, sh_one, sh_degree, config, use_sh=use_sh
        )
        if impl == "bruteforce":
            return composite_bruteforce(screen, image_shape, bg, config)
        elif impl == "tiled":
            binned = bin_gaussians(screen, image_shape, config)
            return composite_tiles(screen, binned, image_shape, bg, config)
        raise ValueError(f"unknown rasterizer impl: {impl}")

    return jax.vmap(render_one)(camera, means, covariances, opacities, sh, background)


def depth_to_relative_disparity(depth: Array, near: Array, far: Array) -> Array:
    """Map depth to [0, 1] relative disparity (reference
    `src/model/encoder/costvolume/conversions.py`)."""
    disp_near = 1.0 / near
    disp_far = 1.0 / far
    disp = 1.0 / jnp.maximum(depth, 1e-12)
    return 1.0 - (disp - disp_far) / jnp.maximum(disp_near - disp_far, 1e-12)


def render_depth(
    extrinsics: Array,
    intrinsics: Array,
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    means: Array,
    covariances: Array,
    opacities: Array,
    scale_invariant: bool = True,
    mode: DepthRenderingMode = "depth",
    impl: str = "tiled",
    config: RasterizeConfig = DEFAULT_CONFIG,
    mesh=None,
) -> Array:
    """Render camera-space depth by splatting per-gaussian Z as color.

    Mirrors reference `render_depth_cuda` (`cuda_splatting.py:226-269`):
    the "color" of each gaussian is its camera-space z (transformed per
    `mode`), rendered with black background. -> (b, h, w).
    """
    w2c = se3_inverse(extrinsics)
    cam_z = (
        jnp.einsum("bij,bnj->bni", w2c[:, 2:3, :3], means)[..., 0]
        + w2c[:, 2, 3][:, None]
    )
    fake = cam_z
    if mode == "disparity":
        fake = 1.0 / jnp.maximum(cam_z, 1e-12)
    elif mode == "relative_disparity":
        fake = depth_to_relative_disparity(cam_z, near[:, None], far[:, None])
    elif mode == "log":
        # Reference quirk preserved: min with near THEN max with far
        # (`cuda_splatting.py:254`), i.e. clamp collapses to `far` when
        # far > near; kept for parity.
        fake = jnp.log(jnp.maximum(jnp.minimum(cam_z, near[:, None]), far[:, None]))

    b = means.shape[0]
    result = render(
        extrinsics,
        intrinsics,
        near,
        far,
        image_shape,
        jnp.zeros((b, 1), means.dtype),
        means,
        covariances,
        fake[..., None, None],  # (b, n, 1 channel, 1 "sh")
        opacities,
        scale_invariant=scale_invariant,
        use_sh=False,
        impl=impl,
        config=config,
        mesh=mesh,
    )
    return result[..., 0]


def render_orthographic(
    extrinsics: Array,
    width: Array,
    height: Array,
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    background: Array,
    means: Array,
    covariances: Array,
    sh: Array,
    opacities: Array,
    fov_degrees: float = 0.1,
    use_sh: bool = True,
    impl: str = "tiled",
    config: RasterizeConfig = DEFAULT_CONFIG,
) -> Array:
    """Fake-orthographic render: move the camera far back with a tiny fov.

    Mirrors reference `render_cuda_orthographic` (`cuda_splatting.py:130-221`);
    used by visualization (top-down gaussian projections).
    """
    fov_x = jnp.deg2rad(jnp.asarray(fov_degrees, means.dtype))
    tan_fov_x = jnp.tan(0.5 * fov_x)
    distance_to_near = (0.5 * width) / tan_fov_x
    tan_fov_y = 0.5 * height / distance_to_near
    near = near + distance_to_near
    far = far + distance_to_near
    move_back = jnp.eye(4, dtype=extrinsics.dtype).at[2, 3].set(1.0)

    b = extrinsics.shape[0]
    move = jnp.broadcast_to(jnp.eye(4, dtype=extrinsics.dtype), (b, 4, 4))
    move = move.at[:, 2, 3].set(-distance_to_near)
    extrinsics = jnp.einsum("bij,bjk->bik", extrinsics, move)

    # Build normalized intrinsics equivalent to the symmetric fov frustum.
    h, w = image_shape
    fx = 1.0 / (2.0 * tan_fov_x)
    fy = 1.0 / (2.0 * tan_fov_y)
    intr = jnp.zeros((b, 3, 3), extrinsics.dtype)
    intr = intr.at[:, 0, 0].set(jnp.broadcast_to(fx, (b,)))
    intr = intr.at[:, 1, 1].set(jnp.broadcast_to(fy, (b,)))
    intr = intr.at[:, 0, 2].set(0.5)
    intr = intr.at[:, 1, 2].set(0.5)
    intr = intr.at[:, 2, 2].set(1.0)

    return render(
        extrinsics,
        intr,
        near,
        far,
        image_shape,
        background,
        means,
        covariances,
        sh,
        opacities,
        scale_invariant=False,
        use_sh=use_sh,
        impl=impl,
        config=config,
    )
