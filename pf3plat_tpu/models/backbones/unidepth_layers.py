"""Faithful Flax ports of the UniDepth-V2 decoder's layer primitives.

Transcribed layer-for-layer from the reference's vendored UniDepth
(`/root/reference/src/model/unidepth/layers/{mlp,attention,nystrom_attention,
convnext,upsample,positional_encoding}.py` and
`utils/{geometric,positional_embedding}.py`), with parameter layouts chosen
for 1:1 torch-checkpoint conversion (see `weight_convert.convert_unidepth`).

TPU-first notes:
  * every torch `F.interpolate` becomes a pair of precomputed 1D
    interpolation matrices applied on the MXU (`interp_matrix` /
    `resize_image`), reproducing torch's exact bilinear/bicubic kernels
    including `align_corners` and `antialias` semantics — `jax.image.resize`
    matches none of torch's variants bit-for-bit, matmuls match all of them
    and are faster on TPU than gather-based resampling;
  * the reference's `NystromBlock` (`nystrom_attention.py:12-74`) reshapes
    tokens to ``(b, n, heads, dim)`` and hands them to xformers'
    NystromAttention, whose sequence axis is ``-2`` — the *heads* axis.
    Since heads (<= 8) is always below the 128-landmark threshold, xformers
    falls back to dense attention **across the heads of each token**.  The
    pretrained weights were trained under this behavior, so the port
    reproduces it exactly (`nystrom_head_attention`) rather than
    "fixing" it to spatial attention.
"""

from __future__ import annotations

import math
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# torch-exact separable resampling as matmuls
# ---------------------------------------------------------------------------


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel, torch's bicubic (a = -0.75)."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


def _linear_kernel(t: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(t))


@lru_cache(maxsize=256)
def interp_matrix(
    n_in: int,
    n_out: int,
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
) -> np.ndarray:
    """(n_out, n_in) row-stochastic interpolation matrix matching torch's
    `F.interpolate` along one axis (modes: bilinear/bicubic; replicate-edge
    handling via index clamping, antialias via kernel dilation by the scale
    factor, exactly like torch's AA resampling)."""
    if n_in == n_out and not align_corners:
        return np.eye(n_in, dtype=np.float32)
    kernel, support = {
        "bilinear": (_linear_kernel, 1.0),
        "bicubic": (_cubic_kernel, 2.0),
    }[mode]
    if mode == "bicubic" and antialias:
        # torch's AA resampling matches PIL, whose bicubic uses a=-0.5
        # (non-AA keeps the legacy a=-0.75 kernel)
        kernel = lambda t: _cubic_kernel(t, a=-0.5)  # noqa: E731
    i_out = np.arange(n_out, dtype=np.float64)
    if align_corners:
        x = i_out * ((n_in - 1) / max(n_out - 1, 1))
    else:
        x = (i_out + 0.5) * (n_in / n_out) - 0.5
    scale = max(n_in / n_out, 1.0) if antialias else 1.0
    sup = support * scale
    lo = np.floor(x - sup + 1).astype(np.int64)
    taps = int(np.ceil(2 * sup)) + 1
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for k in range(taps):
        idx = lo + k
        wk = kernel((idx - x) / scale)
        if antialias:
            # torch's AA resampling DROPS out-of-range taps and renormalizes
            # over the surviving window (aten separable upsample_aa).
            ok = (idx >= 0) & (idx < n_in)
            np.add.at(
                w,
                (np.arange(n_out)[ok], idx[ok]),
                wk[ok],
            )
        else:
            # non-AA interpolate clamps indices (replicate edges)
            np.add.at(w, (np.arange(n_out), np.clip(idx, 0, n_in - 1)), wk)
    if antialias:
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def resize_image(
    x: Array,
    new_hw: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
) -> Array:
    """(b, h, w, c) -> (b, H, W, c) via two MXU matmuls (torch-parity)."""
    h, w = x.shape[1], x.shape[2]
    nh, nw = new_hw
    if (h, w) == (nh, nw):
        return x
    ah = jnp.asarray(interp_matrix(h, nh, mode, align_corners, antialias))
    aw = jnp.asarray(interp_matrix(w, nw, mode, align_corners, antialias))
    x = jnp.einsum("Hh,bhwc->bHwc", ah, x)
    return jnp.einsum("Ww,bhwc->bhWc", aw, x)


def flat_interpolate(
    x: Array,
    old: tuple[int, int],
    new: tuple[int, int],
    antialias: bool = True,
    mode: str = "bilinear",
) -> Array:
    """Token-grid resample, reference `utils/geometric.py:flat_interpolate`:
    (b, old_h*old_w, c) -> (b, new_h*new_w, c)."""
    if tuple(old) == tuple(new):
        return x
    b, _, c = x.shape
    img = x.reshape(b, old[0], old[1], c)
    img = resize_image(img, tuple(new), mode=mode, antialias=antialias)
    return img.reshape(b, new[0] * new[1], c)


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------


def generate_rays(intrinsics: Array, image_shape: tuple[int, int]) -> tuple[Array, Array]:
    """Pixel-center unit rays + (theta, phi) angles for pixel-unit K
    (reference `utils/geometric.py:generate_rays`). -> ((b, h*w, 3), (b, h*w, 2))."""
    h, w = image_shape
    ys = jnp.arange(h, dtype=intrinsics.dtype) + 0.5
    xs = jnp.arange(w, dtype=intrinsics.dtype) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w)
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    px = gx.reshape(-1)[None, :]
    py = gy.reshape(-1)[None, :]
    dx = (px - cx) / fx
    dy = (py - cy) / fy
    dz = jnp.ones_like(dx)
    d = jnp.stack([dx, dy, dz], axis=-1)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    theta = jnp.arctan2(d[..., 0], d[..., 2])
    phi = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    return d, jnp.stack([theta, phi], axis=-1)


def spherical_zbuffer_to_euclidean(spherical: Array) -> Array:
    """(..., 3) [theta, phi, z] -> (..., 3) xyz (reference
    `utils/geometric.py:54-70`)."""
    theta, phi, z = spherical[..., 0], spherical[..., 1], spherical[..., 2]
    x = z * jnp.tan(theta)
    y = z / jnp.tan(phi) / jnp.cos(theta)
    return jnp.stack([x, y, z], axis=-1)


def generate_fourier_features(
    x: Array,
    dim: int = 512,
    max_freq: int = 64,
    use_cos: bool = False,
    use_log: bool = False,
    cat_orig: bool = False,
) -> Array:
    """Reference `utils/positional_embedding.py:generate_fourier_features`."""
    input_dim = x.shape[-1]
    num_bands = dim // (2 * input_dim) if use_cos else dim // input_dim
    if use_log:
        scales = 2.0 ** jnp.linspace(
            0.0, math.log2(max_freq), num_bands, dtype=x.dtype
        )
    else:
        scales = jnp.linspace(1.0, max_freq / 2, num_bands, dtype=x.dtype)
    ang = x[..., None] * scales * jnp.pi
    feats = (
        jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        if use_cos
        else jnp.sin(ang)
    )
    feats = feats.reshape(*x.shape[:-1], -1)
    if cat_orig:
        return jnp.concatenate([feats, x], axis=-1)
    return feats


def position_embedding_sine(
    b: int, h: int, w: int, num_pos_feats: int, dtype=jnp.float32
) -> Array:
    """Reference `layers/positional_encoding.py:PositionEmbeddingSine`
    (normalize=True, scale=2*pi), returned token-flat: (b, h*w, 2*num_pos_feats)."""
    scale = 2 * math.pi
    eps = 1e-6
    y_embed = jnp.broadcast_to(
        jnp.arange(1, h + 1, dtype=dtype)[:, None], (h, w)
    )
    x_embed = jnp.broadcast_to(jnp.arange(1, w + 1, dtype=dtype)[None, :], (h, w))
    y_embed = y_embed / (h + eps) * scale
    x_embed = x_embed / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=dtype)
    dim_t = 10000.0 ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin on even, cos on odd band indices
    pos_x = jnp.stack(
        [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1).reshape(1, h * w, -1)
    return jnp.broadcast_to(pos, (b, h * w, pos.shape[-1]))


# ---------------------------------------------------------------------------
# layer modules
# ---------------------------------------------------------------------------


class MLPF(nn.Module):
    """Reference `layers/mlp.py:MLP`: LayerNorm -> Linear -> GELU -> Linear."""

    dim: int
    expansion: int = 4
    output_dim: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = int(self.dim * self.expansion)
        out = self.output_dim or self.dim
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(hidden, name="proj1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(out, name="proj2")(x)


def _sdpa(q: Array, k: Array, v: Array) -> Array:
    """softmax(q k^T / sqrt(d)) v over the -2 axis (torch SDPA semantics)."""
    d = q.shape[-1]
    logits = jnp.einsum("...nd,...md->...nm", q, k) / math.sqrt(d)
    return jnp.einsum(
        "...nm,...md->...nd", jax.nn.softmax(logits, axis=-1), v
    )


class AttentionBlockF(nn.Module):
    """Reference `layers/attention.py:AttentionBlock` (token attention,
    heads on axis -3: `b h n d`)."""

    dim: int
    num_heads: int = 4
    expansion: int = 4
    context_dim: int | None = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        context: Array | None = None,
        pos_embed: Array | None = None,
        pos_embed_context: Array | None = None,
    ) -> Array:
        h = self.num_heads
        d = self.dim
        ctx = x if context is None else context
        y = nn.LayerNorm(name="norm_attnx")(x)
        c = nn.LayerNorm(name="norm_attnctx")(ctx)
        kv = nn.Dense(2 * d, name="kv")(c)
        b, n, _ = c.shape
        # torch layout: "b n (kv h d)" -> kv-major split, then heads
        kv = kv.reshape(b, n, 2, h, d // h)
        k, v = kv[:, :, 0], kv[:, :, 1]  # (b, n, h, hd)
        q = nn.Dense(d, name="q")(y).reshape(b, y.shape[1], h, d // h)
        if pos_embed is not None:
            q = q + pos_embed.reshape(b, y.shape[1], h, d // h)
        if pos_embed_context is not None:
            k = k + pos_embed_context.reshape(b, n, h, d // h)
        out = _sdpa(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2)
        ).swapaxes(1, 2).reshape(b, y.shape[1], d)
        out = nn.Dense(d, name="out")(out)
        ls1 = self.param("ls1", nn.initializers.ones, (d,))
        x = x + ls1 * out
        ls2 = self.param("ls2", nn.initializers.ones, (d,))
        x = x + ls2 * MLPF(d, self.expansion, name="mlp")(x)
        return x


class NystromBlockF(nn.Module):
    """Reference `layers/nystrom_attention.py:NystromBlock`.

    The torch module feeds `(b, n, heads, hd)` tensors to xformers'
    NystromAttention, whose sequence axis is -2 == the *heads* axis; with
    heads < num_landmarks it computes dense attention across each token's
    heads (see module docstring). Reproduced verbatim.
    """

    dim: int
    num_heads: int = 4
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, pos_embed: Array | None = None) -> Array:
        h = self.num_heads
        d = self.dim
        y = nn.LayerNorm(name="norm_attnx")(x)
        # self-attention: the context is the (pre-norm) x, normed separately
        c = nn.LayerNorm(name="norm_attnctx")(x)
        kv = nn.Dense(2 * d, name="kv")(c)
        b, n, _ = y.shape
        kv = kv.reshape(b, n, 2, h, d // h)
        k, v = kv[:, :, 0], kv[:, :, 1]  # (b, n, h, hd)
        q = nn.Dense(d, name="q")(y).reshape(b, n, h, d // h)
        if pos_embed is not None:
            q = q + pos_embed.reshape(b, n, h, d // h)
        out = _sdpa(q, k, v)  # attention over the heads axis (-2)
        out = out.reshape(b, n, d)
        out = nn.Dense(d, name="out")(out)
        ls1 = self.param("ls1", nn.initializers.ones, (d,))
        x = x + ls1 * out
        ls2 = self.param("ls2", nn.initializers.ones, (d,))
        x = x + ls2 * MLPF(d, self.expansion, name="mlp")(x)
        return x


class CvnxtBlockF(nn.Module):
    """Reference `layers/convnext.py:CvnxtBlock` (NHWC)."""

    dim: int
    kernel_size: int = 7
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dim
        inp = x
        x = nn.Conv(
            d, (self.kernel_size, self.kernel_size),
            feature_group_count=d, name="dwconv",
        )(x)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(self.expansion * d, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(d, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.ones, (d,))
        return inp + gamma * x


def pixel_shuffle(x: Array, r: int = 2) -> Array:
    """torch nn.PixelShuffle in NHWC: (b, h, w, c) -> (b, rh, rw, c/r^2),
    channel index = c_out * r^2 + di * r + dj."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, co)


class ConvUpsampleShuffleResidualF(nn.Module):
    """Reference `layers/upsample.py:ConvUpsampleShuffleResidual`:
    2x CvnxtBlock -> [PixelShuffle, depthwise 7x7, ReLU, 3x3 c/4->c/2]
    + residual [1x1 c->c/2, bilinear 2x (align_corners=True)].
    Input/output NHWC; returns token-flat (b, 4hw, c/2)."""

    dim: int
    expansion: int = 4
    kernel_size: int = 7
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dim
        for i in range(self.num_layers):
            x = CvnxtBlockF(
                d, self.kernel_size, self.expansion, name=f"conv_{i}"
            )(x)
        up = pixel_shuffle(x, 2)
        up = nn.Conv(
            d // 4, (7, 7), feature_group_count=d // 4, name="shuf_dw"
        )(up)
        up = nn.relu(up)
        up = nn.Conv(d // 2, (3, 3), name="shuf_pw")(up)
        res = nn.Conv(d // 2, (1, 1), name="res_conv")(x)
        res = resize_image(
            res, (x.shape[1] * 2, x.shape[2] * 2), "bilinear",
            align_corners=True,
        )
        out = up + res
        b, h, w, c = out.shape
        return out.reshape(b, h * w, c)


class ListAdapterF(nn.Module):
    """Reference `decoder.py:14-30`: per-chunk LayerNorm -> Linear -> GELU."""

    input_dims: tuple[int, ...]
    hidden_dim: int

    @nn.compact
    def __call__(self, xs: list[Array]) -> list[Array]:
        out = []
        for i, x in enumerate(xs):
            y = nn.LayerNorm(name=f"ln_{i}")(x)
            y = nn.Dense(self.hidden_dim, name=f"fc_{i}")(y)
            out.append(nn.gelu(y, approximate=False))
        return out
