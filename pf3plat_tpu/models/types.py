"""Core model data types (pytrees).

Mirrors the reference's `src/model/types.py:7-12` (`Gaussians`) and
`src/model/decoder/decoder.py:19-22` (`DecoderOutput`), as NamedTuple
pytrees so they flow through jit/vmap/pjit and optax untouched.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax

Array = jax.Array


class Gaussians(NamedTuple):
    """A batch of 3D Gaussians. Shapes: (batch, gaussian, ...)."""

    means: Array        # (b, g, 3)
    covariances: Array  # (b, g, 3, 3)
    harmonics: Array    # (b, g, 3, d_sh)
    opacities: Array    # (b, g)


class DecoderOutput(NamedTuple):
    color: Array                  # (b, v, h, w, 3) channel-last (TPU layout)
    depth: Optional[Array] = None  # (b, v, h, w)
