from .api import (  # noqa: F401
    DepthRenderingMode,
    depth_to_relative_disparity,
    render,
    render_depth,
    render_orthographic,
)
from .types import Camera, RasterizeConfig, ScreenGaussians  # noqa: F401
