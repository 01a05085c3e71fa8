from . import camera_sync, procrustes, projection, sh, transforms  # noqa: F401
