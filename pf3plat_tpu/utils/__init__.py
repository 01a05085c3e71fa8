from . import benchmarker, config, ply_export  # noqa: F401
