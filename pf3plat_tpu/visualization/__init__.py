from . import layout, trajectories  # noqa: F401
