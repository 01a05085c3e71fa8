from . import dataset, shims, types, view_samplers  # noqa: F401
