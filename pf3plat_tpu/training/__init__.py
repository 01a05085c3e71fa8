from . import losses, metrics, train  # noqa: F401
