from .types import DecoderOutput, Gaussians  # noqa: F401
