from . import evaluator, index_generator  # noqa: F401
