from .builder import build_dataset  # noqa: F401
