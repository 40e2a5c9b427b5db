from . import boxes, lap  # noqa: F401
