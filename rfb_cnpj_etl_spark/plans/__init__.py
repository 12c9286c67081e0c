from . import checkpoint, queries  # noqa: F401
