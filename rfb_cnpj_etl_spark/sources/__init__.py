from . import changelog  # noqa: F401
