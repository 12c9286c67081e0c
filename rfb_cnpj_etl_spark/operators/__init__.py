from . import audit, dedup, explode, merge, similarity, skew  # noqa: F401
