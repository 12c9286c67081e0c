from . import audit, dedup, explode, merge, multimodal, similarity, skew  # noqa: F401
