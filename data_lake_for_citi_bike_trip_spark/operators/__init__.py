from . import analytics, asof, dedup, multimodal, similarity, staging, star, text

__all__ = [
    "analytics",
    "asof",
    "dedup",
    "multimodal",
    "similarity",
    "staging",
    "star",
    "text",
]
