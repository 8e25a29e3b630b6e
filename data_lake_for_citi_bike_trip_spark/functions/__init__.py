from . import keys, text, vectors

__all__ = ["keys", "text", "vectors"]
