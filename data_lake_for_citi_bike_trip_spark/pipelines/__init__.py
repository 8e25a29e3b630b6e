from . import elt

__all__ = ["elt"]
