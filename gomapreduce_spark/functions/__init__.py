from .hashing import h64, duck_h64
from .vectors import dot, l2_norm, cosine

__all__ = ["h64", "duck_h64", "dot", "l2_norm", "cosine"]
