from .hashing import h64, duck_h64
from .metrics import observe_counts
from .vectors import dot, l2_norm, cosine

__all__ = ["h64", "duck_h64", "observe_counts", "dot", "l2_norm", "cosine"]
