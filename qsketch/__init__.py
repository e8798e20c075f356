from .quotient import QuotientFilter, QuotientFilterFullError
from .hash import fnv1a64, fnv1a64_bytes, splitmix64
from . import base

__all__ = ["QuotientFilter", "QuotientFilterFullError", "fnv1a64", "fnv1a64_bytes", "splitmix64", "base"]
