"""qsketch — PySpark-native distributed sketch / approximate-aggregation library.

From-scratch rebuild of the capabilities of micheleriva/quotient
(/root/reference, read-only) as mergeable two-phase Spark aggregations:
quotient filter at the core, plus Bloom, HLL, count-min, KLL and
t-digest.  See SURVEY.md for the blueprint.
"""

from . import base
from .bloom import BloomFilter
from .cms import CountMinSketch
from .dyadic import DyadicCMQuantiles
from .hash import fnv1a64, fnv1a64_bytes, fnv1a64_str_array, splitmix64
from .hll import HyperLogLog
from .kll import KLLSketch
from .kmv import KMVSketch
from .quotient import QuotientFilter, QuotientFilterFullError
from .tdigest import TDigest

__all__ = [
    "base",
    "BloomFilter",
    "CountMinSketch",
    "DyadicCMQuantiles",
    "HyperLogLog",
    "KLLSketch",
    "KMVSketch",
    "QuotientFilter",
    "QuotientFilterFullError",
    "TDigest",
    "fnv1a64",
    "fnv1a64_bytes",
    "fnv1a64_str_array",
    "splitmix64",
]
