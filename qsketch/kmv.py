"""KMV (k-minimum-values, "bottom-k") distinct sketch with set algebra.

The one capability the existing cardinality sketches lack: SET
OPERATIONS.  A KMV sketch keeps the k smallest distinct 64-bit hashes
of everything it saw.  Union is a merge (keep the k smallest of both —
canonical, so merges are byte-identical in any order, like every
sketch in this library).  Because the retained hashes are a uniform
sample of the distinct universe below a threshold, two sketches over
the SAME hash function also support intersection / difference /
Jaccard estimates (the theta-sketch construction: Dasgupta et al.,
"Theta-Sketch Framework", and Beyer et al. 2007 on KMV distinct
estimation).

Estimator: with fewer than k distinct hashes the sketch is EXACT
(it holds the whole hashed set).  At capacity, cardinality is the
classic unbiased KMV estimate (k-1) / theta where theta = kth smallest
hash / 2^64.  Set-op estimates intersect the retained samples below
the smaller theta.

Reference contract parity: quotient's Count endpoint
(/root/reference/filter.go — Count over inserted fingerprints) answers
only "how many distinct"; this sketch extends that to "how many
distinct IN COMMON", which training-data curation needs for
cross-source overlap audits.

Serialization: canonical — the payload is the sorted uint64 retained
set, a pure function of abstract state, so merge order never changes
bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from . import base
from .hash import fnv1a64

_TWO64 = float(1 << 64)
_HDR = struct.Struct("<II")  # k, n_retained


@base.register(base.KIND_KMV)
class KMVSketch:
    """Bottom-k distinct sketch over pre-hashed or raw int64 values."""

    def __init__(self, k: int = 4096):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = int(k)
        self.values = np.empty(0, dtype=np.uint64)  # sorted, unique

    # -- updates ---------------------------------------------------------
    def update(self, values: np.ndarray, pre_hashed: bool = False) -> None:
        if len(values) == 0:
            return
        h = values.view(np.uint64) if pre_hashed else fnv1a64(
            np.asarray(values, dtype=np.int64).view(np.uint64))
        self.values = self._retain(np.concatenate([self.values, h]))

    def _retain(self, h: np.ndarray) -> np.ndarray:
        u = np.unique(h)  # sorts
        return u[: self.k] if len(u) > self.k else u

    # -- merge -----------------------------------------------------------
    def merge(self, other: "KMVSketch") -> "KMVSketch":
        if self.k != other.k:
            raise ValueError(
                f"cannot merge KMV sketches with k={self.k} and k={other.k}")
        out = KMVSketch(self.k)
        out.values = self._retain(
            np.concatenate([self.values, other.values]))
        return out

    # -- queries ---------------------------------------------------------
    @property
    def saturated(self) -> bool:
        return len(self.values) >= self.k

    def _theta_raw(self) -> int:
        """EXACT inclusion threshold as an integer: retained hashes are

        precisely the distinct hashes < this value (2^64 while
        unsaturated = everything retained).  Kept as a python int so
        set-op thresholds compare exactly — a float theta would round
        near the top of the 64-bit range and fuzz the sample boundary."""
        if not self.saturated:
            return 1 << 64
        return int(self.values[self.k - 1])  # kth smallest

    @property
    def theta(self) -> float:
        """Float view of the inclusion threshold (for display/tests)."""
        return self._theta_raw() / _TWO64

    def estimate(self) -> float:
        if not self.saturated:
            return float(len(self.values))  # EXACT below capacity
        return (self.k - 1) * _TWO64 / self._theta_raw()

    def cardinality(self) -> float:
        """Alias so the generic decode paths (grouped_cardinality, SQL
        estimate UDFs) treat KMV like every other distinct sketch."""
        return self.estimate()

    def intersection_estimate(self, other: "KMVSketch") -> float:
        """Estimated |A ∩ B| (exact when both sketches are unsaturated)."""
        raw = min(self._theta_raw(), other._theta_raw())
        common = np.intersect1d(self._below(raw), other._below(raw),
                                assume_unique=True)
        return len(common) * _TWO64 / raw

    def union_estimate(self, other: "KMVSketch") -> float:
        return self.merge(other).estimate()

    def jaccard_estimate(self, other: "KMVSketch") -> float:
        """|A ∩ B| / |A ∪ B| from the common sample below min-theta."""
        raw = min(self._theta_raw(), other._theta_raw())
        a = self._below(raw)
        b = other._below(raw)
        union = np.union1d(a, b)
        if len(union) == 0:
            return 0.0
        inter = len(np.intersect1d(a, b, assume_unique=True))
        return inter / len(union)

    def difference_estimate(self, other: "KMVSketch") -> float:
        """Estimated |A \\ B|."""
        raw = min(self._theta_raw(), other._theta_raw())
        only = np.setdiff1d(self._below(raw), other._below(raw),
                            assume_unique=True)
        return len(only) * _TWO64 / raw

    def _below(self, raw_threshold: int) -> np.ndarray:
        """Retained hashes strictly below the EXACT integer threshold."""
        if raw_threshold >= 1 << 64:
            return self.values
        return self.values[self.values < np.uint64(raw_threshold)]

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        payload = _HDR.pack(self.k, len(self.values)) + self.values.tobytes()
        return base.frame(base.KIND_KMV, payload)

    @classmethod
    def _from_payload(cls, payload: bytes, version: int) -> "KMVSketch":
        k, n = _HDR.unpack_from(payload, 0)
        sk = cls(k)
        vals = np.frombuffer(payload, dtype=np.uint64, count=n,
                             offset=_HDR.size)
        if len(vals) != n:
            raise ValueError("truncated KMV payload")
        sk.values = vals.copy()  # frombuffer views are read-only
        return sk
