"""SQL surface: register sketch probes as Spark SQL functions.

Lets SQL users consume finished sketch states without touching the
Python API:

    register_membership(spark, "qf_contains", state_bytes)
    spark.sql("SELECT token, qf_contains(token_id) AS hit FROM toks")

Each registration broadcasts one state and binds a vectorized
pandas_udf under the given name (Arrow-batched, deserialized once per
executor).
"""

from __future__ import annotations

import uuid

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from .agg import _cached_sketch


def _int_probe_values(s: pd.Series):
    """(int64 values for non-null rows, notna mask) — recovers a
    nullable long column that pandas widened to float64 when exact
    (|x| <= 2^53), fails loudly otherwise."""
    import numpy as np

    arr = s.to_numpy()
    if arr.dtype.kind in "iu":  # non-null integer column: zero-copy path
        return arr, None
    mask = pd.notna(s).to_numpy()
    if arr.dtype.kind == "f":
        vals = arr[mask]
        if np.any(np.abs(vals) > 2.0**53):
            raise TypeError(
                "nullable column widened to float64 with |values| > 2^53 "
                "— precision lost; coalesce NULLs JVM-side before probing")
        if np.any(vals != np.floor(vals)):
            raise TypeError("sketch probes take integer ids, got "
                            "fractional doubles")
        return vals.astype(np.int64), mask
    raise TypeError("sketch probes take integer ids; map strings "
                    "JVM-side (xxhash64) first")


def register_membership(spark: SparkSession, name: str,
                        sketch_bytes: bytes) -> None:
    bc = spark.sparkContext.broadcast(sketch_bytes)
    token = uuid.uuid4().hex

    @pandas_udf("boolean")
    def fn(s: pd.Series) -> pd.Series:
        import numpy as np

        sk = _cached_sketch(token, bc.value)
        vals, mask = _int_probe_values(s)
        if mask is None:
            return pd.Series(sk.contains(vals))
        out = pd.array([None] * len(s), dtype="boolean")
        if mask.any():
            out[mask] = sk.contains(vals)
        return pd.Series(out)

    spark.udf.register(name, fn)


def register_frequency(spark: SparkSession, name: str,
                       cms_bytes: bytes) -> None:
    bc = spark.sparkContext.broadcast(cms_bytes)
    token = uuid.uuid4().hex

    @pandas_udf("long")
    def fn(s: pd.Series) -> pd.Series:
        import numpy as np

        sk = _cached_sketch(token, bc.value)
        vals, mask = _int_probe_values(s)
        if mask is None:
            return pd.Series(sk.estimate(vals))
        # nullable Int64 avoids the float64 round-trip .where() would
        # introduce (int64 -> NaN upcast rounds estimates > 2^53)
        out = pd.array([None] * len(s), dtype="Int64")
        if mask.any():
            out[mask] = sk.estimate(vals)
        return pd.Series(out)

    spark.udf.register(name, fn)


def register_sketch_build(spark: SparkSession, kind: str,
                          name: str | None = None,
                          params: dict | None = None) -> str:
    """SQL-visible sketch BUILD: registers a grouped-agg pandas UDF so

    SQL users can build sketch states with plain GROUP BY::

        register_sketch_build(spark, "hll")
        spark.sql("SELECT source, qsketch_hll_build(token_id) AS state"
                  "  FROM toks GROUP BY source")

    NOTE: Spark grouped-agg UDFs have no partial-aggregation path — raw
    values shuffle to their group.  The 100-TB build path remains
    agg.build / agg.build_grouped (map-side partials, state-only
    shuffle); this is the SQL interop/convenience surface.  Returns the
    registered function name."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType

    from ..hash import fnv1a64
    from .agg import _HASH_KINDS, SketchSpec, _Acc

    params = params or {}
    name = name or f"qsketch_{kind}_build"
    spec = SketchSpec(kind, "v", params)

    @pandas_udf("binary", PandasUDFType.GROUPED_AGG)
    def build_state(s: pd.Series) -> bytes:
        acc = _Acc(spec)
        s = s.dropna()
        if kind in _HASH_KINDS:
            # int-id recovery fails loudly on precision-lossy floats
            vals, _ = _int_probe_values(s)
            u, c = np.unique(vals, return_counts=True)
            acc.add(u, fnv1a64(u), c)
        else:  # quantile sketches take raw numerics, floats included
            acc.add(s.to_numpy(), None)
        return acc.finish()

    spark.udf.register(name, build_state)
    return name


def register_estimate(spark: SparkSession, name: str = "qsketch_estimate") -> None:
    """Scalar decode of a serialized state -> its headline estimate

    (HLL estimate / QF-Bloom-CMS cardinality-style summary), so a full
    build+read round trip is expressible in SQL."""
    import inspect

    from .. import base

    _zero_arg_cache: dict[type, bool] = {}

    def _zero_arg_estimate(sk):
        """sk.estimate only if it is callable with no arguments — decided
        by signature, NOT by catching TypeError, which would also swallow
        a genuine TypeError raised INSIDE an estimate() body and silently
        misroute to cardinality().  The signature reflection is cached
        per sketch TYPE: reflecting per state row would add tens of µs
        to every row of a grouped-states table."""
        fn = getattr(sk, "estimate", None)
        if fn is None:
            return None
        ok = _zero_arg_cache.get(type(sk))
        if ok is None:
            required = [
                p for p in inspect.signature(fn).parameters.values()
                if p.default is inspect.Parameter.empty
                and p.kind not in (inspect.Parameter.VAR_POSITIONAL,
                                   inspect.Parameter.VAR_KEYWORD)]
            ok = not required  # CMS point-estimate: args required
            _zero_arg_cache[type(sk)] = ok
        return fn if ok else None

    @pandas_udf("double")
    def est(states: pd.Series) -> pd.Series:
        out = []
        for b in states:
            sk = base.from_bytes(bytes(b))
            fn = _zero_arg_estimate(sk)
            if fn is not None:
                out.append(float(fn()))
            elif hasattr(sk, "cardinality"):
                out.append(float(sk.cardinality()))
            else:
                raise TypeError(
                    f"{type(sk).__name__} has no argument-free estimate")
        return pd.Series(out, dtype="float64")

    spark.udf.register(name, est)


def register_fingerprint(spark: SparkSession, name: str = "fnv1a64") -> None:
    """Reference-parity FNV-1a64 fingerprints from SQL (filter.go:134):

    integer columns hash their 8-byte LE encoding; string columns hash
    their UTF-8 bytes (exactly /root/reference/server.go:100)."""
    from ..hash import fnv1a64, fnv1a64_str_array

    @pandas_udf("long")
    def fn(s: pd.Series) -> pd.Series:
        import numpy as np

        arr = s.to_numpy()
        if arr.dtype == object:  # string column
            mask = pd.notna(s)
            out = np.zeros(len(s), dtype=np.uint64)
            if mask.any():
                out[mask.to_numpy()] = fnv1a64_str_array(
                    [x for x in arr[mask.to_numpy()]])
            return pd.Series(out.view(np.int64)).where(mask, other=pd.NA)
        if arr.dtype.kind == "f":
            # a nullable int column widened to float64: recover exactly
            # when values are within float64's integer-exact range,
            # otherwise fail loudly rather than hash rounded ids
            mask = pd.notna(s)
            vals = arr[mask.to_numpy()]
            if np.any(np.abs(vals) > 2.0**53):
                raise TypeError(
                    "fnv1a64: nullable column widened to float64 with "
                    "|values| > 2^53 — precision lost; coalesce NULLs "
                    "JVM-side (e.g. coalesce(col, 0)) before hashing")
            if np.any(vals != np.floor(vals)):
                raise TypeError(
                    "fnv1a64 takes integer ids, got fractional doubles — "
                    "an astype(int64) here would silently hash a wrong id")
            out = np.zeros(len(s), dtype=np.uint64)
            if mask.any():
                out[mask.to_numpy()] = fnv1a64(vals.astype(np.int64))
            return pd.Series(out.view(np.int64)).where(mask, other=pd.NA)
        return pd.Series(fnv1a64(arr).view("int64"))

    spark.udf.register(name, fn)
