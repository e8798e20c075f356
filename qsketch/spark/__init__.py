"""Spark layer: two-phase sketch aggregation + query surface.

Import submodules lazily-ish (they require a SparkSession at call time,
not import time):

    from qsketch.spark.agg import build, build_files, SketchSpec
    from qsketch.spark.queries import membership, cardinality, quantiles
    from qsketch.spark.textops import near_duplicates, dedupe_exact
    from qsketch.spark.similarity import cosine_topk_bruteforce
    from qsketch.spark.streaming import stream_build
    from qsketch.spark.sqlfns import register_membership
    from qsketch.spark.session import make_session
"""

from .workerpatch import ensure_worker_patched

# installs the worker-side cost guards when this package is imported
# INSIDE a pyspark worker process — which happens while unpickling the
# first engine function a worker runs.  Outside a worker (driver, user
# apps) this is a no-op, so importing the library has no process-global
# side effects.  Lazy fallback for sessions not using the fastdaemon
# module; ~210 ms/task saved (workerpatch.py).
ensure_worker_patched()

from . import agg, io, multimodal, queries, session, similarity, sqlfns, streaming, textops  # noqa: F401,E402

__all__ = ["agg", "io", "multimodal", "queries", "session", "similarity",
           "sqlfns", "streaming", "textops"]
