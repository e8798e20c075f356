"""Structured Streaming: incremental sketch maintenance.

The reference has no streaming ("Expiring keys" unchecked,
/root/reference/README.md:11); this is the Spark-native extension: keep
the sketch set current as new tokenized sequences arrive.

Shape: ``readStream -> foreachBatch(build partials on the micro-batch,
merge into the persisted state)``.  Because every sketch merge is
associative + commutative and the quotient-filter state is canonical,
the streamed result is BYTE-IDENTICAL to a batch rebuild over the same
rows — which is exactly what the test asserts.  State updates are
atomic (tmp + rename) and idempotence comes from recording the last
applied epoch, so checkpoint-replayed micro-batches do not double-count
(they would anyway be absorbed by set-semantics sketches, but CMS/KLL
are weight-sensitive).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from .. import base
from .agg import DEFAULT_SPECS, build


class SketchStateStore:
    """Tiny file-backed state: one blob per sketch kind + epoch marker."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, kind: str) -> str:
        return os.path.join(self.state_dir, kind.replace(":", "__") + ".bin")

    def load(self) -> dict[str, object]:
        out = {}
        for f in os.listdir(self.state_dir):
            if f.endswith(".bin"):
                with open(os.path.join(self.state_dir, f), "rb") as fh:
                    sk = base.from_bytes(fh.read())
                out[f[:-4].replace("__", ":")] = sk
        return out

    def last_epoch(self) -> int:
        p = os.path.join(self.state_dir, "_epoch.json")
        if not os.path.exists(p):
            return -1
        with open(p) as fh:
            return json.load(fh)["epoch"]

    def commit(self, sketches: dict[str, object], epoch: int) -> None:
        for kind, sk in sketches.items():
            tmp = self._path(kind) + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(sk.to_bytes())
            os.replace(tmp, self._path(kind))
        tmp = os.path.join(self.state_dir, "_epoch.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"epoch": epoch}, fh)
        os.replace(tmp, os.path.join(self.state_dir, "_epoch.json"))


def stream_build(stream_df: DataFrame, state_dir: str, specs=DEFAULT_SPECS,
                 checkpoint_dir: str | None = None, trigger=None,
                 query_name: str = "qsketch-stream"):
    """Maintain sketches over a streaming tokenized-sequence source.

    Returns the StreamingQuery; ``SketchStateStore(state_dir).load()``
    reads the live state at any time.
    """
    store = SketchStateStore(state_dir)

    def process_batch(batch_df: DataFrame, epoch: int) -> None:
        if epoch <= store.last_epoch():  # replayed micro-batch: skip
            return
        if batch_df.isEmpty():
            store.commit({}, epoch)
            return
        res = build(batch_df, specs)
        current = store.load()
        merged = {}
        for kind, sk in res.sketches.items():
            merged[kind] = current[kind].merge(sk) if kind in current else sk
        store.commit(merged, epoch)

    writer = (stream_df.writeStream.queryName(query_name)
              .foreachBatch(process_batch)
              .outputMode("update"))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def windowed_token_rate(stream_df: DataFrame, ts_col: str = "ts",
                        n_tok_col: str = "n_tok",
                        window: str = "1 minute",
                        watermark: str = "2 minutes") -> DataFrame:
    """Pure-Catalyst streaming aggregate: token throughput per event-time

    window with late-data handling — demonstrates watermarked stateful
    aggregation alongside the custom sketch path."""
    from pyspark.sql import functions as F

    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"))
            .agg(F.sum(n_tok_col).alias("tokens"),
                 F.count("*").alias("docs")))
