"""Scale drill for streaming sketch maintenance: stream the FULL bench
corpus (default 2M docs / 7.7e8 tokens, 64 parquet files) through
stream_build in micro-batches and verify the final states are
BYTE-IDENTICAL to a one-shot batch build — the round-1 test does this
at 600 docs; this is the same contract at production bench scale.

Usage: python tools/stress_streaming.py [files_per_trigger] [cpus]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILES_PER_TRIGGER = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache", "tokenized_2000000")


def main() -> None:
    from qsketch.spark.agg import DEFAULT_SPECS, build_files
    from qsketch.spark.io import write_tokenized
    from qsketch.spark.session import make_session
    from qsketch.spark.streaming import SketchStateStore, stream_build

    spark = make_session(CPUS, app="qsketch-stress-stream")
    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        write_tokenized(spark, CACHE, 2_000_000, seed=42, num_partitions=64)
    n_files = len(glob.glob(os.path.join(CACHE, "*.parquet")))

    state = tempfile.mkdtemp(prefix="qsketch-stream-state-")
    ckpt = tempfile.mkdtemp(prefix="qsketch-stream-ckpt-")
    try:
        stream = (spark.readStream
                  .schema("doc_id string, tokens array<int>, n_tok int, "
                          "source string")
                  .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
                  .parquet(CACHE))
        t0 = time.perf_counter()
        q = stream_build(stream, state, DEFAULT_SPECS, checkpoint_dir=ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        stream_sec = time.perf_counter() - t0

        streamed = SketchStateStore(state).load()
        t0 = time.perf_counter()
        batch = build_files(spark, CACHE, DEFAULT_SPECS)
        batch_sec = time.perf_counter() - t0

        identical = {}
        for kind in ("quotient:tokens", "hll:tokens", "cms:tokens",
                     "bloom:tokens"):
            identical[kind] = (streamed[kind].to_bytes()
                               == batch.sketches[kind].to_bytes())
        assert all(identical.values()), identical
        n_tokens = batch.n_tokens
        print(json.dumps({
            "n_tokens": n_tokens,
            "files_per_trigger": FILES_PER_TRIGGER,
            "micro_batches": -(-n_files // FILES_PER_TRIGGER),
            "stream_sec": round(stream_sec, 2),
            "stream_tokens_per_sec": round(n_tokens / stream_sec, 0),
            "batch_sec": round(batch_sec, 2),
            "canonical_states_byte_identical": identical,
            "quantile_estimates_close": {
                k: [float(streamed[k].quantiles([0.5])[0]),
                    float(batch.sketches[k].quantiles([0.5])[0])]
                for k in ("kll:n_tok", "tdigest:n_tok")},
        }))
    finally:
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
