"""Capture .explain("formatted") for named declared queries.

Usage: python tools/capture_plans.py <suffix> <query> [<query> ...]
Writes plans/r06/<query>_<suffix>.txt for each name.  Suffix is
"before" / "after" per the optimization-round deliverable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r06")


def main(suffix: str, *names: str) -> None:
    import __spark_entry__ as entrymod
    from qsketch.spark.session import make_session

    spark = make_session(8)
    os.makedirs(OUT_DIR, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
