#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to a directory.

Usage: python tools/dump_plans.py OUT_DIR query [query ...]
Runs against sf0.1 (the bench SF) in one local session — planning only,
no actions, so it is cheap and safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    from spark_hive_streaming_sink_spark.registry import queries
    from spark_hive_streaming_sink_spark.session import get_spark

    qs = queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("dump-plans", cpus=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    import contextlib
    import io

    for name in names:
        df = qs[name](spark, SRC)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out_dir}/{name}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
