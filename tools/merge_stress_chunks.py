#!/usr/bin/env python
"""Merge per-chunk isolate stress JSON lines (tools/stress.py --isolate
run over query subsets) into one canonical record file.

Usage: python tools/merge_stress_chunks.py OUT.json CHUNK.out...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *chunks = sys.argv[1:]
    queries: dict[str, float] = {}
    repl = cpus = None
    for path in chunks:
        with open(path) as f:
            rec = json.loads(f.read().strip().splitlines()[-1])
        assert rec.get("mode") == "isolate", f"{path} is not an isolate record"
        repl, cpus = rec["repl"], rec["cpus"]
        queries.update(rec["queries"])
    merged = {
        "metric": "stress_total_wall",
        "value": round(sum(v for v in queries.values() if v == v), 3),
        "unit": "sec",
        "queries": queries,
        "repl": repl,
        "cpus": cpus,
        "mode": "isolate",
        "chunks": len(chunks),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path}: {len(queries)} queries, total {merged['value']}s")


if __name__ == "__main__":
    main()
