"""Per-query micro-bench: times selected entry queries N times each under
the bench.py protocol (same session config, noop sink, per-run cold plans).

Usage: python scripts/qbench.py [--runs N] [--sf DIR] [query ...]

Prints one JSON line: {"query": {"runs": [...], "median": s}, ...}.
Run on a QUIET host (BENCH_SCALING.md: concurrent jobs fake regressions).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from bench import build_spark

    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    names = names or list(qs)
    out = {}
    # one warmup pass over a cheap query to spawn workers/JIT the session
    qs["fingerprint"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = {"runs": times, "median": round(statistics.median(times), 3)}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
