"""Time individual registered queries with bench.py's isolation protocol.

Usage: python scripts/time_query.py [sf_dir] query [query...]
One untimed warmup pass + _isolate before and after the timed pass —
the same steady-state convention bench.py uses (CLAUDE.md: per-query
timings in one session contaminate each other otherwise).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _isolate, build_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    qs = entry.queries()
    unknown = [a for a in args if a not in qs]
    if unknown or not args:
        raise SystemExit(f"unknown or missing queries: {unknown}")
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    for name in args:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _isolate(spark)
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"{name}\t{time.monotonic() - t0:.2f}s")
        _isolate(spark)
    spark.stop()


if __name__ == "__main__":
    main()
