"""Two-parallelism scaling evidence (north_rule, BASELINE.json:14).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the SAME flagship pipeline on the SAME materialized
input at local[8] and local[32] (separate JVMs — Spark masters are fixed per
process) and reporting throughput at both plus scaling efficiency:

    efficiency = (docs_per_sec@32 / docs_per_sec@8) / (32 / 8)

Writes BENCH_SCALING.md. Usage:
    python scripts/scaling_bench.py [n_docs] [low_cpus] [high_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, n_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_NDOCS=str(n_docs),
        SPARK_GRAFT_SKIP_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    # low first materializes the shared corpus; high reuses it (cached)
    r_low = run_once(low, n_docs)
    r_high = run_once(high, n_docs)
    # second low run to exclude the first-JVM warmup asymmetry
    r_low2 = run_once(low, n_docs)
    low_best = max(r_low["docs_per_sec"], r_low2["docs_per_sec"])

    eff = (r_high["docs_per_sec"] / low_best) / (high / low)
    doc = {
        "n_docs": n_docs,
        "low": {"cpus": low, "docs_per_sec": low_best,
                "sec": min(r_low["value"], r_low2["value"])},
        "high": {"cpus": high, "docs_per_sec": r_high["docs_per_sec"],
                 "sec": r_high["value"]},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(doc))

    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(f"""# Scaling evidence — flagship pipeline at two parallelism levels

North-rule criterion (BASELINE.json:14): throughput scaling efficiency
>= 0.8 from N to 4N executors. Sandbox stand-in: the same job, same
materialized input ({n_docs:,} synthetic Common-Crawl-style docs), run at
`local[{low}]` and `local[{high}]` in separate JVMs.

| parallelism | wall (s) | docs/sec |
| --- | --- | --- |
| local[{low}] | {doc['low']['sec']} | {doc['low']['docs_per_sec']:,} |
| local[{high}] | {doc['high']['sec']} | {doc['high']['docs_per_sec']:,} |

**Scaling efficiency ({low} -> {high} cores): {doc['scaling_efficiency']}**

Pipeline under test: parquet scan -> G1 extract (Arrow UDF) -> G2 geoparse
-> G3 tile assign r5-r9 (JVM codegen) -> G5 PIP broadcast-STRtree join ->
G7/G8 two-phase zonal rollup. No stage holds a global barrier besides the
final rollup shuffle; the input is pre-partitioned {low}x{high//low}*2 ways
so both runs see identical file splits.

Method note: the lower-parallelism number is the best of two runs (first JVM
pays one-time codegen warmup); the higher-parallelism run reuses the cached
corpus. Regenerate with `python scripts/scaling_bench.py`.
""")


if __name__ == "__main__":
    main()
