"""Headline benchmark: runs the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a count-style noop action
(``df.write.format("noop")``) so the full plan — scan, shuffle, window —
executes without collecting results to the driver. Every query runs
REPS times (default 2) and reports the fastest — single-JVM timings at
this scale swing 2-3x with JIT/GC state, and the minimum is the standard
low-noise estimator of the plan's actual cost.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from window_aggregation_spark.session import get_spark  # noqa: E402
from window_aggregation_spark.suite import SUITE, headline_queries  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    run_all = os.environ.get("SPARK_GRAFT_BENCH_ALL") == "1"
    queries = SUITE if run_all else headline_queries()

    spark = get_spark("window_aggregation_spark_bench")

    # warm the JVM + parquet footers once, outside the timed region
    next(iter(queries.values())).build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, q in sorted(queries.items()):
        best = float("inf")
        for _ in range(max(reps, 1)):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt}s", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "suite_headline_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
