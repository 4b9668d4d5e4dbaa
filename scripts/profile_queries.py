#!/usr/bin/env python3
"""Round-13 optimization helper: time a SUBSET of registered queries with
the exact bench.py methodology (noop sink, min-of-reps, warmup) so a
single query can be iterated on without paying the full 232-query sweep.

Usage:
  python scripts/profile_queries.py name [name ...]
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
      python scripts/profile_queries.py line_dedup

Also dumps the formatted plan when --plans DIR is given:
  python scripts/profile_queries.py --plans plans/r13 --suffix before line_dedup
(writes plans/r13/line_dedup_before.txt).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_real_time_data_warehouse_spark.queries import registry  # noqa: E402
from flink_real_time_data_warehouse_spark.session import get_spark  # noqa: E402


def fmt_plan(df) -> str:
    jdf = df._jdf
    plan = df._sc._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), "formatted")
    return "".join(
        c if c == "\n" or c == "\t" or ord(c) >= 32 else f"\\x{ord(c):02x}"
        for c in plan.rstrip()
    )


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    spark = get_spark("frtdw-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run("q1_pricing_summary")  # warmup
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(fmt_plan(qs[name].spark(spark, sf_dir)) + "\n")
        spark.sparkContext.setJobDescription(f"profile:{name}")
        ts = [run(name) for _ in range(reps)]
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(ts)} runs={ts}", flush=True)


if __name__ == "__main__":
    main()
