"""Round-13 stage-level profiler: run a declared query (or an ad-hoc
frame from a snippet) with the Spark UI enabled and dump per-stage
executor-run-time / shuffle / input metrics from the UI REST API —
the guide §1.1 empirical loop without a browser.

Usage:
    python plans/r14/profile.py q_dedup_exact [more ...] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import SparkSession  # noqa: E402

from ai_ready_data_framework_spark import registry  # noqa: E402


def get_spark_ui(app_name: str = "r14-profile") -> SparkSession:
    from ai_ready_data_framework_spark.session import (
        DEFAULT_SHUFFLE_PARTITIONS,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4090")
        .getOrCreate()
    )


def rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/{path}") as r:
        return json.load(r)


def profile(spark: SparkSession, name: str, df, runs: int) -> None:
    from bench import force, process_tree_cpu_delta, process_tree_cpu_snapshot

    sc = spark.sparkContext
    best_wall, best_cpu = float("inf"), float("inf")
    first_stage_dump = None
    for run in range(runs):
        before = {s["stageId"] for s in rest(spark, "stages")}
        sc.setJobDescription(f"{name} run{run}")
        c0 = process_tree_cpu_snapshot()
        t0 = time.perf_counter()
        force(df() if callable(df) else df)
        wall = time.perf_counter() - t0
        cpu = process_tree_cpu_delta(c0, process_tree_cpu_snapshot())
        best_wall, best_cpu = min(best_wall, wall), min(best_cpu, cpu)
        stages = [
            s
            for s in rest(spark, "stages")
            if s["stageId"] not in before and s["status"] != "SKIPPED"
        ]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        dump = []
        for s in stages:
            dump.append(
                {
                    "stage": s["stageId"],
                    "runtime_ms": s.get("executorRunTime", 0),
                    "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
                    "tasks": s.get("numCompleteTasks", 0),
                    "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "name": s.get("name", "")[:80],
                }
            )
        if run == runs - 1:
            first_stage_dump = dump
    print(f"== {name}: wall={best_wall:.3f}s cpu={best_cpu:.2f}s "
          f"stages={len(first_stage_dump)} "
          f"task_runtime_sum={sum(s['runtime_ms'] for s in first_stage_dump)/1e3:.2f}s")
    for s in first_stage_dump:
        print(
            f"   stage {s['stage']:>4} rt={s['runtime_ms']:>6}ms cpu={s['cpu_ms']:>6}ms "
            f"tasks={s['tasks']:>3} in={s['in_mb']:>6}MB shR={s['sh_r_mb']:>7}MB "
            f"shW={s['sh_w_mb']:>7}MB  {s['name']}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark_ui()
    print(f"loadavg: {[round(x, 2) for x in os.getloadavg()]}", file=sys.stderr)
    from bench import force

    force(registry.QUERIES["q_agg_group"](spark, args.sf_dir))  # warmup
    for name in args.names:
        profile(
            spark,
            name,
            lambda n=name: registry.QUERIES[n](spark, args.sf_dir),
            args.runs,
        )


if __name__ == "__main__":
    main()
