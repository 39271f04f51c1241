"""Round-13 whole-bench stage sweep: run EVERY headline query once with
the UI enabled and dump per-stage metrics to plans/r13/sweep.json, then
print the suspicious stages:

- single-task stages with runtime > 300 ms (serialized work — guide
  §2.5 input skew / AQE-collapsed exchanges),
- stages whose max task time >> median (straggler/skew — guide §2.4),
- excessive shuffle volume relative to input (guide §2.2).

Usage:  python plans/r13/sweep.py [--sf-dir DIR]
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

from bench import HEADLINE, force  # noqa: E402

from ai_ready_data_framework_spark import registry  # noqa: E402


def rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/{path}") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "plans", "r13", "sweep.json"))
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REPO_ROOT, "plans", "r13"))
    from stageprof import get_spark_ui  # noqa: E402

    registry.load_all()
    spark = get_spark_ui("r13-sweep")
    sc = spark.sparkContext
    names = [n for n in HEADLINE if n in registry.QUERIES]
    force(registry.QUERIES["q_agg_group"](spark, args.sf_dir))  # warmup

    report: dict[str, dict] = {}
    for name in names:
        before = {s["stageId"] for s in rest(spark, "stages")}
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        force(registry.QUERIES[name](spark, args.sf_dir))
        wall = time.perf_counter() - t0
        stages = [
            s
            for s in rest(spark, "stages")
            if s["stageId"] not in before and s["status"] != "SKIPPED"
        ]
        rows = []
        for s in stages:
            rows.append(
                {
                    "stage": s["stageId"],
                    "rt_ms": s.get("executorRunTime", 0),
                    "tasks": s.get("numCompleteTasks", 0),
                    "in_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                    "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                }
            )
        report[name] = {"wall": round(wall, 3), "stages": rows}
        print(f"{name}: wall={wall:.2f} stages={len(rows)}", file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

    print("== suspicious: single-task stages > 300 ms ==")
    for name, rec in report.items():
        for s in rec["stages"]:
            if s["tasks"] == 1 and s["rt_ms"] > 300:
                print(
                    f"  {name:26s} stage {s['stage']:>5} rt={s['rt_ms']:>6}ms "
                    f"in={s['in_mb']:>7}MB shR={s['sh_r_mb']:>7}MB shW={s['sh_w_mb']:>7}MB"
                )
    print("== suspicious: > 40 MB shuffled in one stage ==")
    for name, rec in report.items():
        for s in rec["stages"]:
            if s["sh_w_mb"] > 40:
                print(f"  {name:26s} stage {s['stage']:>5} shW={s['sh_w_mb']}MB rt={s['rt_ms']}ms")


if __name__ == "__main__":
    main()
