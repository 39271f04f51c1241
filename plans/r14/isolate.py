"""Round-13 measurement harness: time individual declared queries with
bench.py's exact methodology (noop sink, best-of-N wall + process-tree
CPU) and optionally dump .explain("formatted") to plans/r14/.

Usage:
    python plans/r14/isolate.py q_agg_distinct q_cluster_assign --runs 3
    python plans/r14/isolate.py q_agg_distinct --explain before
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from bench import force, process_tree_cpu_delta, process_tree_cpu_snapshot  # noqa: E402

from ai_ready_data_framework_spark import registry  # noqa: E402
from ai_ready_data_framework_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="suffix: write plans/r14/<q>_<suffix>.txt")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark(app_name="r14-isolate")
    print(f"host loadavg: {[round(x, 2) for x in os.getloadavg()]}", file=sys.stderr)
    # warmup (same as bench.py)
    force(registry.QUERIES["q_agg_group"](spark, args.sf_dir))

    for name in args.names:
        df = registry.QUERIES[name](spark, args.sf_dir)
        if args.explain:
            import contextlib
            import io

            out = os.path.join(REPO_ROOT, "plans", "r14", f"{name}_{args.explain}.txt")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(out, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {out}", file=sys.stderr)
        if args.no_time:
            continue
        walls, cpus = [], []
        for _ in range(args.runs):
            # construction INSIDE the timed region — bench.py's exact
            # shape (several queries do real work at construction:
            # driver fits, stage pins, count stitches)
            c0 = process_tree_cpu_snapshot()
            t0 = time.perf_counter()
            force(registry.QUERIES[name](spark, args.sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
            cpus.append(round(process_tree_cpu_delta(c0, process_tree_cpu_snapshot()), 3))
        print(f"{name}: wall={walls} best={min(walls)} cpu={cpus} best_cpu={min(cpus)}")


if __name__ == "__main__":
    main()
