"""Deterministic A/B metric for overhead-bound queries: count the
Spark JOBS and STAGES one full evaluation (construction + noop force)
submits, via the UI REST API. Load-immune — the scheduler submits the
same DAG regardless of host state."""
import argparse, json, os, sys, urllib.request
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO_ROOT)
from ai_ready_data_framework_spark import registry

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sys.path.insert(0, os.path.join(REPO_ROOT, "plans", "r14"))
    from stageprof import get_spark_ui, rest
    from bench import force
    registry.load_all()
    spark = get_spark_ui("jobcount")
    force(registry.QUERIES["q_agg_group"](spark, args.sf_dir))
    for name in args.names:
        # second evaluation = steady state (memos warm)
        force(registry.QUERIES[name](spark, args.sf_dir))
        j0 = {j["jobId"] for j in rest(spark, "jobs")}
        s0 = {s["stageId"] for s in rest(spark, "stages")}
        force(registry.QUERIES[name](spark, args.sf_dir))
        jobs = [j for j in rest(spark, "jobs") if j["jobId"] not in j0]
        stages = [s for s in rest(spark, "stages") if s["stageId"] not in s0 and s["status"] != "SKIPPED"]
        ntasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        rt = sum(s.get("executorRunTime", 0) for s in stages)
        print(f"{name}: jobs={len(jobs)} stages={len(stages)} tasks={ntasks} task_rt={rt/1e3:.2f}s")
if __name__ == "__main__":
    main()
