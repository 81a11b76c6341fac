"""Per-query isolation profiler for the r22 optimization round.

Times each named query with the noop sink (guide section 1.4 — computes
every column, no driver shipping) after one warm run, and dumps
``.explain('formatted')`` to plans/r22/<name>_<tag>.txt.

Usage: python tools/profile_r22.py <tag> <query> [<query> ...]
       python tools/profile_r22.py <tag> --plans-only <query> ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    plans_only = "--plans-only" in args
    names = [a for a in args if not a.startswith("--")]

    from vector_database_product_recommendation_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("profile-r22")
    qmap = entrymod.queries()
    os.makedirs(os.path.join(REPO, "plans", "r22"), exist_ok=True)

    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        t_build0 = time.time()
        df = fn(spark, SF_DIR)
        t_build = time.time() - t_build0
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(REPO, "plans", "r22", f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        if plans_only:
            print(f"{name}: plan written (build {t_build:.2f}s)")
            continue
        runs = []
        for _ in range(1 + RUNS):  # first run is warm-up
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timed = sorted(runs[1:])
        print(
            f"{name}: build={t_build:.2f}s warm={runs[0]:.2f}s "
            f"median={timed[len(timed) // 2]:.2f}s runs={[round(r, 2) for r in runs]}"
        )
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
