"""Profile one workload slot: run it with the UI enabled and print every
Spark job (duration, description) plus the inter-job driver gaps —
attributes a slot's wall time to cluster work vs driver-side
orchestration (planning, py4j, file ops).

Usage::

    python tools/profile_slot.py q47_update_diff [--sf DIR] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def jobs_info(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded")
    )


def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("slot")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from sea_serpent_spark.session import get_spark

    spark = get_spark(
        app_name="profile-slot",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "10000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    fn = qs[args.slot]
    next(iter(qs.values()))(spark, args.sf).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    for p in range(args.passes):
        before = {j["jobId"] for j in jobs_info(spark)}
        t0 = time.time()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        t1 = time.time()
        jobs = [j for j in jobs_info(spark) if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== pass {p}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        prev_end = t0
        job_sum = 0.0
        gap_sum = 0.0
        for j in jobs:
            sub = ts(j["submissionTime"])
            end = ts(j.get("completionTime", j["submissionTime"]))
            gap = max(0.0, sub - prev_end)
            gap_sum += gap
            job_sum += end - sub
            desc = (j.get("description") or j.get("name") or "")[:90]
            print(
                f"  gap {gap:6.3f}s | job {j['jobId']:4d} {end - sub:6.3f}s"
                f" stages={len(j.get('stageIds', []))}"
                f" tasks={j.get('numTasks', 0):4d} | {desc}"
            )
            prev_end = max(prev_end, end)
        print(
            f"  tail gap {max(0.0, t1 - prev_end):.3f}s"
            f" | jobs {job_sum:.2f}s + gaps {gap_sum:.2f}s of {wall:.2f}s"
        )


if __name__ == "__main__":
    main()
