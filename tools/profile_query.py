"""Profile one query's stage breakdown: run it through the noop sink with
the UI enabled, then dump per-stage wall/exec times from the status API.

Usage: python tools/profile_query.py <query> [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from sensordatapipelines_spark import get_spark

    spark = get_spark(
        app_name="profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    entry._register_views(spark, sf_dir)
    entry._prewarm_stages(spark, sf_dir)
    fn = entry.queries()[name]
    for i in range(repeats):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"run {i}: {time.perf_counter() - t0:.3f}s")
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    done = [s for s in stages if s["status"] == "COMPLETE"]
    done.sort(key=lambda s: -(s.get("executorRunTime", 0)))
    print(f"{len(done)} stages; top by executorRunTime:")
    for s in done[:25]:
        dur = s.get("executorRunTime", 0)
        sub = (
            time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            if s.get("submissionTime")
            else None
        )
        print(
            f"  execRun={dur/1000:7.2f}s cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
            f"tasks={s.get('numCompleteTasks'):4d} "
            f"in={s.get('inputBytes',0)>>20}MB sh_r={s.get('shuffleReadBytes',0)>>10}KB "
            f"sh_w={s.get('shuffleWriteBytes',0)>>10}KB  {s.get('name','')[:60]}"
        )
    n_jobs = len(
        json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs"))
    )
    print(f"total jobs: {n_jobs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
