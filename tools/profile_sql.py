"""Per-operator metrics for one query: run through the noop sink with the
UI on, then dump the SQL-tab plan-node metrics (rows, bytes, time) of the
LAST execution.

Usage: python tools/profile_sql.py <query>
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from sensordatapipelines_spark import get_spark

    spark = get_spark(app_name="profile-sql", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    entry._register_views(spark, sf_dir)
    entry._prewarm_stages(spark, sf_dir)
    fn = entry.queries()[name]
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    sqls = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=200"
        )
    )
    sqls.sort(key=lambda s: s["id"])
    # every execution that belongs to the final action AND the checkpoint
    # executions the query ran on the way — print them all, biggest first
    for s in sqls:
        dur = s.get("duration", 0)
        if dur < 200:
            continue
        print(f"== execution {s['id']} dur={dur/1000:.2f}s {s.get('description','')[:70]}")
        nodes = s.get("nodes", [])
        interesting = []
        for nd in nodes:
            mets = {m["name"]: m["value"] for m in nd.get("metrics", [])}
            rows = mets.get("number of output rows", "")
            sh = mets.get("shuffle bytes written", "") or mets.get(
                "data size", ""
            )
            tm = (
                mets.get("time in aggregation build", "")
                or mets.get("op time", "")
                or mets.get("shuffle write time", "")
            )
            if rows or sh:
                interesting.append(
                    (nd.get("nodeName", ""), rows, sh, tm)
                )
        for nn, rows, sh, tm in interesting[:40]:
            print(f"   {nn[:48]:48s} rows={rows:<14s} bytes={sh:<12s} t={tm}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
