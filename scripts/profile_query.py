"""Per-job/per-stage breakdown of one headline query (guide §1).

Runs a single registry query exactly like bench.py (noop sink, cold
cache) with the Spark event log enabled, then parses the event log into
a per-job table: wall time, stage count, task time, shuffle read/write
bytes.  This answers "where does the time go" without the (disabled)
Spark UI.

Usage: python scripts/profile_query.py <name> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from barco_spark.registry import load_all  # noqa: E402
from barco_spark.session import free_persistent_rdds, get_spark  # noqa: E402


def _read_eventlog_lines(evdir: str, app_id: str):
    """Yield JSON lines from a Spark 4 event log (rolled dir, zstd)."""
    import glob
    import io

    base = os.path.join(evdir, app_id)
    paths = (
        sorted(glob.glob(os.path.join(f"{base}*", "events_*")))
        or glob.glob(f"{base}*")
    )
    for p in paths:
        if os.path.isdir(p):
            continue
        if p.endswith(".zstd"):
            import subprocess

            out = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=True
            ).stdout
            yield from io.StringIO(out.decode("utf-8"))
        else:
            yield from open(p)


def parse_eventlog(evdir: str, app_id: str) -> None:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in _read_eventlog_lines(evdir, app_id):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:60],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif kind == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            st = stages.setdefault(sid, {})
            st["wall_ms"] = (comp - sub) if sub and comp else 0
            st["tasks"] = si.get("Number of Tasks", 0)
            st["name"] = si.get("Stage Name", "")[:50]
        elif kind == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            st = stages.setdefault(sid, {"wall_ms": 0, "tasks": 0, "name": ""})

            st["run_ms"] = st.get("run_ms", 0) + m.get("Executor Run Time", 0)
            st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
            st["deser_ms"] = st.get("deser_ms", 0) + m.get(
                "Executor Deserialize Time", 0
            )
            srm = m.get("Shuffle Read Metrics") or {}
            st["sh_read"] = (
                st.get("sh_read", 0)
                + srm.get("Remote Bytes Read", 0)
                + srm.get("Local Bytes Read", 0)
            )
            st["fetch_ms"] = st.get("fetch_ms", 0) + srm.get("Fetch Wait Time", 0)
            swm = m.get("Shuffle Write Metrics") or {}
            st["sh_write"] = st.get("sh_write", 0) + swm.get(
                "Shuffle Bytes Written", 0
            )

    total_wall = 0
    print(f"{'job':>4} {'wall_ms':>8} {'desc'}")
    for jid in sorted(jobs):
        j = jobs[jid]
        wall = j.get("end", j["start"]) - j["start"]
        total_wall += wall
        print(f"{jid:>4} {wall:>8} {j['desc']}")
        for sid in sorted(j["stages"]):
            st = stages.get(sid)
            if st is None or "run_ms" not in st:
                continue  # skipped stage (reused exchange)
            print(
                f"     stage {sid:>4} wall={st['wall_ms']:>6} "
                f"run={st.get('run_ms', 0):>7} gc={st.get('gc_ms', 0):>5} "
                f"deser={st.get('deser_ms', 0):>5} "
                f"fetch={st.get('fetch_ms', 0):>5} "
                f"shR={st.get('sh_read', 0):>9} shW={st.get('sh_write', 0):>9} "
                f"tasks={st['tasks']:>3} {st['name']}"
            )
    print(f"sum of job walls: {total_wall} ms  (gaps between jobs = driver time)")


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="sparkev_")
    queries = load_all()
    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (codegen/JIT) with the flagship, as bench.py does
    queries["q1_pricing_summary"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times = []
    for _ in range(reps):
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        t0 = time.perf_counter()
        df = queries[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 4))
    print(f"{name}: {times} (min {min(times)})")
    app_id = spark.sparkContext.applicationId
    spark.stop()
    # event log flushes on stop
    parse_eventlog(evdir, app_id)


if __name__ == "__main__":
    main()
