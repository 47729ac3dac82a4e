"""Stream-stream outer-join STATE probe (r13): measured evidence for
the watermark-bounded-state claim in
streaming/events.py::click_view_attribution_outer.

The op's 100 TB story is that join state does not grow with the
stream: view rows older than (click watermark − lookback) and click
rows older than the view watermark are evicted, so state tracks the
WINDOW, not the history. This probe runs the outer join over the
events table split into many files (one per trigger), samples
`lastProgress.stateOperators` after each micro-batch, and reports the
peak state rows vs the total events streamed — at a 2 h watermark
over a multi-day stream, peak state must be a small fraction of the
corpus.

Usage: python tools/outer_join_state_probe.py [sf_dir] [n_files]
Prints one JSON line; numbers land in NOTES_ROUND13.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main():
    from prohap_spark.queries.registry import events_table
    from prohap_spark.session import get_spark
    from prohap_spark.streaming.events import (
        click_view_attribution_outer,
        read_event_stream,
    )

    spark = get_spark("oj_state_probe")
    base = f"/tmp/prohap_ojstate_{os.getpid()}"
    src = f"{base}/ev"
    try:
        ev = events_table(spark, SF_DIR).orderBy("ts")
        n_events = ev.count()
        # time-ordered file split => triggers advance event time, so
        # the watermark moves every batch and eviction is observable
        from pyspark.sql import Window, functions as F

        ev.coalesce(1).write.mode("overwrite").parquet(f"{base}/one")
        one = spark.read.parquet(f"{base}/one")
        # deterministic time-ordered split: ntile over ts
        w = Window.orderBy("ts", "event_id")
        ev2 = one.withColumn("__b", F.ntile(N_FILES).over(w))
        for b in range(1, N_FILES + 1):
            ev2.where(F.col("__b") == b).drop("__b").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            time.sleep(0.05)  # distinct mtimes => stable trigger order

        out = click_view_attribution_outer(
            read_event_stream(spark, src, max_files_per_trigger=1)
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("oj_state_out")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        peaks = []
        while q.isActive:
            p = q.lastProgress
            if p and p.get("stateOperators"):
                peaks.append(
                    sum(s.get("numRowsTotal", 0) for s in p["stateOperators"])
                )
            time.sleep(0.2)
            if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
                q.processAllAvailable()
                q.stop()
        p = q.lastProgress
        if p and p.get("stateOperators"):
            peaks.append(sum(s.get("numRowsTotal", 0) for s in p["stateOperators"]))
        got = spark.sql("SELECT count(*) AS n FROM oj_state_out").collect()[0]["n"]
        print(json.dumps({
            "sf_dir": SF_DIR,
            "n_files": N_FILES,
            "n_events": n_events,
            "n_output_rows": got,
            "peak_state_rows": max(peaks) if peaks else None,
            "peak_state_fraction": (max(peaks) / n_events) if peaks else None,
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
