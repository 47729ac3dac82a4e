"""Exactly-once delivery to a non-transactional sink — the last mile
of the streaming story. Spark's contract INTO ``foreachBatch`` is
at-least-once: after a failure, the restarted query re-delivers the
last epoch whose sink-side effects were not known to complete. A sink
that blindly appends therefore duplicates that epoch's rows. The
standard fix (and what every exactly-once-to-object-store deployment
runs) is an IDEMPOTENT batch writer keyed by ``epoch_id``:

- each micro-batch lands in its own ``batch_id=<epoch>`` directory;
- the write is ``overwrite`` scoped to that directory, so a torn
  first attempt is replaced wholesale, never appended to;
- a ``_COMMITTED`` marker is dropped only after the write completes;
  a replayed epoch that finds its marker is a no-op, and readers
  (:func:`read_committed`) see ONLY committed directories — a torn
  write without a marker is invisible.

at-least-once delivery x idempotent apply = exactly-once observed.

100 TB notes: the epoch directory doubles as a partition (readers
prune on batch_id); on HDFS the marker-after-rename step is atomic,
on object stores the same recipe rides the committer protocol.
Downstreams that need MERGE semantics instead of partition-append
compose this with operators/merge.py::scd2_merge inside the same
``foreachBatch`` — idempotence then comes from the merge key, and
the marker still gates replays from re-running the merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMITTED"


def idempotent_batch_writer(out_dir: str):
    """A ``foreachBatch`` callable delivering each epoch exactly once
    into ``out_dir/batch_id=<epoch>`` (see module docstring). Safe
    under every replay Spark's recovery can produce: marker present →
    skip; marker absent (torn or fresh) → scoped overwrite, then
    marker."""

    def write(df: DataFrame, epoch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={epoch_id}")
        marker = os.path.join(target, COMMIT_MARKER)
        if os.path.exists(marker):
            return  # replayed epoch already fully delivered
        df.write.mode("overwrite").parquet(target)
        with open(marker, "w"):
            pass

    return write


def committed_batch_ids(out_dir: str) -> list[int]:
    """Epoch ids with a commit marker, ascending."""
    if not os.path.isdir(out_dir):
        return []
    out = []
    for name in os.listdir(out_dir):
        if name.startswith("batch_id=") and os.path.exists(
            os.path.join(out_dir, name, COMMIT_MARKER)
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def read_committed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of COMMITTED epoch directories only — a torn epoch
    (parquet present, marker absent) is invisible, so readers never
    observe a partial batch. Raises FileNotFoundError when nothing
    has committed yet (loud, like the index readers)."""
    ids = committed_batch_ids(out_dir)
    if not ids:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    paths = [os.path.join(out_dir, f"batch_id={i}") for i in ids]
    return spark.read.parquet(*paths)
