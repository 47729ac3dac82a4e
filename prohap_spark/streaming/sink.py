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
prune on batch_id). THIS implementation's commit-protocol plumbing
(os.path.exists / open(marker) / os.listdir / os.rename) is
LOCAL-FILESYSTEM-ONLY — pointing it at hdfs:// or s3a:// URIs would
silently never see markers and re-deliver epochs. The DESIGN ports
directly (it is the standard exactly-once-to-object-store recipe):
on HDFS route the marker/list/rename calls through the Hadoop
FileSystem API, where marker-after-rename is atomic; on object
stores the same recipe rides the committer protocol.
Downstreams that need MERGE semantics instead of partition-append
compose this with operators/merge.py::scd2_merge inside the same
``foreachBatch`` — idempotence then comes from the merge key, and
the marker still gates replays from re-running the merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMITTED"


def _lock_is_live(lock_path: str) -> bool:
    """True iff the compaction lock names a pid still alive on this
    host (same-host check — consistent with the module's documented
    local-filesystem-only scope)."""
    try:
        with open(lock_path) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else


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


def recover_compaction(out_dir: str) -> str | None:
    """Roll a crashed :func:`compact_epochs` swap forward or back so
    readers always see a complete committed set. Crash taxonomy (the
    swap's steps are: validate staging → mkdir trash → rename each
    original into trash → rename staging to batch_id=<keep> → write
    marker → delete trash):

    - a LIVE compaction lock (``.compact_lock_<id>`` whose recorded
      pid is alive on this host): do NOTHING — the staging/trash dirs
      belong to a compaction that is still running, and yanking its
      staging dir out from under it (the r13 ADVICE race) would abort
      a healthy maintenance op. Stale locks (dead pid) are swept.
    - staging present, NO trash: the crash predates any rename of an
      original (staging may even be a torn write — validation happens
      before the trash mkdir). Roll BACK: drop staging; the committed
      epochs were never touched.
    - trash present: every original rename happened under a VALIDATED
      staging, so the compacted data is known-good. Roll FORWARD:
      move any still-unmoved ORIGINALS (batch_id <= the compaction's
      keep id — epoch ids only grow, so anything newer was committed
      AFTER the crash by a restarted stream and must survive; the r13
      ADVICE data-loss bug moved every batch_id=* dir) into trash,
      rename staging into place if it still exists, (re)write the
      marker, drop the trash.
    - trash present but neither staging nor the target exist (cannot
      happen under the protocol order, kept for defense): roll BACK by
      restoring the originals out of the trash.

    Returns "rolled_forward" / "rolled_back" / None (nothing to do).
    Called automatically by :func:`committed_batch_ids`, so any
    read/startup path self-heals before listing epochs."""
    import shutil

    if not os.path.isdir(out_dir):
        return None
    names = os.listdir(out_dir)
    for n in names:
        if n.startswith(".compact_lock_"):
            lock = os.path.join(out_dir, n)
            if _lock_is_live(lock):
                return None  # compaction in progress — hands off
            os.remove(lock)  # stale (dead pid / unreadable): sweep
    staging = [n for n in names if n.startswith(".staging_batch_id=")]
    trash = [n for n in names if n.startswith(".trash_compact_")]
    if not trash:
        if not staging:
            return None
        for n in staging:
            shutil.rmtree(os.path.join(out_dir, n))
        return "rolled_back"
    tdir = os.path.join(out_dir, trash[0])
    keep = int(trash[0].rsplit("_", 1)[1])
    target = os.path.join(out_dir, f"batch_id={keep}")
    sdir = os.path.join(out_dir, f".staging_batch_id={keep}")
    if os.path.isdir(sdir):
        for n in os.listdir(out_dir):
            if n.startswith("batch_id=") and int(n.split("=", 1)[1]) <= keep:
                os.rename(os.path.join(out_dir, n), os.path.join(tdir, n))
        os.rename(sdir, target)
    if os.path.isdir(target):
        marker = os.path.join(target, COMMIT_MARKER)
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
        shutil.rmtree(tdir)
        return "rolled_forward"
    for n in os.listdir(tdir):
        os.rename(os.path.join(tdir, n), os.path.join(out_dir, n))
    os.rmdir(tdir)
    return "rolled_back"


def committed_batch_ids(out_dir: str) -> list[int]:
    """Epoch ids with a commit marker, ascending. Self-heals a crashed
    compaction swap first (:func:`recover_compaction`)."""
    if not os.path.isdir(out_dir):
        return []
    recover_compaction(out_dir)
    out = []
    for name in os.listdir(out_dir):
        if name.startswith("batch_id=") and os.path.exists(
            os.path.join(out_dir, name, COMMIT_MARKER)
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def read_committed(
    spark: SparkSession, out_dir: str, merge_schema: bool = False
) -> DataFrame:
    """Union of COMMITTED epoch directories only — a torn epoch
    (parquet present, marker absent) is invisible, so readers never
    observe a partial batch. Raises FileNotFoundError when nothing
    has committed yet (loud, like the index readers).

    ``merge_schema=True`` tolerates ADDITIVE schema evolution across
    epochs (a stream that gained a column mid-history): the union is
    read under parquet schema merging, older epochs surfacing NULL
    for columns they predate — the table-format contract. The
    default stays strict: schema drift in a sink that promised one
    schema should fail loudly, not be papered over."""
    ids = committed_batch_ids(out_dir)
    if not ids:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    paths = [os.path.join(out_dir, f"batch_id={i}") for i in ids]
    r = spark.read
    if merge_schema:
        r = r.option("mergeSchema", True)
    return r.parquet(*paths)


def read_committed_asof(
    spark: SparkSession, out_dir: str, as_of: int, merge_schema: bool = False
) -> DataFrame:
    """Time-travel read: the committed prefix with batch_id <= as_of —
    epoch ids only grow (the writer's contract, preserved by
    compact_epochs reusing the max id), so a committed epoch set is an
    append-only log and any historical snapshot is just a prefix
    filter over the directory listing. Raises like read_committed when
    the prefix is empty (as_of predates the first commit). NB after a
    compaction, epochs folded into the compacted id are only readable
    at as_of >= that id — compaction trades sub-prefix granularity for
    the small-files win, exactly like snapshot-expiry in table
    formats. ``merge_schema`` as in :func:`read_committed`."""
    ids = [i for i in committed_batch_ids(out_dir) if i <= as_of]
    if not ids:
        raise FileNotFoundError(
            f"no committed batches <= {as_of} under {out_dir}"
        )
    paths = [os.path.join(out_dir, f"batch_id={i}") for i in ids]
    r = spark.read
    if merge_schema:
        r = r.option("mergeSchema", True)
    return r.parquet(*paths)


def delete_keys(
    spark: SparkSession,
    out_dir: str,
    keys_df: DataFrame,
    delete_id: int | None = None,
) -> int:
    """Row-level delete as a DELETION VECTOR, not a rewrite: the key
    set lands in its own ``delete_id=<n>`` directory (single-column
    parquet + ``_DELETE_META.json`` naming the key column + the same
    ``_COMMITTED`` marker protocol as data epochs), and
    :func:`read_current` subtracts the union of committed delete sets
    with one anti-join. Nothing already written moves — a delete of k
    keys costs O(k) I/O regardless of table size, which is the whole
    point at 100 TB (the Delta/Iceberg deletion-vector trade:
    read-time subtraction now, physical rewrite deferred to
    :func:`materialize_deletes` in a maintenance window).

    Same idempotent-replay contract as the epoch writer: pass an
    explicit ``delete_id`` from a ``foreachBatch`` context and a
    replayed delivery finds the marker and no-ops; omit it for
    interactive use and the next free id is allocated — allocation
    assumes a SINGLE writer, like every maintenance op in this module
    (two concurrent auto-allocating deleters can race to the same id;
    pass explicit ids to serialize externally). A torn delete
    (parquet present, marker absent) is invisible to every reader.
    Returns the delete id."""
    import json

    if len(keys_df.columns) != 1:
        raise ValueError(
            f"delete_keys wants a single key column, got {keys_df.columns}"
        )
    key = keys_df.columns[0]
    os.makedirs(out_dir, exist_ok=True)
    if delete_id is None:
        existing = committed_delete_ids(out_dir)
        delete_id = (existing[-1] + 1) if existing else 0
    target = os.path.join(out_dir, f"delete_id={delete_id}")
    marker = os.path.join(target, COMMIT_MARKER)
    if os.path.exists(marker):
        return delete_id  # replayed delete already fully delivered
    keys_df.distinct().write.mode("overwrite").parquet(target)
    with open(os.path.join(target, "_DELETE_META.json"), "w") as f:
        json.dump({"key": key}, f)
    with open(marker, "w"):
        pass
    return delete_id


def committed_delete_ids(out_dir: str) -> list[int]:
    """Delete-set ids with a commit marker, ascending."""
    if not os.path.isdir(out_dir):
        return []
    out = []
    for name in os.listdir(out_dir):
        if name.startswith("delete_id=") and os.path.exists(
            os.path.join(out_dir, name, COMMIT_MARKER)
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _delete_sets(spark: SparkSession, out_dir: str):
    """(key_column, unioned distinct key DataFrame) over every
    committed delete set, or (None, None) when there are none. All
    sets must agree on the key column — a mixed-key table is a usage
    error and fails loudly."""
    import json

    ids = committed_delete_ids(out_dir)
    if not ids:
        return None, None
    keys = set()
    paths = []
    for i in ids:
        d = os.path.join(out_dir, f"delete_id={i}")
        with open(os.path.join(d, "_DELETE_META.json")) as f:
            keys.add(json.load(f)["key"])
        paths.append(d)
    if len(keys) != 1:
        raise ValueError(
            f"committed delete sets under {out_dir} disagree on the "
            f"key column: {sorted(keys)}"
        )
    return keys.pop(), spark.read.parquet(*paths).distinct()


def read_current(spark: SparkSession, out_dir: str) -> DataFrame:
    """The CURRENT table: committed epochs minus committed delete
    sets — one left-anti join on the delete key. Delete sets are
    normally tiny relative to the data (AQE broadcasts them by
    itself; at 100 TB this is the read-time half of the
    deletion-vector trade — the subtraction rides every query until
    :func:`materialize_deletes` folds it in). History stays intact:
    :func:`read_committed` / :func:`read_committed_asof` keep
    returning the raw epoch log."""
    data = read_committed(spark, out_dir)
    key, dels = _delete_sets(spark, out_dir)
    if key is None:
        return data
    if key not in data.columns:
        raise ValueError(
            f"delete key '{key}' is not a column of the committed "
            f"data ({data.columns})"
        )
    return data.join(dels, on=key, how="left_anti")


def materialize_deletes(
    spark: SparkSession, out_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Fold the deletion vectors into the data: rewrite the committed
    epochs as :func:`read_current` (digest-validated, staging +
    trash-dir swap — the :func:`compact_epochs` protocol verbatim,
    sharing its pid lock so a concurrent reader's recovery keeps
    hands off), then drop the delete sets. Maintenance-window
    operation, amortizing the per-query anti-join away.

    Crash safety rides the existing recovery: the swap uses the same
    ``.staging_batch_id=`` / ``.trash_compact_`` names, so
    :func:`recover_compaction` rolls it forward or back untouched.
    Delete directories are removed only AFTER the swap's marker
    lands; a crash in between leaves delete sets whose keys are
    already physically gone — the anti-join then subtracts nothing
    (idempotent), and the next materialize sweeps them."""
    import shutil

    from prohap_spark.operators.compact import _digest

    ids = committed_batch_ids(out_dir)
    dids = committed_delete_ids(out_dir)
    if not ids or not dids:
        return {"materialized": 0, "epochs": ids, "delete_sets": dids}
    keep = ids[-1]
    src_paths = [os.path.join(out_dir, f"batch_id={i}") for i in ids]
    lock = os.path.join(out_dir, f".compact_lock_{keep}")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    try:
        # explicit snapshot paths, like compact_epochs: an epoch or
        # delete committed mid-materialize must not be half-applied
        data = spark.read.parquet(*src_paths)
        key, dels = _delete_sets(spark, out_dir)
        df = data.join(dels, on=key, how="left_anti")
        n, checksum = _digest(df)
        src_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for p in src_paths
            for root, _d, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )
        n_out = max(1, (src_bytes + target_bytes - 1) // target_bytes)
        staging = os.path.join(out_dir, f".staging_batch_id={keep}")
        df.repartition(int(n_out)).write.mode("overwrite").parquet(staging)
        n2, checksum2 = _digest(spark.read.parquet(staging))
        if (n, checksum) != (n2, checksum2):
            raise RuntimeError(
                f"delete materialization validation failed under "
                f"{out_dir}: rows {n} -> {n2}, checksum {checksum} -> "
                f"{checksum2}; committed epochs and delete sets are "
                "untouched, discard the staging dir"
            )
        trash = os.path.join(out_dir, f".trash_compact_{keep}")
        os.makedirs(trash)
        for p in src_paths:
            os.rename(p, os.path.join(trash, os.path.basename(p)))
        target = os.path.join(out_dir, f"batch_id={keep}")
        os.rename(staging, target)
        with open(os.path.join(target, COMMIT_MARKER), "w"):
            pass
        # delete sets last — leftover sets after a crash here are
        # idempotent no-ops against the rewritten data (see docstring)
        for i in dids:
            os.rename(
                os.path.join(out_dir, f"delete_id={i}"),
                os.path.join(trash, f"delete_id={i}"),
            )
        shutil.rmtree(trash)
    finally:
        if os.path.exists(lock):
            os.remove(lock)
    return {
        "materialized": len(dids),
        "epochs_rewritten": len(ids),
        "into": keep,
        "n_rows": n,
    }


def compact_epochs(
    spark: SparkSession, out_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Fold all currently-committed epoch directories into ONE
    compacted epoch — the sink-side answer to the small-files problem
    a micro-batch stream manufactures by design (one directory per
    epoch, often one tiny file each). Maintenance-window operation
    like every rewrite in operators/compact.py: run it while the
    stream is stopped.

    Protocol (never-in-place, fail-loud):
    1. read the committed epochs, count + checksum them
       (operators/dedup.py digest idiom);
    2. rewrite into ``batch_id=<max committed>`` via a staging
       directory sized by :func:`compact_parquet`'s byte heuristic,
       re-digest, REFUSE on mismatch (originals untouched);
    3. only then swap: originals renamed into a ``.trash_compact_<id>``
       dir, staging renamed into place, marker written, trash dropped
       — every step is a same-filesystem rename, and a crash at ANY
       point is rolled forward/back by :func:`recover_compaction` on
       the next read.

    Reusing the max committed id keeps :func:`read_committed` and the
    writer's replay contract intact: epoch ids only grow, and a
    post-restart re-delivery of that id finds the marker and no-ops
    (delivering an epoch's rows is idempotent whether the directory
    holds that epoch alone or the compacted prefix)."""
    import shutil

    from prohap_spark.operators.compact import _digest

    ids = committed_batch_ids(out_dir)
    if len(ids) < 2:
        return {"compacted": 0, "epochs": ids}
    keep = ids[-1]
    src_paths = [os.path.join(out_dir, f"batch_id={i}") for i in ids]
    # r14 (ADVICE): hold a pid lock for the whole staging-write +
    # validate + swap window so a CONCURRENT committed_batch_ids call
    # (recover_compaction) cannot mistake the live staging dir for a
    # crashed one and rmtree it mid-write. A crash leaves a stale lock
    # (dead pid) that the next recovery sweeps before rolling
    # forward/back as before.
    lock = os.path.join(out_dir, f".compact_lock_{keep}")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    try:
        # NB: read the EXPLICIT epoch paths captured in src_paths (not
        # out_dir, which would partition-discover batch_id into a data
        # column; and not read_committed, which re-lists — an epoch
        # committed between the id snapshot and the read would be
        # folded into the compacted target while its own directory
        # survives the swap, duplicating its rows)
        df = spark.read.parquet(*src_paths)
        n, checksum = _digest(df)
        src_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for p in src_paths
            for root, _d, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )
        n_out = max(1, (src_bytes + target_bytes - 1) // target_bytes)
        staging = os.path.join(out_dir, f".staging_batch_id={keep}")
        df.repartition(int(n_out)).write.mode("overwrite").parquet(staging)
        n2, checksum2 = _digest(spark.read.parquet(staging))
        if (n, checksum) != (n2, checksum2):
            raise RuntimeError(
                f"epoch compaction validation failed under {out_dir}: "
                f"rows {n} -> {n2}, checksum {checksum} -> {checksum2}; "
                "the committed epochs are untouched, discard the staging dir"
            )
        # swap (r12 ADVICE: recoverable, never a window with the data
        # only in a hidden dir): rename originals into a trash dir
        # (cheap renames — same filesystem), rename staging into place,
        # write the marker, THEN delete the trash. A crash anywhere in
        # this window leaves either the originals (trash restorable) or
        # the validated compacted epoch; recover_compaction() rolls it
        # forward/back on the next read (committed_batch_ids calls it).
        trash = os.path.join(out_dir, f".trash_compact_{keep}")
        os.makedirs(trash)
        for p in src_paths:
            os.rename(p, os.path.join(trash, os.path.basename(p)))
        target = os.path.join(out_dir, f"batch_id={keep}")
        os.rename(staging, target)
        with open(os.path.join(target, COMMIT_MARKER), "w"):
            pass
        shutil.rmtree(trash)
    finally:
        if os.path.exists(lock):
            os.remove(lock)
    return {
        "compacted": len(ids),
        "into": keep,
        "n_rows": n,
        "src_bytes": src_bytes,
    }
