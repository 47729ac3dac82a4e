"""FASTA as a Spark 4 Python Data Source — the engine's S5 reader
re-expressed on the MODERN extension point (`pyspark.sql.datasource`,
public API since Spark 4.0), so a user writes

    spark.dataSource.register(FastaDataSource)
    spark.read.format("fasta").load("/data/*.fa")

and gets the same (tag, accession, description, sequence) frame the
column-expression reader (sources/fasta.py::read_fasta) produces —
parity is pinned in tests/test_fasta_datasource.py against the same
files, both single and globbed.

Why keep both paths: read_fasta is pure Catalyst (lineSep split +
column expressions — whole-stage codegen, zero Python in the scan)
and stays the default; the DataSource is the EXTENSIBILITY
demonstration — per-file InputPartitions (a 10k-file corpus fans out
to 10k parallel tasks with no driver-side text munging) and a
schema() contract the planner can prune against. The parse itself is
the same '>'-record / first-line-header / pipe-field convention the
engine's sinks emit (sources/fasta.py write_fasta).

Scale note: one InputPartition per FILE keeps memory bounded by the
largest single file and needs no byte-offset splitting; genomics
FASTA corpora ship as many per-chromosome/per-sample files (the
reference's own layout), which is exactly this sharding. gz
transparency comes from Python's gzip, matching the engine's S3
(gz-transparent IO) row.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _parse_fasta_text(text: str):
    """Yield (tag, accession, description, sequence) per record —
    the same field convention as sources/fasta.py::read_fasta
    (pipe-delimited '>tag|acc|desc' headers from the engine's own
    writer; 'generic' tag + first-word accession otherwise)."""
    for rec in text.split(">"):
        if not rec.strip():
            continue
        nl = rec.find("\n")
        header, body = (rec, "") if nl < 0 else (rec[:nl], rec[nl + 1 :])
        seq = "".join(body.split())
        fields = header.split("|")
        if len(fields) >= 3:
            tag, acc = fields[0], fields[1]
            desc = header.rsplit("|", 1)[-1]
        else:
            tag = "generic"
            acc = header.split(" ", 1)[0]
            desc = header.split(" ", 1)[1] if " " in header else ""
        yield (tag, acc, desc, seq)


class _FastaPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _FastaReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fasta datasource requires a path")

    def partitions(self):
        import glob as _glob
        import os

        def visible(f: str) -> bool:
            return not os.path.basename(f).startswith(("_", "."))

        files: list[str] = []
        for m in sorted(_glob.glob(self.path)) or [self.path]:
            if os.path.isdir(m):
                # a Spark text-sink output dir (the engine's own
                # write_fasta layout): take its visible part files
                files.extend(
                    f
                    for f in sorted(_glob.glob(os.path.join(m, "*")))
                    if os.path.isfile(f) and visible(f)
                )
            elif os.path.isfile(m) and visible(m):
                files.append(m)
        if not files:
            raise FileNotFoundError(
                f"fasta datasource: no files match {self.path}"
            )
        return [_FastaPartition(f) for f in files]

    def read(self, partition: _FastaPartition):
        # Arrow RecordBatch output — the API's documented fast path
        # (one columnar batch per file instead of per-row python
        # tuples through the pickler)
        import gzip

        import pyarrow as pa

        opener = gzip.open if partition.path.endswith(".gz") else open
        with opener(partition.path, "rt") as f:
            text = f.read()
        cols = {"tag": [], "accession": [], "description": [], "sequence": []}
        for tag, acc, desc, seq in _parse_fasta_text(text):
            cols["tag"].append(tag)
            cols["accession"].append(acc)
            cols["description"].append(desc)
            cols["sequence"].append(seq)
        yield pa.RecordBatch.from_pydict(cols)


class FastaDataSource(DataSource):
    """``spark.read.format("fasta").load(path)`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self) -> str:
        return "tag string, accession string, description string, sequence string"

    def reader(self, schema) -> DataSourceReader:
        return _FastaReader(self.options)

    def writer(self, schema, overwrite: bool):
        # df.write.format("fasta").save(dir) — see _FastaWriter below
        return _FastaWriter(self.options, overwrite)


class _FastaStreamReader:
    """SimpleDataSourceStreamReader for a FASTA landing directory:
    each micro-batch consumes exactly the files that appeared since
    the last committed offset. The offset is the SORTED LIST of
    consumed file names — explicit and replayable (a crashed batch
    re-reads exactly its file set), at the cost of offset size
    growing with file count; a production deployment compacts it to
    a watermark the way Spark's own file source compacts its log.
    Exactly-once END TO END falls out of composing this with
    streaming/sink.py's idempotent writer (pinned in
    tests/test_fasta_datasource.py)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fasta_stream requires a path (directory)")

    def initialOffset(self) -> dict:
        return {"files": []}

    def _visible(self):
        import glob as _glob
        import os

        return sorted(
            f
            for f in _glob.glob(os.path.join(self.path, "*"))
            if os.path.isfile(f)
            and not os.path.basename(f).startswith(("_", "."))
        )

    def read(self, start: dict):
        seen = set(start.get("files", []))
        now = self._visible()
        new = [f for f in now if f not in seen]
        # a LIST, not a generator: the simple-reader protocol pickles
        # the batch for prefetch/replay, so rows must materialize —
        # memory is bounded by the files NEW in this batch, which the
        # trigger cadence controls
        return list(self._rows(new)), {"files": sorted(seen | set(new))}

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure replay: exactly the files between the two offsets
        seen = set(start.get("files", []))
        new = [f for f in end.get("files", []) if f not in seen]
        return list(self._rows(new))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: source files are immutable

    @staticmethod
    def _rows(files):
        import gzip

        for path in files:
            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rt") as f:
                yield from _parse_fasta_text(f.read())


class FastaStreamDataSource(DataSource):
    """``spark.readStream.format("fasta_stream").load(dir)`` — the
    streaming twin of :class:`FastaDataSource` (see
    _FastaStreamReader)."""

    @classmethod
    def name(cls) -> str:
        return "fasta_stream"

    def schema(self) -> str:
        return "tag string, accession string, description string, sequence string"

    def simpleStreamReader(self, schema):
        return _FastaStreamReader(self.options)


class _FastaCommit(WriterCommitMessage):
    def __init__(self, staged: str, n_records: int):
        self.staged = staged
        self.n_records = n_records


class _FastaWriter(DataSourceWriter):
    """Staged-commit FASTA writer (r13 — the WRITE half of the Spark 4
    Python Data Source demo): each task writes its partition to a
    hidden ``_staging`` file and returns the path as its commit
    message; the DRIVER's commit() renames every staged part into
    place (uuid-unique final names — append mode appends, never
    clobbers), deletes superseded old parts LAST in overwrite mode,
    and drops a ``_SUCCESS`` marker only after the swap — the
    standard two-phase output commit. A failed JOB leaves the old
    directory plus staged invisibles; a crash inside commit() itself
    can leave both generations glob-visible until the next commit, so
    readers needing commit atomicity gate on ``_SUCCESS``.
    abort() deletes the staged parts. Emits the SAME
    record text as sources/fasta.py::write_fasta ('>tag|acc|desc' +
    60-col wrapped sequence), pinned by the roundtrip pytest. Like
    the streaming sink, the os.rename/open plumbing is
    LOCAL-FILESYSTEM-ONLY; on HDFS/object stores the same protocol
    rides the Hadoop committer."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fasta writer requires a path")
        self.overwrite = overwrite
        self.wrap = int(options.get("wrap", "60"))

    def write(self, iterator):
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.fa")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                seq = row["sequence"] or ""
                wrapped = "\n".join(
                    seq[i : i + self.wrap] for i in range(0, max(len(seq), 1), self.wrap)
                )
                f.write(
                    f">{row['tag']}|{row['accession']}|"
                    f"{row['description'] or ''}\n{wrapped}\n"
                )
                n += 1
        return _FastaCommit(staged=fname, n_records=n)

    def commit(self, messages) -> None:
        import glob as _glob
        import os
        import shutil

        # r14 (ADVICE): final part names keep the staged uuid, so a
        # second save can NEVER silently overwrite an earlier save's
        # parts — append mode (overwrite=False) genuinely appends, and
        # repeat overwrite saves can't collide mid-swap. Order: rename
        # the new generation IN first, delete superseded files LAST —
        # a crash mid-commit leaves the old generation intact plus
        # some new parts (both visible to a raw glob until the next
        # commit), never a directory with neither; _SUCCESS lands only
        # after the swap completes, so readers that need commit
        # atomicity gate on it.
        fresh = []
        for i, m in enumerate(messages):
            if m is None:
                continue
            uid = os.path.basename(m.staged)[len("part-"):-len(".fa")]
            final = os.path.join(self.path, f"part-{i:05d}-{uid}.fa")
            os.rename(m.staged, final)
            fresh.append(final)
        if self.overwrite:
            keep = set(fresh)
            for old in _glob.glob(os.path.join(self.path, "*.fa")):
                if old not in keep:
                    os.remove(old)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import os
        import shutil

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
