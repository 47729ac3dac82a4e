"""FASTA source/sink (SURVEY §2.1 S5/S8).

Reader: ``spark.read.text`` with ``lineSep='>'`` — every FASTA record
becomes ONE text row (header line + sequence lines), so the parse is
a pure column expression, splittable, and gz-transparent. This
replaces the reference's in-driver dict loader (common.py:16-71) —
at 0.5 GB+ (human cDNA) the sequences stay distributed instead of
being broadcast into every worker process.

Header convention (reference fasta_format_headers.py / common.py:34-50):
``>tag|accession|description`` or bare ``>accession description``.

Writer: one text row per record, 60-char wrapped sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_fasta(spark: SparkSession, path: str, truncate_version: bool = False) -> DataFrame:
    """FASTA → DataFrame(tag, accession, description, sequence).

    ``truncate_version``: strip '.N' from the accession (the
    version-truncated cDNA lookup key, common.py:59-60)."""
    recs = (
        spark.read.option("lineSep", ">").text(path)
        .where(F.length(F.trim(F.col("value"))) > 0)
    )
    header = F.substring_index(F.col("value"), "\n", 1)
    seq = F.regexp_replace(
        F.substring(F.col("value"), F.length(header) + 1, 2_000_000_000), r"\s+", ""
    )
    df = recs.select(header.alias("header"), seq.alias("sequence"))
    # limit=-1 keeps trailing empty fields: '>tag|acc|' (empty
    # description, the writer's own output) must still count 3 fields —
    # the default split drops trailing empties and mis-parsed it
    pipe_fields = F.split(F.col("header"), r"\|", -1)
    has_pipes = F.size(pipe_fields) >= 3
    tag = F.when(has_pipes, pipe_fields[0]).otherwise(F.lit("generic"))
    acc_field = F.when(has_pipes, pipe_fields[1]).otherwise(
        F.substring_index(F.col("header"), " ", 1)
    )
    desc = F.when(
        has_pipes, F.substring_index(F.col("header"), "|", -1)
    ).otherwise(
        F.when(
            F.col("header").contains(" "),
            F.expr("substring(header, instr(header, ' ') + 1)"),
        ).otherwise(F.lit(""))
    )
    accession = (
        F.substring_index(acc_field, ".", 1) if truncate_version else acc_field
    )
    return df.select(
        tag.alias("tag"),
        accession.alias("accession"),
        desc.alias("description"),
        F.col("sequence"),
    )


def write_fasta(
    df: DataFrame,
    path: str,
    tag_col: str = "tag",
    accession_col: str = "accession",
    description_col: str = "description",
    sequence_col: str = "sequence",
    wrap: int = 60,
    single_file: bool = True,
) -> None:
    """DataFrame → FASTA text: '>tag|accession|description' + wrapped
    sequence lines (prohap.py:171-193 output contract)."""
    n_chunks = F.ceil(F.length(F.col(sequence_col)) / wrap).cast("int")
    wrapped = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: F.col(sequence_col).substr(i * wrap + 1, F.lit(wrap)),
        ),
        "\n",
    )
    rec = F.concat(
        F.lit(">"),
        F.col(tag_col),
        F.lit("|"),
        F.col(accession_col),
        F.lit("|"),
        F.coalesce(F.col(description_col), F.lit("")),
        F.lit("\n"),
        wrapped,
    )
    out = df.select(rec.alias("value"))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def normalize_fasta_headers(
    df: DataFrame, tag: str = "", use_enst: bool = False
) -> DataFrame:
    """The reference's search-engine header normalization
    (peptide_annotation/src/fix_headers.py, wired by its Snakefile's
    reference_fix_headers rule with ``-t _ensref -use_ENST 1``):

    - tag coerced to the ``generic…`` family — untagged headers get
      ``generic`` + the custom tag, tags lacking the keyword are
      prefixed ``generic_``;
    - ``use_enst``: when the description names an ENST transcript, it
      REPLACES the accession (version-stripped) — the device that
      keys the Ensembl proteome by transcript instead of ENSP, which
      the U4 canonical path depends on;
    - a ``matching_proteins:`` field is guaranteed (defaulting to the
      final accession), so every entry downstream parses with the
      same micro-format (common.py:58-60).

    Pure column transform over the (tag, accession, description,
    sequence) frame ``read_fasta`` produces; compose with
    ``write_fasta`` for the file-to-file shape of the original.
    Divergence from the reference (documented): an EMPTY description
    gains no leading space before ``matching_proteins:`` (the
    original's string concat leaves one — cosmetic, and our own
    reader trims neither way)."""
    base_tag = (
        F.when(F.col("tag").contains("generic"), F.col("tag"))
        .when(
            F.col("tag") == "",
            F.concat(F.lit("generic"), F.lit(tag)),
        )
        .otherwise(F.concat(F.lit("generic_"), F.col("tag")))
    )
    # our reader tags headers without pipes as literal 'generic' —
    # those are exactly the reference's "not formatted" branch, which
    # appends the custom tag
    base_tag = F.when(
        F.col("tag") == "generic", F.concat(F.lit("generic"), F.lit(tag))
    ).otherwise(base_tag)
    enst = F.regexp_extract(F.coalesce("description", F.lit("")), r"ENST(\d+)", 1)
    accession = (
        F.when(
            F.lit(use_enst) & (enst != ""), F.concat(F.lit("ENST"), enst)
        ).otherwise(F.col("accession"))
        if use_enst
        else F.col("accession")
    )
    desc0 = F.coalesce(F.col("description"), F.lit(""))
    description = F.when(
        desc0.contains("matching_proteins:"), desc0
    ).otherwise(
        F.concat_ws(" ", F.when(desc0 != "", desc0), F.concat(F.lit("matching_proteins:"), accession))
    )
    return df.select(
        base_tag.alias("tag"),
        accession.alias("accession"),
        description.alias("description"),
        "sequence",
    )
