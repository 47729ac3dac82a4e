"""VCF source/sink (SURVEY §2.1 S1/S2/S9 + §7.3.2 genotype modeling).

The reference streams VCF text per chromosome and keeps one genotype
COLUMN per sample (3,202 for 1kGP) — a layout that would wreck
Catalyst at plan time. Here the fixed columns get a real schema and
the genotype matrix becomes ONE ``genotypes array<string>`` column,
melted to long format on demand (sample_idx, hap1, hap2) — the
100 TB-safe layout (SURVEY §7.3.2; reference wide format at
vcf_filter_fix.py:71-126, vcf_reader.py:79-125).

Readers are pure ``spark.read.text`` + column expressions: splittable,
predicate-pushdown-friendly after the first projection, gz-transparent
(S3 codec inference is native).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

VCF_CORE = ["chrom", "pos", "id", "ref", "alt", "qual", "filter", "info", "format"]


def read_vcf_header(spark: SparkSession, path: str) -> list[str]:
    """Sample names from the #CHROM header line (driver-side: the
    header is one line; this is metadata, not data)."""
    header = (
        spark.read.text(path)
        .where(F.col("value").startswith("#CHROM"))
        .limit(1)
        .collect()
    )
    if not header:
        return []
    cols = header[0]["value"].split("\t")
    return cols[9:]


def read_vcf_meta_header(spark: SparkSession, path: str) -> list[str]:
    """The '##' meta-header block, in file order (S9 header
    preservation: the reference copies the whole header through its
    filter pass, vcf_filter_fix.py:48-63). Bounded driver-side collect —
    the header is metadata, a few hundred lines at most."""
    rows = (
        spark.read.text(path)
        .where(F.col("value").startswith("##"))
        .collect()
    )
    return [r["value"] for r in rows]


def read_vcf(spark: SparkSession, path: str) -> DataFrame:
    """VCF text → DataFrame(chrom, pos, id, ref, alt, qual, filter,
    info, format, genotypes array<string>, af double).

    Glob paths supported natively (S2); '#' headers dropped by filter
    (S1); AF/MAF extracted from INFO (F1, vcf_reader.py:7-22)."""
    lines = spark.read.text(path).where(~F.col("value").startswith("#"))
    parts = F.split(F.col("value"), "\t")
    df = lines.select(
        parts[0].alias("chrom"),
        parts[1].cast("long").alias("pos"),
        parts[2].alias("id"),
        parts[3].alias("ref"),
        parts[4].alias("alt"),
        parts[5].alias("qual"),
        parts[6].alias("filter"),
        parts[7].alias("info"),
        parts[8].alias("format"),
        F.slice(parts, 10, 1_000_000).alias("genotypes"),
    )
    af = F.regexp_extract(F.col("info"), r"(?:^|;)M?AF=([^;]+)", 1)
    return df.withColumn("af_raw", af)


def split_multiallelic(df: DataFrame) -> DataFrame:
    """Explode comma-separated ALT alleles into one row per allele with
    its per-allele AF, renumbering genotypes to {0,1} (the matched
    allele index → 1, everything else → 0) and normalizing haploid
    calls to 'x|0' — reference semantics at vcf_filter_fix.py:83-113
    and common.py:73-84."""
    alts = F.split(F.col("alt"), ",")
    afs = F.split(F.col("af_raw"), ",")
    out = df.select(
        *VCF_CORE[:4],
        F.posexplode(alts).alias("allele_idx", "alt_allele"),
        F.col("qual"),
        F.col("filter"),
        F.col("info"),
        F.col("format"),
        F.col("genotypes"),
        afs.alias("afs"),
    )
    allele_no = (F.col("allele_idx") + 1).cast("string")
    af = F.element_at(F.col("afs"), F.col("allele_idx") + 1).cast("double")
    # GT renumber: token == matched allele index -> '1', else '0';
    # haploid 'x' -> 'x|0'
    gt_norm = F.transform(
        F.col("genotypes"),
        lambda gt: F.array_join(
            F.transform(
                F.split(
                    F.when(gt.contains("|"), gt).otherwise(F.concat(gt, F.lit("|0"))),
                    r"\|",
                ),
                lambda tok: F.when(tok == allele_no, F.lit("1")).otherwise(F.lit("0")),
            ),
            "|",
        ),
    )
    return out.select(
        "chrom",
        "pos",
        "id",
        "ref",
        F.col("alt_allele").alias("alt"),
        "qual",
        "filter",
        "info",
        F.lit("GT").alias("format"),
        gt_norm.alias("genotypes"),
        af.alias("af"),
    )


def filter_valid_alleles(df: DataFrame) -> DataFrame:
    """F2: REF/ALT must be [ACGT]+ or '-' (vcf_reader.py:24-29)."""
    ok = lambda c: F.col(c).rlike("^[ACGTacgt]+$") | (F.col(c) == "-")  # noqa: E731
    return df.where(ok("ref") & ok("alt"))


def melt_genotypes(df: DataFrame, sample_names: list[str]) -> DataFrame:
    """Long-format genotypes: one row per (variant, sample) with phased
    haplotype alleles hap1/hap2 int. Carriers-only filter should follow
    (most genotypes are 0|0 — filter early, this is the big explode)."""
    names = F.array(*[F.lit(s) for s in sample_names])
    af = F.col("af") if "af" in df.columns else F.lit(None).cast("double")
    melted = df.select(
        "chrom",
        "pos",
        "ref",
        "alt",
        F.col("id").alias("vcf_id"),
        af.alias("af"),
        F.posexplode("genotypes").alias("sample_idx", "gt"),
    )
    toks = F.split(F.col("gt"), r"\|")
    return melted.select(
        "chrom",
        "pos",
        "ref",
        "alt",
        "vcf_id",
        "af",
        "sample_idx",
        F.element_at(names, F.col("sample_idx") + 1).alias("sample_name"),
        toks[0].cast("int").alias("hap1"),
        toks[1].cast("int").alias("hap2"),
    )


def write_vcf(
    df: DataFrame,
    path: str,
    sample_names: list[str] | None = None,
    meta_header: list[str] | None = None,
) -> None:
    """S9: re-emit VCF rows as text (header + tab-joined columns),
    single header via a union. ``meta_header``: '##' lines (e.g. from
    read_vcf_meta_header) written verbatim above the #CHROM line — the
    reference preserves the entire source header block
    (vcf_filter_fix.py:48-63). Partition-per-chromosome layout comes
    from partitionBy on the caller side (S10)."""
    cols = [F.col(c) for c in VCF_CORE]
    # sample-less VCFs (e.g. the csv_to_vcf custom-variant shim) have
    # no genotypes column — emit the 9 core columns alone
    tail = (
        [F.array_join(F.col("genotypes"), "\t")]
        if "genotypes" in df.columns
        else []
    )
    body = df.select(F.concat_ws("\t", *cols, *tail).alias("value"))
    header_cols = "\t".join(
        ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]
        + (sample_names or [])
    )
    header_lines = [(line,) for line in (meta_header or [])] + [(header_cols,)]
    header = body.sparkSession.createDataFrame(header_lines, ["value"])
    header.unionByName(body).coalesce(1).write.mode("overwrite").text(path)


def csv_to_vcf(
    df: DataFrame,
    chrom_col: str = "chrom",
    pos_col: str = "pos",
    id_col: str = "accession",
    ref_col: str = "ref",
    alt_col: str = "alt",
) -> DataFrame:
    """The reference's custom-variant ingest shim (src/csv_to_vcf.py:
    formats an arbitrary tabular variant list into VCF shape so ProVar
    can consume user-supplied variants): map the five named columns
    onto the VCF core, dot-fill QUAL/FILTER/INFO, order by
    (chrom, pos). Returns a frame in this module's lower-case core
    schema — compose with ``write_vcf`` (which emits the #CHROM header
    row) for the original's file-to-file behavior; the sort matches
    the original's sort_values(['#CHROM','POS']) string-major order
    only when chromosomes are compared alike, so chrom sorts AS TEXT
    here too (the reference sorts the '#CHROM' object column —
    lexicographic for string chroms)."""
    out = df.select(
        F.col(chrom_col).cast("string").alias("chrom"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(id_col).cast("string").alias("id"),
        F.col(ref_col).cast("string").alias("ref"),
        F.col(alt_col).cast("string").alias("alt"),
        F.lit(".").alias("qual"),
        F.lit(".").alias("filter"),
        F.lit(".").alias("info"),
        F.lit(".").alias("format"),
    )
    return out.orderBy(F.col("chrom").cast("string"), "pos")
