"""Table-maintenance operators on the correctness board (r12, the r11
verdict's ask #4): small-files compaction, z-order recluster, and URL
canonicalization — the OPTIMIZE/VACUUM-adjacent surface of a 100 TB
parquet store, previously pytest-only.

Gate design: a maintenance rewrite's entire correctness contract is
"content unchanged, layout changed" — so the compact/recluster legs
hash a deterministic content digest of the REWRITTEN directory, and
the oracle computes the same digest straight from the source table. A
rewrite that drops, duplicates, or mutates one row hash-reds; the
layout assertions (file counts, cluster spans) stay in pytest where
the filesystem is observable (tests/test_operators.py) and in
layout_zorder_cluster where the z-order math itself is oracled. The
digest is the shared md5-8-hex integer idiom (functions/hashing.py),
summed per bucket — integer sums are order-independent, so the digest
is aggregation-order-proof in both engines.

The url leg checks canonicalize_url (functions/text.py) against an
independently CONSTRUCTED expectation: the five case families cover
scheme/host lowercasing, fragment and port dropping, tracking-param
removal with param sorting, and trailing-slash stripping.
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from prohap_spark.queries.registry import register, table

# first-8-md5-hex-chars integer of a string — the md5_bucket idiom
# without the mod (values < 2^32, so per-bucket sums stay far from
# overflow at any realistic SF)
_DUCK_MD5_8 = (
    "list_reduce(list_transform(range(1, 9), "
    "i -> CAST(strpos('0123456789abcdef', substr(md5({x}), i, 1)) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b)"
)


def _md5_8(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


_MAINT_BASE = os.getpid()


def _compact_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment documents into 48 deliberately-small files, compact,
    and digest the compacted directory (doc_id%16 buckets)."""
    from prohap_spark.operators.compact import compact_parquet

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/prohap_maint_{_MAINT_BASE}/{tag}"
    src, dst = f"{base}/docs_small", f"{base}/docs_compact"
    if not os.path.exists(f"{dst}/_SUCCESS"):
        atexit.register(shutil.rmtree, base, True)
        d = table(spark, sf_dir, "documents").select("doc_id", "text")
        d.repartition(48).write.mode("overwrite").parquet(src)
        compact_parquet(spark, src, dst)
    back = spark.read.parquet(dst)
    return back.groupBy((F.col("doc_id") % 16).alias("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_md5_8(F.concat_ws("|", F.col("doc_id").cast("string"), "text"))).alias("h"),
    )


def _recluster_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders, z-order-recluster on (o_orderkey, o_custkey), and
    digest the reclustered directory (o_orderkey%16 buckets)."""
    from prohap_spark.operators.compact import recluster_parquet

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/prohap_maint_{_MAINT_BASE}/{tag}"
    src, dst = f"{base}/orders_src", f"{base}/orders_zorder"
    if not os.path.exists(f"{dst}/_SUCCESS"):
        atexit.register(shutil.rmtree, base, True)
        o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        o.write.mode("overwrite").parquet(src)
        recluster_parquet(spark, src, dst, ["o_orderkey", "o_custkey"], n_files=8)
    back = spark.read.parquet(dst)
    key = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string")
    )
    return back.groupBy((F.col("o_orderkey") % 16).alias("k")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(_md5_8(key)).alias("h")
    )


def _url_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five constructed URL case families through canonicalize_url."""
    from prohap_spark.functions.text import canonicalize_url

    d = table(spark, sf_dir, "documents").select("doc_id")
    m = (F.col("doc_id") % 7).cast("string")
    case = F.col("doc_id") % 5
    url = (
        F.when(case == 0, F.concat(F.lit("http://ex"), m, F.lit(".com/path")))
        .when(case == 1, F.concat(F.lit("HTTP://EXample"), m, F.lit(".com/Path/#sec")))
        .when(case == 2, F.concat(F.lit("http://ex"), m, F.lit(".com/p?utm_source=tw&b=2&a=1")))
        .when(case == 3, F.concat(F.lit("http://ex"), m, F.lit(".com:8080/p")))
        .otherwise(F.concat(F.lit("https://ex"), m, F.lit(".com/")))
    )
    return d.select(
        F.col("doc_id").alias("k"), canonicalize_url(url).alias("s")
    )


@register(
    "table_maintenance_board",
    f"""
    WITH docs_digest AS (
      SELECT doc_id % 16 AS k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_DUCK_MD5_8.format(x="doc_id || '|' || text")}) AS BIGINT) AS h
      FROM documents GROUP BY 1
    ),
    orders_digest AS (
      SELECT o_orderkey % 16 AS k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_DUCK_MD5_8.format(x="o_orderkey || '|' || o_custkey")}) AS BIGINT) AS h
      FROM orders GROUP BY 1
    ),
    urls AS (
      SELECT doc_id AS k,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN 'http://ex' || (doc_id % 7) || '.com/path'
               WHEN 1 THEN 'http://example' || (doc_id % 7) || '.com/Path'
               WHEN 2 THEN 'http://ex' || (doc_id % 7) || '.com/p?a=1&b=2'
               WHEN 3 THEN 'http://ex' || (doc_id % 7) || '.com/p'
               ELSE 'https://ex' || (doc_id % 7) || '.com'
             END AS s
      FROM documents
    )
    SELECT 'compact' AS leg, k, n, h, CAST(NULL AS VARCHAR) AS s
    FROM docs_digest
    UNION ALL
    SELECT 'recluster' AS leg, k, n, h, CAST(NULL AS VARCHAR) AS s
    FROM orders_digest
    UNION ALL
    SELECT 'url' AS leg, k, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS h, s
    FROM urls
    """,
)
def table_maintenance_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compact_parquet + recluster_parquet + canonicalize_url on one
    board (see the module docstring for the gate design): the
    compact/recluster legs digest the REWRITTEN directories against
    the oracle's digest of the source tables — content preservation is
    the op's whole contract — and the url leg checks the canonical
    key against a constructed expectation per case family."""
    NL, NS = F.lit(None).cast("long"), F.lit(None).cast("string")
    compact = _compact_leg(spark, sf_dir).select(
        F.lit("compact").alias("leg"), "k", "n", "h", NS.alias("s")
    )
    recluster = _recluster_leg(spark, sf_dir).select(
        F.lit("recluster").alias("leg"), "k", "n", "h", NS.alias("s")
    )
    urls = _url_leg(spark, sf_dir).select(
        F.lit("url").alias("leg"), "k", NL.alias("n"), NL.alias("h"), "s"
    )
    return compact.unionByName(recluster).unionByName(urls)
