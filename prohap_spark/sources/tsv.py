"""TSV sink/reader honoring the reference's text contracts (SURVEY §2.1
S6/S7): gz-compressed tab-separated tables whose list-valued fields are
';'-joined strings and map-valued fields 'CODE:0.00123;...' strings
(process_haplotypes.py:9-32, get_haplotypes.py:273-275).

Internally the engine keeps ArrayType/MapType columns; these writers
serialize at the boundary only (functions/encodings.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from prohap_spark.functions.encodings import (
    array_to_semi_list,
    freq_map_to_string,
    semi_list_to_array,
    string_to_freq_map,
)


def serialize_for_tsv(df: DataFrame) -> DataFrame:
    """Arrays → ';'-joined strings; map<string,double> → 'K:v;...'
    strings; everything else unchanged."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            elem = F.col(f.name)
            if not isinstance(f.dataType.elementType, T.StringType):
                elem = F.transform(elem, lambda x: x.cast("string"))
            out = out.withColumn(f.name, array_to_semi_list(elem))
        elif isinstance(f.dataType, T.MapType):
            out = out.withColumn(f.name, freq_map_to_string(F.col(f.name)))
    return out


def write_tsv(df: DataFrame, path: str, compress: bool = True, single_file: bool = False) -> None:
    out = serialize_for_tsv(df)
    if single_file:
        out = out.coalesce(1)
    w = out.write.mode("overwrite").option("sep", "\t").option("header", True)
    if compress:
        w = w.option("compression", "gzip")
    w.csv(path)


def read_tsv(
    spark: SparkSession,
    path: str,
    array_cols: list[str] | None = None,
    map_cols: list[str] | None = None,
) -> DataFrame:
    """Reader deserializing the ';'-encodings back into proper types."""
    df = spark.read.option("sep", "\t").option("header", True).csv(path)
    for c in array_cols or []:
        df = df.withColumn(c, semi_list_to_array(F.col(c)))
    for c in map_cols or []:
        df = df.withColumn(c, string_to_freq_map(F.col(c)))
    return df
