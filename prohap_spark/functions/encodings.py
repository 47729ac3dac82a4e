"""Edge (de)serialization for the reference's text encodings.

The reference encodes multi-valued attributes as ';'-joined strings and
population-frequency maps as 'CODE:0.00123;CODE:...' strings
(/root/reference/src/process_haplotypes.py:418-424,
get_haplotypes.py:273-275). Internally we keep proper ArrayType /
MapType columns; these helpers convert only at the TSV boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def semi_list_to_array(col: str | Column, sep: str = ";") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > 0, F.split(c, sep)).otherwise(F.array().cast("array<string>"))


def array_to_semi_list(col: str | Column, sep: str = ";") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(c, sep)


def string_to_freq_map(col: str | Column) -> Column:
    """'EUR:0.57;AFR:0.01' → map<string,double>."""
    c = F.col(col) if isinstance(col, str) else col
    entries = F.transform(
        F.split(c, ";"),
        lambda kv: F.struct(
            F.split(kv, ":")[0].alias("key"),
            F.split(kv, ":")[1].cast("double").alias("value"),
        ),
    )
    return F.map_from_entries(F.filter(entries, lambda e: e["key"].isNotNull() & (F.length(e["key"]) > 0)))


def freq_map_to_string(col: str | Column, decimals: int = 5) -> Column:
    """map<string,double> → 'KEY:0.00123;...' sorted by key (the
    reference emits fixed 5-decimal formatting, get_haplotypes.py:273)."""
    c = F.col(col) if isinstance(col, str) else col
    entries = F.array_sort(F.map_entries(c))
    return F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(e["key"], F.lit(":"), F.format_number(e["value"], decimals)),
        ),
        ";",
    )


def merge_freq_maps(a: Column, b: Column) -> Column:
    """Key-wise additive merge of two frequency maps (SURVEY §2.8 C15,
    reference add_population_freqs process_haplotypes.py:50-70)."""
    return F.map_zip_with(
        a, b, lambda _, v1, v2: F.coalesce(v1, F.lit(0.0)) + F.coalesce(v2, F.lit(0.0))
    )
