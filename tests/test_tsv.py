"""S7 TSV sink round-trip: array/map columns serialize to the
reference's ';'-encodings and come back intact."""

import glob

from pyspark.sql import functions as F


def test_tsv_round_trip(spark, tmp_path):
    from prohap_spark.sources.tsv import read_tsv, write_tsv

    df = spark.createDataFrame(
        [
            ("h1", ["c1", "c2"], {"EUR": 0.57, "AFR": 0.01}, 3),
            ("h2", [], {"EUR": 0.1}, 1),
        ],
        "hap string, changes array<string>, freqs map<string,double>, n int",
    )
    out = str(tmp_path / "tsv_out")
    write_tsv(df, out, compress=True, single_file=True)
    files = glob.glob(f"{out}/part-*.csv.gz")
    assert len(files) == 1  # gz-compressed single file (S3/S7)

    back = read_tsv(spark, out, array_cols=["changes"], map_cols=["freqs"])
    rows = {r["hap"]: r.asDict() for r in back.collect()}
    assert rows["h1"]["changes"] == ["c1", "c2"]
    assert rows["h1"]["freqs"] == {"EUR": 0.57, "AFR": 0.01}
    assert rows["h2"]["changes"] == []
    # reference 5-decimal fixed formatting on the wire
    raw = spark.read.option("sep", "\t").option("header", True).csv(out)
    wire = {r["hap"]: r["freqs"] for r in raw.collect()}
    assert wire["h1"] == "AFR:0.01000;EUR:0.57000"


def test_prohap_output_to_tsv(spark, tmp_path):
    """The ProHap result table (array samples column) writes through the
    serializer without manual casts."""
    from prohap_spark.sources.tsv import serialize_for_tsv

    df = spark.createDataFrame(
        [("T1", "9:G>A", ["S1:2", "S2:1"], 0.5)],
        "transcript_id string, cdna_changes string, samples array<string>, frequency double",
    )
    out = serialize_for_tsv(df).collect()[0]
    assert out["samples"] == "S1:2;S2:1"
