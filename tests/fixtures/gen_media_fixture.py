"""Regenerate tests/fixtures/media_real.parquet (committed binary fixture).

Payload construction is byte-identical to
``multimodal.synthetic_media_real(spark, n=128)`` — PPM gradient images on
even ids, 16-bit PCM WAV tones on odd ids — written via pyarrow so no Spark
session is needed.  Run from the repo root:

    python tests/fixtures/gen_media_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from staticql_spark.operators import multimodal as mm

N = 128


def rows():
    for i in range(N):
        if i % 2 == 0:
            w, h = 8, 6
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 32 + i * 7) % 256,
                    (yy * 40 + i * 13) % 256,
                    (xx * 8 + yy * 8 + i * 29) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            yield {
                "media_id": i,
                "kind": "image",
                "payload": mm.encode_image(img),
                "meta": {
                    "width": w,
                    "height": h,
                    "sample_rate": None,
                    "duration_ms": None,
                    "codec": "ppm",
                },
            }
        else:
            rate = 8000
            t = np.arange(120, dtype=np.float64)
            freq = 200.0 + (i % 7) * 100.0
            samples = 0.5 * np.sin(2.0 * np.pi * freq * t / rate)
            yield {
                "media_id": i,
                "kind": "audio",
                "payload": mm.encode_audio(samples, rate),
                "meta": {
                    "width": None,
                    "height": None,
                    "sample_rate": rate,
                    "duration_ms": 15,
                    "codec": "pcm_s16le",
                },
            }


SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), False),
        pa.field("kind", pa.string(), False),
        pa.field("payload", pa.binary()),
        pa.field(
            "meta",
            pa.struct(
                [
                    pa.field("width", pa.int32()),
                    pa.field("height", pa.int32()),
                    pa.field("sample_rate", pa.int32()),
                    pa.field("duration_ms", pa.int64()),
                    pa.field("codec", pa.string()),
                ]
            ),
        ),
    ]
)

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "media_real.parquet")
    pq.write_table(pa.Table.from_pylist(list(rows()), SCHEMA), out, compression="snappy")
    print(f"wrote {N} rows -> {out}")
