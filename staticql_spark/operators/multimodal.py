"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real at Spark level (schema, batching, partition sizing, UDF signatures)
AND real at codec level for the two simple containers that need no C
libraries: PPM/PGM images (netpbm binary P5/P6: header parse + numpy
reshape) and RIFF/WAV PCM audio (stdlib ``wave`` + numpy frombuffer).
``real_decode`` dispatches to these; exotic codecs (JPEG/H.264/...) remain
an injection point — pass a ``decode_fn`` backed by PIL/librosa/av in
production.

Layout stance for 100 TB of media: payload stays an opaque ``binary``
column co-located with its metadata struct in Parquet (no tiny-file zoo);
``mapInPandas`` streams Arrow batches through Python once, with
``maxRecordsPerBatch`` tuned so a batch of payloads fits executor memory.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bytewise histogram-ish
    features. Replace with PIL/librosa/ffmpeg kernels in production."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    total = max(sum(acc), 1)
    return [a / total for a in acc]


# ---------------------------------------------------------------------------
# Real codecs: netpbm (PGM P5 / PPM P6) and RIFF/WAV PCM. Pure Python +
# numpy — header parse and buffer reshape, no external media libraries.
# ---------------------------------------------------------------------------


def _pnm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer header tokens after the
    magic, skipping '#' comments; returns (tokens, offset-after-single-
    whitespace) per the netpbm spec: exactly ONE whitespace byte separates
    the maxval token from raster data."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(payload[i:j]))
        i = j
    return toks, i + 1  # single whitespace after maxval, then raster


def decode_image(payload: bytes) -> np.ndarray:
    """PGM (P5) -> (h, w) / PPM (P6) -> (h, w, 3) uint8 or uint16 array.

    Binary netpbm only (the interchange subset); maxval > 255 means
    big-endian 2-byte samples per the spec.
    """
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload (magic {magic!r})")
    (w, h, maxval), off = _pnm_tokens(payload, 3)
    channels = 3 if magic == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    count = w * h * channels
    raster = np.frombuffer(payload, dtype=dtype, count=count, offset=off)
    if raster.size < count:
        raise ValueError("truncated netpbm raster")
    arr = raster.reshape((h, w, 3)) if channels == 3 else raster.reshape((h, w))
    return arr.astype(np.uint16) if maxval > 255 else arr


def encode_image(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) -> PGM P5, (h, w, 3) -> PPM P6."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic, h, w = b"P5", *a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, (h, w) = b"P6", a.shape[:2]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM -> (float32 samples in [-1, 1] averaged to mono,
    sample_rate). 8/16/32-bit integer PCM via the stdlib wave reader."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        width = wf.getsampwidth()
        nch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # 8-bit WAV is unsigned
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        samples = (samples - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM mono WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def image_features(arr: np.ndarray, dim: int = 8) -> list[float]:
    """Fixed-``dim`` image descriptor: [mean, std, (dim-2) coarse-grid luma
    means]. Luma = channel mean; grid cells = equal row-band means, the
    deterministic analogue of a pooled embedding."""
    a = np.asarray(arr, dtype=np.float64)
    scale = 65535.0 if a.max(initial=0) > 255 else 255.0
    luma = (a.mean(axis=2) if a.ndim == 3 else a) / scale
    cells = np.array_split(luma.ravel(), max(dim - 2, 1))
    grid = [float(c.mean()) if c.size else 0.0 for c in cells]
    return [float(luma.mean()), float(luma.std())] + grid[: dim - 2]


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> list[float]:
    """Fixed-``dim`` audio descriptor: [rms, mean|x|, zero-crossing rate,
    peak, (dim-4) segment RMS energies]."""
    s = np.asarray(samples, dtype=np.float64)
    if s.size == 0:
        return [0.0] * dim
    zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if s.size > 1 else 0.0
    head = [
        float(np.sqrt(np.mean(s**2))),
        float(np.mean(np.abs(s))),
        zcr,
        float(np.max(np.abs(s))),
    ]
    segs = np.array_split(s, max(dim - 4, 1))
    energies = [float(np.sqrt(np.mean(c**2))) if c.size else 0.0 for c in segs]
    return head + energies[: dim - 4]


def real_decode(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Real bytes -> features decode for the built-in pure-Python codecs:
    ``image`` payloads must be binary PGM/PPM, ``audio`` payloads RIFF/WAV
    PCM. Other kinds (video and exotic image/audio codecs) remain the
    injection point — pass a PIL/librosa/av-backed ``decode_fn`` to
    extract_features() in production."""
    if payload is None:
        return [0.0] * dim
    if kind == "image":
        return image_features(decode_image(payload), dim)
    if kind == "audio":
        samples, rate = decode_audio(payload)
        return audio_features(samples, rate, dim)
    raise NotImplementedError(
        f"no built-in codec for kind={kind!r}; inject a decode_fn into "
        "extract_features() in production"
    )


def real_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for PGM/PPM payloads: decode, index-map
    the pixel grid, re-encode. Plug into resize_images(resize_fn=...)."""
    arr = decode_image(payload)
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_image(arr[rows][:, cols].astype(np.uint8))


HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("maxval", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
    ]
)


def parse_headers(media: DataFrame) -> DataFrame:
    """Container-header parse through the REAL pure-Python codecs, distributed
    via the same Arrow-batched ``mapInPandas`` boundary as feature extraction.

    Emits only oracle-reproducible facts — byte length, ``md5(hex(payload))``
    (hex-string md5 so a SQL engine without blob-md5 can recompute it), and
    the netpbm / RIFF header fields — which is what makes the multimodal
    plumbing externally checkable; the float feature vectors stay in
    ``extract_features`` (pytest-twinned, not SQL-reproducible).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in HEADER_SCHEMA.fields}
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(p) if p is not None else None)
                out["payload_md5"].append(
                    hashlib.md5(p.hex().upper().encode()).hexdigest()
                    if p is not None
                    else None
                )
                w = h = mx = rate = nsamp = None
                if p is not None and kind == "image":
                    (w, h, mx), _ = _pnm_tokens(p, 3)
                elif p is not None and kind == "audio":
                    samples, rate = decode_audio(p)
                    nsamp = len(samples)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(mx)
                out["sample_rate"].append(rate)
                out["n_samples"].append(nsamp)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=HEADER_SCHEMA)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] | None = None,
    dim: int = 8,
) -> DataFrame:
    """Distributed decode/feature-extract via mapInPandas (Arrow batches)."""
    fn = decode_fn or (lambda p, k: _fake_decode(p, k, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Distributed image resize via mapInPandas; same MEDIA_SCHEMA out.

    ``resize_fn(payload, w, h) -> payload`` is the injectable kernel (PIL in
    production). The default deterministic fake maps the payload onto a
    w*h byte grid by index striding, so output size really is w*h and the
    full Spark path (Arrow batch in, binary out, meta rewrite) is exercised.
    Non-image rows pass through untouched.
    """

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        if payload is None:
            return None
        n = w * h
        if len(payload) == 0:
            return bytes(n)
        return bytes(payload[(i * len(payload)) // n] for i in range(n))

    fn = resize_fn or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if k == "image":
                    out_payload.append(fn(p, width, height))
                    m = dict(m) if m is not None else {}
                    m["width"], m["height"] = width, height
                    out_meta.append(m)
                else:
                    out_payload.append(p)
                    out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling *plan* for video rows: one output row per planned
    frame timestamp (decode itself is the stubbed kernel above). Pure
    column math — demonstrates the explode-based fan-out shape."""
    frames = F.sequence(
        F.lit(0),
        F.least(
            F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms,
            F.lit(max_frames - 1),
        ).cast("long"),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 37 + j * 11) % 256 for j in range(64 + (i % 5) * 16)])
        meta = (
            (64, 48, None, None, "png")
            if kind == "image"
            else (None, None, 16000, 2_000, "pcm")
            if kind == "audio"
            else (320, 240, None, 5_000, "h264")
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media_real(spark, n: int = 64) -> DataFrame:
    """Deterministic media table whose payloads are REAL containers the
    built-in codecs parse: even rows are 8x6 PPM gradient images, odd rows
    are 120-sample 16-bit PCM WAV tones. Feeds the real bytes->features
    path end-to-end without committing binaries to the repo."""
    rows = []
    for i in range(n):
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
            payload = encode_image(img)
            meta = (w, h, None, None, "ppm")
            kind = "image"
        else:
            rate = 8000
            t = np.arange(120, dtype=np.float64)
            freq = 200.0 + (i % 7) * 100.0
            samples = 0.5 * np.sin(2.0 * np.pi * freq * t / rate)
            payload = encode_audio(samples, rate)
            meta = (None, None, rate, int(120 * 1000 / rate), "pcm_s16le")
            kind = "audio"
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def image_ahash_small(media: DataFrame, max_bits: int = 52) -> DataFrame:
    """Average-hash (aHash) near-dup fingerprint for SMALL binary PPM
    rasters, computed entirely in JVM expressions over the hex payload —
    integer-exact end to end, so the DuckDB oracle replays it
    bit-for-bit: per pixel luma3 = r+g+b, bit_i = (luma3_i * npix >
    sum(luma3)), hash = Σ bit_i·2^i.

    Returns image rows only: (media_id, width, height, ahash, canonical,
    n_dups) where canonical/n_dups group identical hashes (min-id
    canonical — the aHash-exact duplicate family).

    This expression path exists for oracle parity and thumbnail-scale
    rasters (npix <= ``max_bits`` = 52 so 2^i stays float-exact; the
    per-pixel expression tree is
    O(npix)).  The production path for real images is decode_image /
    image_features over the Arrow-batched mapInPandas boundary, with
    this same bit rule applied to the numpy array
    (tests/test_multimodal.py locks the two paths equal).
    """
    from pyspark.sql import Window

    # Per-row staging (r14, guide §4.1): the composed-expression form put
    # hex(payload), the header regexes, and the whole luma transform
    # INSIDE per-element lambdas — higher-order lambdas are interpreted
    # with no common-subexpression elimination, so hex()/regex ran 3x per
    # pixel and the total re-ran the full luma decode once per BIT
    # (~8k hex() evaluations per row; measured 1.3-1.5 s for the 128-row
    # fixture).  Staged as real columns the decode runs once; each staged
    # alias is non-cheap and multiply-referenced, so CollapseProject
    # keeps the projections apart.  Same expressions, same order —
    # values are bit-identical.
    hx = F.col("_hx")
    header = F.regexp_extract(hx, r"^50360A(?:..)*?0A(?:..)*?0A", 0)
    width = F.decode(
        F.unhex(F.regexp_extract(hx, "^50360A((?:..)*?)20", 1)), "UTF-8"
    ).cast("int")
    height = F.decode(
        F.unhex(F.regexp_extract(hx, "^50360A(?:..)*?20((?:..)*?)0A", 1)), "UTF-8"
    ).cast("int")

    def byte_at(hpos: "F.Column") -> "F.Column":
        return F.conv(F.substring(hx, hpos, 2), 16, 10).cast("long")

    staged = (
        media.filter(F.col("kind") == "image")
        .select("media_id", F.hex(F.col("payload")).alias("_hx"))
        .select(
            "media_id",
            "_hx",
            F.length(header).alias("_off"),  # raster starts at _off+1 (1-based)
            width.alias("width"),
            height.alias("height"),
        )
        .withColumn("_npix", (F.col("width") * F.col("height")).cast("long"))
        .withColumn(
            "_luma",
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.col("_npix") - 1),
                lambda i: byte_at(F.col("_off") + 6 * i + 1)
                + byte_at(F.col("_off") + 6 * i + 3)
                + byte_at(F.col("_off") + 6 * i + 5),
            ),
        )
    )
    npix = F.col("_npix")
    luma = F.col("_luma")
    # total folds the STAGED luma attribute, so its per-bit re-evaluation
    # inside the zip_with lambda is 52 long-adds, not a payload re-decode
    total = F.aggregate(luma, F.lit(0).cast("long"), lambda a, x: a + x)
    ahash = F.aggregate(
        F.zip_with(
            luma,
            F.sequence(F.lit(0).cast("long"), npix - 1),
            lambda l, i: F.when(
                l * npix > total, F.pow(F.lit(2.0), i).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    imgs = staged.select("media_id", "width", "height", ahash.alias("ahash"))
    w = Window.partitionBy("ahash")
    return imgs.select(
        "media_id",
        "width",
        "height",
        "ahash",
        F.min("media_id").over(w).alias("canonical"),
        F.count("*").over(w).cast("long").alias("n_dups"),
    )


def ahash_np(arr: np.ndarray) -> int:
    """NumPy twin of image_ahash_small's bit rule for (h, w, 3) uint8."""
    luma = arr.astype(np.int64).sum(axis=2).reshape(-1)
    npix = luma.size
    total = int(luma.sum())
    bits = (luma * npix) > total
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def audio_energy_hash_small(media: DataFrame, blocks: int = 8) -> DataFrame:
    """Energy-contour hash for SMALL canonical mono 16-bit WAV payloads —
    the audio twin of :func:`image_ahash_small`, JVM-expression path,
    integer-exact: samples decode as signed int16 LE straight off the
    hex payload (canonical 44-byte header, data at byte 45), the clip is
    split into ``blocks`` equal blocks (remainder samples dropped),
    block energy = Σ|s|, bit_b = (energy_b · blocks > total), hash =
    Σ bit_b·2^b.  Two tones with the same loudness SHAPE collide even
    at different frequencies; families group by identical hash with a
    min-id canonical.

    Returns audio rows only: (media_id, n_samples, total_energy, ehash,
    canonical, n_dups).  Expression path for oracle parity on
    fixture-scale clips; production audio goes through decode_audio /
    audio_features over mapInPandas (numpy twin locked by test).
    """
    from pyspark.sql import Window

    # Per-row staging (r14, guide §4.1) — same fix as image_ahash_small:
    # the composed form re-ran hex(payload) + the int16 decode inside
    # every per-element lambda (2 hex substrings per sample, re-decoded
    # per block and per bit).  Staged columns decode once; the staged
    # aliases are non-cheap and multiply-referenced, so CollapseProject
    # keeps the stages apart.  Same expressions, same order — values are
    # bit-identical.
    hx = F.col("_hx")

    def byte_at(hpos):
        return F.conv(F.substring(hx, hpos, 2), 16, 10).cast("long")

    data_size = (
        byte_at(F.lit(81))
        + 256 * byte_at(F.lit(83))
        + 65536 * byte_at(F.lit(85))
        + 16777216 * byte_at(F.lit(87))
    )

    def sample_at(i):
        raw = byte_at(F.lit(89) + 4 * i) + 256 * byte_at(F.lit(91) + 4 * i)
        return F.when(raw >= 32768, raw - 65536).otherwise(raw)

    staged = (
        media.filter(F.col("kind") == "audio")
        .select("media_id", F.hex(F.col("payload")).alias("_hx"))
        .withColumn("_nsamp", (data_size / 2).cast("long"))
        .withColumn("_blk", F.floor(F.col("_nsamp") / blocks).cast("long"))
        .withColumn("_used", (F.col("_blk") * blocks).cast("int"))
        .withColumn(
            "_absarr",
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.col("_used").cast("long") - 1),
                lambda i: F.abs(sample_at(i)),
            ),
        )
        .withColumn(
            "_total",
            F.aggregate(F.col("_absarr"), F.lit(0).cast("long"), lambda a, x: a + x),
        )
    )
    blk = F.col("_blk")
    total = F.col("_total")
    # block energies re-slice the STAGED |sample| array (long adds), not
    # the hex payload; the energies array itself is consumed once, as the
    # zip_with input (row-level, evaluated once)
    energies = F.transform(
        F.sequence(F.lit(0), F.lit(blocks - 1)),
        lambda b: F.aggregate(
            F.slice(F.col("_absarr"), (b * blk + 1).cast("int"), blk.cast("int")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    ehash = F.aggregate(
        F.zip_with(
            energies,
            F.sequence(F.lit(0), F.lit(blocks - 1)),
            lambda e, b: F.when(
                e * blocks > total, F.pow(F.lit(2.0), b).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    auds = staged.select(
        "media_id",
        F.col("_nsamp").alias("n_samples"),
        F.col("_total").alias("total_energy"),
        ehash.alias("ehash"),
    )
    w = Window.partitionBy("ehash")
    return auds.select(
        "media_id",
        "n_samples",
        "total_energy",
        "ehash",
        F.min("media_id").over(w).alias("canonical"),
        F.count("*").over(w).cast("long").alias("n_dups"),
    )


def energy_hash_np(samples: np.ndarray, blocks: int = 8) -> tuple[int, int]:
    """NumPy twin of audio_energy_hash_small's bit rule for int16 PCM.
    Returns (total_energy, ehash)."""
    s = np.abs(samples.astype(np.int64))
    blk = s.size // blocks
    used = s[: blk * blocks]
    total = int(used.sum())
    h = 0
    for b in range(blocks):
        if int(used[b * blk : (b + 1) * blk].sum()) * blocks > total:
            h |= 1 << b
    return total, h
