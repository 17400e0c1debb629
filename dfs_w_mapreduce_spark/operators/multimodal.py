"""Multimodal column conventions: opaque binary payloads + typed metadata.

The engine's convention for image/audio/video at 100 TB:
- payload: ``BinaryType`` column (parquet stores it page-compressed;
  Spark never interprets it),
- metadata: flat typed columns (mime/size/checksum/...) kept NEXT TO
  the payload so predicate pushdown can skip payload pages entirely
  when a filter touches only metadata,
- decode / feature-extract: Arrow-batched ``mapInPandas`` so bytes
  cross the JVM->Python boundary once per batch, not per row.

The container has no image/audio codecs, so the real decoders are
stubbed behind import-tries (``decode_image``/``decode_audio`` raise
NotImplementedError with a clear message); the *deterministic fake*
feature extractor below exercises the identical Spark plumbing —
schema, batching, partitioning — and is oracle-checkable because its
arithmetic is reproducible in SQL.

Fixtures carry no real binary column, so payloads are synthesized as
UTF-8 bytes of ``documents.text`` — byte-for-byte identical in both
engines (DuckDB ``encode()``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table
from dfs_w_mapreduce_spark.registry import QuerySpec

try:  # real codecs, absent in this container — gate behind import-try
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes) -> "object":
    """Decode an image payload. Stub: PIL is not available in the v1
    container; the Spark-side plumbing (schema/batching) is exercised
    by the deterministic fake extractor instead."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL, not present in this environment; "
            "use fake_features / multimodal_features for plumbing tests"
        )
    raise NotImplementedError("real decode path reserved for codec-enabled builds")


# ---------------------------------------------------- real binary codecs
#
# WAV (RIFF) and BMP are pure-arithmetic public formats, so their decode
# path can be REAL in this container (struct.unpack, no codec library).
# Fixture parquet has no media column, so a builder synthesizes valid
# files deterministically from document attributes; the decoder then
# parses the actual bytes back. The oracle recomputes the decoded fields
# arithmetically — any offset/endianness bug in builder or parser breaks
# the hash match.

import struct


def build_wav(sample_rate: int, n_channels: int, n_samples: int) -> bytes:
    """Minimal valid 16-bit PCM WAV: RIFF header + fmt + data chunks."""
    bits = 16
    block_align = n_channels * bits // 8
    data_size = n_samples * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16,  # fmt chunk size
            1,  # PCM
            n_channels,
            sample_rate,
            sample_rate * block_align,  # byte rate
            block_align,
            bits,
        )
        + b"data"
        + struct.pack("<I", data_size)
        + bytes(data_size)
    )


def decode_wav(b: bytes) -> dict:
    """Real RIFF/WAVE parser: walks the chunk list, returns the fmt
    fields and data size. Raises on malformed input."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    out: dict = {"file_size": riff_size + 8}
    pos = 12
    while pos + 8 <= len(b):
        cid, csize = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"fmt ":
            (fmt, ch, rate, _brate, balign, bits) = struct.unpack_from(
                "<HHIIHH", b, pos + 8
            )
            out.update(
                audio_format=fmt, n_channels=ch, sample_rate=rate,
                block_align=balign, bits_per_sample=bits,
            )
        elif cid == b"data":
            out["data_size"] = csize
        pos += 8 + csize + (csize & 1)  # RIFF chunks are word-aligned
    return out


def build_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bit BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    zeroed pixel array with 4-byte row alignment."""
    stride = (width * 3 + 3) // 4 * 4
    pixel_bytes = stride * height
    file_size = 54 + pixel_bytes
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      pixel_bytes, 2835, 2835, 0, 0)
        + bytes(pixel_bytes)
    )


def decode_bmp(b: bytes) -> dict:
    """Real BMP header parser (BITMAPINFOHEADER variant)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP file")
    file_size, _, _, data_offset = struct.unpack_from("<IHHI", b, 2)
    hdr_size, width, height, _planes, bpp = struct.unpack_from("<IiiHH", b, 14)
    if hdr_size < 40:
        raise ValueError("unsupported DIB header")
    return {
        "file_size": file_size,
        "data_offset": data_offset,
        "width": width,
        "height": height,
        "bpp": bpp,
    }


DECODE_SCHEMA = (
    "doc_id long, wav_sample_rate int, wav_channels int, wav_bits int, "
    "wav_block_align int, wav_data_size long, wav_file_size long, "
    "bmp_width int, bmp_height int, bmp_bpp int, bmp_file_size long"
)


def _build_decode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Build a valid WAV and BMP per document (params derived from
    doc_id / n_chars), then parse the actual bytes back with the real
    chunk-walking decoders. Any offset/endianness/alignment bug in
    builder OR parser changes the decoded fields and breaks the oracle
    hash match — the decode path is real, not a fake."""
    for pdf in batches:
        rows = []
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            doc_id, n_chars = int(doc_id), int(n_chars)
            rate = 8000 * (1 + doc_id % 3)
            ch = 1 + doc_id % 2
            n_samples = n_chars % 1000 + 1
            wav = decode_wav(build_wav(rate, ch, n_samples))
            width = n_chars % 64 + 1
            height = doc_id % 48 + 1
            bmp = decode_bmp(build_bmp(width, height))
            rows.append(
                (
                    doc_id,
                    wav["sample_rate"], wav["n_channels"], wav["bits_per_sample"],
                    wav["block_align"], wav["data_size"], wav["file_size"],
                    bmp["width"], bmp["height"], bmp["bpp"], bmp["file_size"],
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "wav_sample_rate", "wav_channels", "wav_bits",
                "wav_block_align", "wav_data_size", "wav_file_size",
                "bmp_width", "bmp_height", "bmp_bpp", "bmp_file_size",
            ],
        )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real binary decode: synthesize valid RIFF/WAVE and BMP files
    per document and parse them back (struct-level chunk walking, no
    codec library — both formats are pure-arithmetic public specs).
    The oracle recomputes every decoded field from the same params, so
    the builder->parser roundtrip is hash-verified end to end."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "n_chars").mapInPandas(
        _build_decode_media, schema=DECODE_SCHEMA
    )


MULTIMODAL_DECODE_ORACLE = """
    SELECT doc_id,
           CAST(8000 * (1 + doc_id % 3) AS INT) AS wav_sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS wav_channels,
           CAST(16 AS INT) AS wav_bits,
           CAST((1 + doc_id % 2) * 2 AS INT) AS wav_block_align,
           CAST((n_chars % 1000 + 1) * (1 + doc_id % 2) * 2 AS BIGINT) AS wav_data_size,
           CAST(44 + (n_chars % 1000 + 1) * (1 + doc_id % 2) * 2 AS BIGINT) AS wav_file_size,
           CAST(n_chars % 64 + 1 AS INT) AS bmp_width,
           CAST(doc_id % 48 + 1 AS INT) AS bmp_height,
           CAST(24 AS INT) AS bmp_bpp,
           CAST(54 + (((n_chars % 64 + 1) * 3 + 3) // 4) * 4 * (doc_id % 48 + 1)
                AS BIGINT) AS bmp_file_size
    FROM documents
"""


def media_manifest(docs: DataFrame) -> DataFrame:
    """Binary payload + typed metadata columns from the documents
    table (the ingest convention)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def q_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection of the manifest — the query shape that must
    NOT read payload bytes at scale (payload column pruned; see
    tests/test_plans.py)."""
    m = media_manifest(load_table(spark, sf_dir, "documents"))
    return m.select("doc_id", "mime", "n_bytes", "checksum")


MULTIMODAL_MANIFEST_ORACLE = """
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS checksum  -- DuckDB md5 is VARCHAR-only; same UTF-8 bytes
    FROM documents
"""

FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, brightness double"
)


def fake_feature_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder: derives 'media features' from the
    payload bytes with pure arithmetic (stands in for PIL/ffmpeg while
    keeping identical batch shape and schema)."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "width": (n % 640).astype("int32"),
                "height": ((n * 7) % 480).astype("int32"),
                "n_frames": (n % 30 + 1).astype("int32"),
                "brightness": (first / 255.0).round(4),
            }
        )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract pipeline shape: manifest ->
    mapInPandas(extractor) with Arrow batching. Swapping
    ``fake_feature_extract`` for a real codec is a one-function
    change; schema/partitioning/batch flow are production-shaped."""
    m = media_manifest(load_table(spark, sf_dir, "documents"))
    return m.select("doc_id", "payload").mapInPandas(
        fake_feature_extract, schema=FEATURES_SCHEMA
    )


MULTIMODAL_FEATURES_ORACLE = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
           CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames,
           round(ascii(substr(text, 1, 1)) / 255.0, 4) AS brightness
    FROM documents
"""


FRAME_STEP = 5


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: treat each payload as a video of n_frames
    (derived deterministically) and emit every 5th frame index with a
    per-frame fake feature — the explode shape of real frame
    extraction, expression-level (a real decoder would swap in via
    mapInPandas like q_multimodal_features)."""
    m = media_manifest(load_table(spark, sf_dir, "documents"))
    n_frames = (F.col("n_bytes") % 30 + 1).cast("int")
    frames = F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_STEP))
    return m.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.explode(frames).alias("frame_idx"),
    ).withColumn(
        "frame_fp",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("frame_idx").cast("string"))),
    )


MULTIMODAL_FRAMES_ORACLE = f"""
    SELECT doc_id,
           CAST(n_frames AS INT) AS n_frames,
           CAST(frame_idx AS INT) AS frame_idx,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)) AS frame_fp
    FROM (
        SELECT doc_id, octet_length(encode(text)) % 30 + 1 AS n_frames
        FROM documents
    ), LATERAL (SELECT unnest(range(0, n_frames, {FRAME_STEP})) AS frame_idx)
"""


# Spark workers run in separate Python processes that may not have
# this repo on sys.path (the round driver can run from any cwd), so
# worker-executed functions from this module must be serialized by
# value, not by module reference.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def specs() -> list[QuerySpec]:
    return [
        QuerySpec("multimodal_manifest", q_multimodal_manifest, MULTIMODAL_MANIFEST_ORACLE,
                  ("multimodal", "llm"),
                  "Binary payload + typed metadata manifest (metadata-only projection)."),
        QuerySpec("multimodal_features", q_multimodal_features, MULTIMODAL_FEATURES_ORACLE,
                  ("multimodal", "llm", "pandas"),
                  "Arrow-batched mapInPandas feature extraction (deterministic fake decoder)."),
        QuerySpec("multimodal_frames", q_multimodal_frames, MULTIMODAL_FRAMES_ORACLE,
                  ("multimodal", "llm"),
                  "Every-5th frame sampling with per-frame fingerprints."),
        QuerySpec("multimodal_decode", q_multimodal_decode, MULTIMODAL_DECODE_ORACLE,
                  ("multimodal", "llm", "pandas"),
                  "Real WAV/BMP build->parse roundtrip, fields hash-verified."),
    ]
