"""Multimodal (image/audio/video) column plumbing: opaque `binary`
payloads + typed metadata, decoded with Arrow-batched `mapInPandas`.

The container ships no image/audio codecs, so REAL decoding is stubbed
(`decode_image_real` raises unless PIL is importable); what is real —
and tested — is everything Spark-side: the binary column schema, the
deterministic container format, the `mapInPandas` batch iteration /
output schema, frame sampling as a row-generating flatMap, and byte-level
fingerprints whose integer spec the DuckDB oracle reproduces from the
source text (payload bodies are UTF-8 of ASCII text, so byte == codepoint
and the polynomial byte hash equals the oracle's char hash).

Container format (deterministic, seeded by doc_id):
    IMG1|<width>|<height>|<body>
    AUD1|<sample_rate>|<duration_ms>|<body>
    VID1|<width>|<height>|<n_frames>|<body>

Scale shape: payloads never leave the executor (column pruning skips the
binary column unless asked); decode is a pure map over Arrow batches —
the 100 TB plan is scan → mapInPandas → write, no shuffle. Frame
sampling multiplies rows, not bytes (fingerprints only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from linear_quadtree_spark.functions.textexpr import DUCK, P1, SEED1, char_hash_expr

__all__ = [
    "synth_media",
    "decode_metadata",
    "media_metadata_sql_duck",
    "sample_frames",
    "frame_fps_sql_duck",
    "decode_image_real",
]

FRAME_CHARS = 16  # bytes of body fingerprinted per sampled frame


# ------------------------------------------------------------ synth source
def _dims_sql(id_col: str) -> dict[str, str]:
    """Deterministic fake media parameters — plain integer arithmetic,
    shared verbatim by the Spark synth and the DuckDB oracle."""
    return {
        "media_type": f"CASE {id_col} % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END",
        "width": f"64 + ({id_col} * 37) % 1856",
        "height": f"64 + ({id_col} * 53) % 1016",
        "sample_rate": f"8000 + ({id_col} * 441) % 40000",
        "duration_ms": f"500 + ({id_col} * 97) % 59500",
        "n_frames": f"4 + {id_col} % 5",
    }


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, media_type, payload:binary) — header + UTF-8 body. The
    payload column is genuine BinaryType; downstream must parse bytes."""
    d = _dims_sql(id_col)
    header = f"""
    CASE {id_col} % 3
      WHEN 0 THEN concat('IMG1|', CAST({d['width']} AS STRING), '|', CAST({d['height']} AS STRING), '|')
      WHEN 1 THEN concat('AUD1|', CAST({d['sample_rate']} AS STRING), '|', CAST({d['duration_ms']} AS STRING), '|')
      ELSE concat('VID1|', CAST({d['width']} AS STRING), '|', CAST({d['height']} AS STRING), '|', CAST({d['n_frames']} AS STRING), '|')
    END"""
    return docs.select(
        F.col(id_col),
        F.expr(d["media_type"]).alias("media_type"),
        F.expr(f"CAST(concat({header}, {text_col}) AS BINARY)").alias("payload"),
    )


# ----------------------------------------------------------- decode (stub)
_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_frames", LongType()),
        StructField("body_bytes", LongType()),
        StructField("body_fp", LongType()),
    ]
)


def _byte_fp(body: bytes, limit: int | None = None) -> int:
    h = SEED1
    for b in body if limit is None else body[:limit]:
        h = (h * 31 + b) % P1
    return h


def _parse_one(doc_id: int, payload: bytes) -> tuple:
    magic = payload[:4].decode("ascii")
    rest = payload[5:]  # skip magic + '|'
    w = h = sr = dur = nf = None
    if magic == "IMG1":
        ws, hs, body = rest.split(b"|", 2)
        w, h, mt = int(ws), int(hs), "image"
    elif magic == "AUD1":
        ss, ds, body = rest.split(b"|", 2)
        sr, dur, mt = int(ss), int(ds), "audio"
    elif magic == "VID1":
        ws, hs, ns, body = rest.split(b"|", 3)
        w, h, nf, mt = int(ws), int(hs), int(ns), "video"
    else:
        raise ValueError(f"bad media magic {magic!r} for doc {doc_id}")
    return (doc_id, mt, w, h, sr, dur, nf, len(body), _byte_fp(body))


def decode_metadata(media: DataFrame) -> DataFrame:
    """Parse each binary payload's container header → typed metadata +
    whole-body fingerprint. Arrow-batched mapInPandas (never per-row
    Python through the JVM boundary)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_parse_one(int(i), bytes(p)) for i, p in zip(pdf["doc_id"], pdf["payload"])]
            yield pd.DataFrame(rows, columns=[f.name for f in _META_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(fn, _META_SCHEMA)


def media_metadata_sql_duck(src: str = "documents", id_col: str = "doc_id") -> str:
    """Oracle: recompute the metadata from the SOURCE text (bodies are
    UTF-8 ASCII ⇒ byte hash == char hash) — independent of the Spark
    binary round trip it validates."""
    d = _dims_sql(id_col)
    e = DUCK
    return f"""
SELECT {id_col} AS doc_id,
       {d['media_type']} AS media_type,
       CASE WHEN {id_col} % 3 IN (0, 2) THEN CAST({d['width']} AS BIGINT) END AS width,
       CASE WHEN {id_col} % 3 IN (0, 2) THEN CAST({d['height']} AS BIGINT) END AS height,
       CASE WHEN {id_col} % 3 = 1 THEN CAST({d['sample_rate']} AS BIGINT) END AS sample_rate,
       CASE WHEN {id_col} % 3 = 1 THEN CAST({d['duration_ms']} AS BIGINT) END AS duration_ms,
       CASE WHEN {id_col} % 3 = 2 THEN CAST({d['n_frames']} AS BIGINT) END AS n_frames,
       CAST(length(text) AS BIGINT) AS body_bytes,
       {char_hash_expr(e, "text")} AS body_fp
FROM {src}
"""


# ---------------------------------------------------------- frame sampling
_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_fp", LongType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Video-only flatMap: one row per sampled frame with a fingerprint
    of that frame's byte slice (body[idx*16:(idx+1)*16]). The real
    video path would emit decoded frame tensors here; the slice-hash
    stands in while keeping batch shapes and row multiplication real."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[int, int, int]] = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                doc_id, payload = int(i), bytes(p)
                parsed = _parse_one(doc_id, payload)
                if parsed[1] != "video":
                    continue
                nf = parsed[6]
                body = payload.split(b"|", 4)[4]
                for f_idx in range(nf):
                    sl = body[f_idx * FRAME_CHARS : (f_idx + 1) * FRAME_CHARS]
                    out.append((doc_id, f_idx, _byte_fp(sl)))
            yield pd.DataFrame(out, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(fn, _FRAME_SCHEMA)


def frame_fps_sql_duck(src: str = "documents", id_col: str = "doc_id") -> str:
    d = _dims_sql(id_col)
    e = DUCK
    sl = f"substr(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS})"
    return f"""
WITH v AS (
  SELECT {id_col} AS doc_id, text, CAST({d['n_frames']} AS BIGINT) AS nf
  FROM {src} WHERE {id_col} % 3 = 2),
fr AS (
  SELECT doc_id, text, CAST(f.frame_idx AS BIGINT) AS frame_idx
  FROM v CROSS JOIN LATERAL (SELECT unnest(generate_series(0, CAST(v.nf - 1 AS INT))) AS frame_idx) f)
SELECT doc_id, frame_idx, {char_hash_expr(e, sl)} AS frame_fp
FROM fr
"""


# ----------------------------------------------------------- real decoders
def decode_image_real(payload: bytes):
    """Real image decode — requires PIL, which this container does not
    ship. The plumbing above is the tested surface; swap this in where a
    codec is available."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires pillow; this environment ships no codecs"
        ) from exc
