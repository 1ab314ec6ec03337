"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video assets are carried as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each task processes whole record batches (the shape
a real decoder needs — bytes in, features out — without row-at-a-time
serde).

The decode step itself is STUBBED: this container has no image/audio
libraries, so ``decode_stub_features`` derives deterministic fake
features from the payload bytes (and raising ``NotImplementedError`` is
one flag away via ``require_real_decoder=True``). Everything around it
— schema, Arrow batching, partitioning — is real and tested; swap the
body for PIL/ffmpeg in a real deployment.

Scale: payloads stay columnar end-to-end; a 100 TB corpus maps one
batch at a time with zero shuffles. Feature extraction is map-only, so
AQE/file-splitting drives parallelism, and small metadata aggregates
shuffle only post-extraction rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = ("png", "jpeg", "wav")

FEATURE_SCHEMA = (
    "doc_id long, format string, payload_len long, width int, height int, "
    "n_frames int"
)


def binary_corpus(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a multimodal-shaped corpus:
    (doc_id, payload binary, meta struct<format, declared_len>).

    The payload is the UTF-8 text bytes (a stand-in for real assets);
    the metadata struct mirrors how a real pipeline carries format tags
    alongside opaque bytes."""
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            fmt.alias("format"), F.col("n_chars").alias("declared_len")
        ).alias("meta"),
    )


def decode_stub_features(
    corpus: DataFrame, require_real_decoder: bool = False
) -> DataFrame:
    """'Decode' payloads into per-asset features via mapInPandas.

    Deterministic fake decode: features are pure functions of the byte
    length, so the full Arrow path is exercised and an SQL oracle can
    verify it. Set ``require_real_decoder`` to fail loudly where the
    stub would silently stand in for a real decoder."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if require_real_decoder:
            raise NotImplementedError(
                "real image/audio decoding requires PIL/ffmpeg; "
                "this environment ships the deterministic stub only"
            )
        for pdf in batches:
            plen = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "payload_len": plen,
                    "width": (plen % 512).astype("int32"),
                    "height": ((plen * 7) % 512).astype("int32"),
                    "n_frames": (pdf["doc_id"] % 30 + 1).astype("int32"),
                }
            )

    return corpus.mapInPandas(_decode, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, scale_x double, scale_y double"


def resize_stub(corpus: DataFrame, out_w: int = 224, out_h: int = 224) -> DataFrame:
    """'Resize' each asset to (out_w, out_h) via mapInPandas.

    Real deployment: decode → PIL/cv2 resize → re-encode; here the
    stub derives the source dims exactly as ``decode_stub_features``
    and emits the scale factors a resizer would apply. The Arrow batch
    shape (bytes in, small records out) is the real contract."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            plen = pdf["payload"].map(len)
            w = (plen % 512).astype("int64")
            h = ((plen * 7) % 512).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    # guard: stub dims of empty payloads are 0
                    "scale_x": (out_w / w.clip(lower=1)).round(6),
                    "scale_y": (out_h / h.clip(lower=1)).round(6),
                }
            )

    return corpus.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def resize_sql(out_w: int = 224, out_h: int = 224) -> str:
    plen = "octet_length(encode(text))"
    return f"""
SELECT doc_id,
  {out_w} AS out_w, {out_h} AS out_h,
  round({out_w} / CAST(greatest({plen} % 512, 1) AS DOUBLE), 6) AS scale_x,
  round({out_h} / CAST(greatest(({plen} * 7) % 512, 1) AS DOUBLE), 6) AS scale_y
FROM documents
""".strip()


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off long"


def frame_sample(corpus: DataFrame, stride: int = 10) -> DataFrame:
    """Sample every ``stride``-th frame of each 'video' asset.

    One input row fans out to n_frames/stride rows (the mapInPandas
    contract real frame extraction needs — output cardinality differs
    from input). Frame count/offsets derive deterministically from the
    payload as in decode_stub_features."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = int(doc_id % 30 + 1)
                plen = len(payload)
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(plen * i // max(n_frames, 1))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_off": offs},
            ).astype({"doc_id": "int64", "frame_idx": "int32", "frame_off": "int64"})

    return corpus.mapInPandas(_frames, schema=FRAME_SCHEMA)


def frame_sample_sql(stride: int = 10) -> str:
    plen = "octet_length(encode(text))"
    return f"""
SELECT doc_id,
  CAST(i AS INT) AS frame_idx,
  CAST({plen} * i // greatest(doc_id % 30 + 1, 1) AS BIGINT) AS frame_off
FROM documents,
     LATERAL (SELECT unnest(range(0, doc_id % 30 + 1, {stride}))) AS s(i)
""".strip()


def features_sql() -> str:
    """Oracle twin of binary_corpus ∘ decode_stub_features (DuckDB)."""
    fmt = (
        "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END"
    )
    return f"""
SELECT doc_id,
  {fmt} AS format,
  CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
  CAST(octet_length(encode(text)) % 512 AS INT) AS width,
  CAST((octet_length(encode(text)) * 7) % 512 AS INT) AS height,
  CAST(doc_id % 30 + 1 AS INT) AS n_frames
FROM documents
""".strip()
