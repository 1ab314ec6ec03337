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
