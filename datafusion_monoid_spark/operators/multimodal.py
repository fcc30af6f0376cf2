"""Multimodal columns: opaque BINARY payloads + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched pipeline stages.

Design for 100 TB: media bytes ride as an opaque ``BinaryType`` column
(at real scale: content-addressed object-store references + byte ranges,
same schema), metadata is a typed struct usable for pruning/partitioning
WITHOUT touching bytes, and every byte-touching stage is ``mapInPandas``
(per-partition Arrow batches — no per-row Python, no driver collect).

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
container; the decode stage is therefore **stubbed**:

* ``decoder="fake"`` (default) — a deterministic stand-in (byte
  histogram) so the full pipeline shape (schema, partitioning, UDF
  signature, batch flow) is real and testable end-to-end.
* any other decoder — raises ``NotImplementedError`` with the exact
  integration point named.  Swapping in a real codec changes ONLY the
  body of ``_decode_batch``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 16
FRAME_BYTES = 4


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = md5 bytes of the text, typed
    metadata struct alongside.  Stands in for real image/audio ingestion;
    everything downstream treats the bytes as opaque."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return docs.select(
        "doc_id",
        payload.alias("media"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_fake_media_frames(docs: DataFrame,
                             text_col: str = "text",
                             chunk_tokens: int = 8) -> DataFrame:
    """Deterministic FRAME-STRUCTURED fake media: the payload is the
    concatenation of md5 digests of consecutive ``chunk_tokens``-token
    text chunks — a stand-in with the byte layout real media has
    (per-frame/per-region coherence), unlike :func:`attach_fake_media`'s
    single digest which is all-or-nothing under any byte-level
    comparison.  Near-duplicate texts share most chunks, hence most
    16-byte payload regions — exactly what byte-shingle near-dup
    detection needs to demonstrate on.  Everything downstream treats
    the bytes as opaque.  Chunking tokenizes with ``dedup.tokens`` —
    the SAME normalization contract the DuckDB twin rebuilds from
    ``dedup.NORMALIZE_SQL``; an inline copy would silently diverge if
    normalization ever changes."""
    from datafusion_monoid_spark.operators.dedup import tokens

    toks = tokens(text_col)
    n_chunks = F.ceil(F.size(toks) / chunk_tokens).cast("int")
    hx = F.when(
        F.size(toks) > 0,
        F.array_join(
            F.transform(F.sequence(F.lit(0), n_chunks - 1),
                        lambda i: F.md5(F.concat_ws(
                            " ", F.slice(toks, i * chunk_tokens + 1,
                                         chunk_tokens)))), ""),
    ).otherwise(F.lit(""))
    payload = F.unhex(hx)
    return docs.select(
        "doc_id",
        payload.alias("media"),
        F.struct(
            F.lit("fake/frames16").alias("format"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_batch(buf: bytes, decoder: str) -> np.ndarray:
    """The single integration point for real codecs."""
    if decoder == "fake":
        # deterministic stand-in: 16-bin byte histogram, L1-normalized
        arr = np.frombuffer(buf, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float32)
        return hist / max(hist.sum(), 1.0)
    raise NotImplementedError(
        f"decoder={decoder!r}: real media decoding (PIL/ffmpeg/librosa) is "
        "not available in this environment; implement _decode_batch for it.")


def decode_features(df: DataFrame, media_col: str = "media",
                    decoder: str = "fake") -> DataFrame:
    """media BINARY -> features ARRAY<FLOAT>[16] via mapInPandas.

    Arrow batches in, Arrow batches out; partitioning untouched, so this
    pipelines after a parquet scan with no extra shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if b is None else _decode_batch(bytes(b), decoder).tolist()
                for b in pdf[media_col]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", media_col).mapInPandas(
        run, schema="doc_id long, features array<float>")


def byte_shingles(media_col: str = "media", n: int = 4) -> F.Column:
    """Distinct n-byte shingles of a BINARY column as lowercase hex
    strings — a pure expression (dynamic-offset substring on binary +
    hex), no Python, no decode.  The multimodal near-dup key: feed the
    result to ``dedup.minhash_from_shingles`` and the whole text
    MinHash+LSH tier applies verbatim to opaque media payloads — byte
    shingles catch containment/offset/concatenation variants of the
    same bytes (re-encoded media needs the codec-gated perceptual
    hash; this tier is the codec-free story).  Guarded for payloads
    shorter than n bytes (Spark's ``sequence`` DESCENDS for negative
    spans)."""
    m = F.col(media_col) if isinstance(media_col, str) else media_col
    ln = F.length(m)
    return F.when(
        ln >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), ln - n + 1),
                        lambda i: F.lower(F.hex(F.substring(m, i, n))))),
    ).otherwise(F.array().cast("array<string>"))


def byte_shingles_sql(expr: str, n: int = 4) -> str:
    """DuckDB twin of :func:`byte_shingles` for a payload given as a
    lowercase HEX string (the oracle's carrier for binary): byte i's
    n-byte shingle is hex chars [2i-1, 2i-1+2n)."""
    return (f"list_distinct(list_transform("
            f"range(1, length({expr}) // 2 - {n} + 2), "
            f"i -> substr({expr}, 2 * i - 1, {2 * n})))")


def frame_sample(df: DataFrame, media_col: str = "media",
                 stride: int = 2) -> DataFrame:
    """Treat the payload as a frame sequence (FRAME_BYTES per frame) and
    sample every ``stride``-th frame — the video-pipeline shape.

    Pure expression (substring on binary): frames explode into
    (doc_id, frame_idx, frame BINARY) rows without Python."""
    n_frames = F.floor(F.length(media_col) / FRAME_BYTES).cast("int")
    idxs = F.sequence(F.lit(0), n_frames - 1, F.lit(stride))
    return (
        df.where(F.length(media_col) >= FRAME_BYTES)
        .select(
            "doc_id",
            F.explode(idxs).alias("frame_idx"),
            F.col(media_col).alias("__m"),
        )
        .select(
            "doc_id", "frame_idx",
            F.expr(f"substring(__m, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")
            .alias("frame"),
        )
    )
