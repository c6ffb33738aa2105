"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested — explicit output
schemas (so Catalyst can prune around the Python stage), Arrow batch
transfer, partition-preserving map. The actual byte decoding is a
deterministic STUB (:func:`fake_decode_meta`): the image/audio codec
libraries are not in this container. Swap ``fake_decode_meta`` for a
PIL/ffmpeg call and nothing else changes — the batch shape, schema,
and partitioning contract is the deliverable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def fake_decode_meta(payload: bytes) -> tuple[str, int, int]:
    """Deterministic decode STUB standing in for a real image decoder.

    Derives (format, width, height) from the payload bytes so tests
    have stable expectations. A production build replaces this one
    function with e.g. ``PIL.Image.open(io.BytesIO(payload))``; callers
    are unaffected.
    """
    if not payload:
        raise NotImplementedError(
            "empty payload: real decoder not available in this environment"
        )
    fmt = "png" if payload[0] % 2 == 0 else "jpeg"
    width = 64 + (payload[0] % 8) * 16
    height = 64 + (payload[-1] % 8) * 16
    return fmt, width, height


def decode_binary_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Extract typed metadata from a binary column via mapInPandas.

    Arrow-batched: each pandas batch holds many rows, the Python
    boundary is crossed once per batch (not per row), and the explicit
    DECODED_SCHEMA lets upstream column pruning drop everything except
    (id, payload) before the Python stage.
    """
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            meta = [fake_decode_meta(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "format": [m[0] for m in meta],
                    "width": pd.Series([m[1] for m in meta], dtype="int32"),
                    "height": pd.Series([m[2] for m in meta], dtype="int32"),
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, DECODED_SCHEMA)


def documents_as_binary(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Adapter for the testdata: treat document text bytes as an opaque
    payload column, the way a real pipeline carries image bytes."""
    return df.select(
        F.col(id_col), F.encode(F.col("text"), "UTF-8").alias("payload")
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    frame_bytes: int = 32,
    every_n: int = 4,
    max_frames: int = 5,
) -> DataFrame:
    """VIDEO-shaped plumbing: treat the payload as a frame sequence
    (``frame_bytes`` per frame), emit every ``every_n``-th frame up to
    ``max_frames`` — the strided frame-sampling a video pipeline runs
    before feature extraction. The mapInPandas stage has VARIABLE
    fan-out (0..max_frames rows per input row), the shape a real
    ffmpeg-backed sampler needs; the per-frame checksum is md5 of the
    frame's UPPERCASE-HEX bytes, chosen so the oracle can recompute it
    from ``hex(payload)`` without blob slicing. Swap the body for real
    frame decode; schema and fan-out contract stay."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame_md5": []}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                n = len(payload) // frame_bytes
                for i in list(range(0, n, every_n))[:max_frames]:
                    sl = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n)
                    out["frame_md5"].append(
                        hashlib.md5(sl.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(frames, FRAMES_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str, bin_col: str, dim: int = 8
) -> DataFrame:
    """Embedding-extraction plumbing: payload → fixed-dim double vector
    via mapInPandas (the CLIP/wav2vec shape: a per-worker model handle
    maps byte batches to vectors). The stub derives each element from
    the payload's md5 digest bytes (deterministic, oracle-recomputable
    from SQL hex arithmetic); the output feeds the ANN tier directly —
    tested end to end in tests/test_llm.py."""
    import hashlib

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [
                [b / 255.0 for b in hashlib.md5(p).digest()[:dim]]
                for p in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "features": vecs,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    return df.select(id_col, bin_col).mapInPandas(feats, schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("in_bytes", T.IntegerType()),
        T.StructField("out_bytes", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_payloads(
    df: DataFrame, id_col: str, bin_col: str, target_bytes: int = 64
) -> DataFrame:
    """RESIZE plumbing: downsample each payload to ≤ ``target_bytes``
    by strided byte selection (stride = ceil-ish n/target) — standing
    in for an image resize, whose contract is the same: payload in,
    smaller payload out, 1:1 rows, deterministic. The checksum is md5
    of the UPPERCASE-HEX of the selected bytes so the oracle can
    recompute every output from ``hex(payload)``; swap the body for a
    real PIL resize and drop the oracle, schema stays."""
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            in_bytes, out_bytes, sums = [], [], []
            for p in pdf[bin_col]:
                stride = max(1, len(p) // target_bytes)
                sel = p[::stride][:target_bytes]
                in_bytes.append(len(p))
                out_bytes.append(len(sel))
                sums.append(hashlib.md5(sel.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "in_bytes": pd.Series(in_bytes, dtype="int32"),
                    "out_bytes": pd.Series(out_bytes, dtype="int32"),
                    "resized_md5": pd.Series(sums, dtype="object"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(resize, RESIZED_SCHEMA)
