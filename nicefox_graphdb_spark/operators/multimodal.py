"""Multimodal column plumbing: opaque binary media + typed metadata.

Pattern for 100 TB multimodal corpora: media lives in an opaque BINARY
column (or object-store pointers) beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the Python boundary is paid per-batch, not
per-row, and each partition streams through a bounded memory window.

The image/audio codecs are NOT in this container, so the decode kernels are
STUBBED (clearly marked below): `decode_media` raises NotImplementedError
unless `fake=True`, which substitutes a deterministic byte-level feature
extractor. The Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video|text
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),  # mean byte value
    ]
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Turn the documents table into a media table (content = utf-8 bytes) —
    a deterministic stand-in for real image/audio blobs that exercises the
    exact same binary-column plumbing."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.create_map(F.lit("src"), F.lit("documents")).alias("meta"),
    )


def _decode_image(content: bytes) -> object:
    """STUB: real image decode (PIL/opencv) is unavailable in this container.

    At deploy time this becomes `PIL.Image.open(io.BytesIO(content))` inside
    the same mapInPandas batch loop; everything around it is unchanged.
    """
    raise NotImplementedError("image codecs not available in this environment")


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    fake=True → deterministic byte-level features (length, md5, mean byte),
    so results are verifiable by a SQL oracle. fake=False → the real decode
    stub (NotImplementedError here; swap per-modality kernels at deploy).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                pdf["content"].map(_decode_image)  # pragma: no cover
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len).astype("int64"),
                    "checksum": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat_mean": content.map(
                        lambda b: round(sum(bytes(b)) / len(b), 6) if len(b) else 0.0
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)
