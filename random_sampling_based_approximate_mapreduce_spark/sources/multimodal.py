"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB multimodal training data:
- content travels as an opaque ``binary`` column next to typed metadata
  (modality, byte size, decode features) — Spark shuffles/spills binary
  columns fine, and parquet stores them chunked;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages (one Python worker per partition, zero-copy
  batches) — the ONLY place this engine uses Python in a hot path,
  because codecs are not expressible in Spark SQL;
- the actual codec call is STUBBED here (no PIL/ffmpeg in this
  container): ``decode_stub=True`` computes deterministic pseudo-features
  from the raw bytes so the plumbing (schema, batch shape, partitioning)
  is real and testable; a production build swaps ``_decode_batch`` for
  the real library behind the same signature and raises
  NotImplementedError if it's missing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_binary_content(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Stand-in asset table: (doc_id, modality, content binary).

    Encodes the text column as UTF-8 bytes — in production this column
    holds the raw image/audio/video bytes read from object storage.
    """
    return docs.select(
        "doc_id",
        F.lit(modality).alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _decode_batch(pdf, stub: bool):
    """Per-batch decode. Stub: deterministic pseudo-dimensions from size."""
    import pandas as pd

    if not stub:
        if not _HAS_PIL:
            raise NotImplementedError(
                "real image decode needs PIL/ffmpeg (not in this container); "
                "use decode_stub=True for the deterministic fake"
            )
        raise NotImplementedError("real decode path not wired in this build")
    n = pdf["content"].map(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "modality": pdf["modality"],
            "n_bytes": n,
            "width": (320 + n % 320).astype("int32"),
            "height": (240 + n % 240).astype("int32"),
        }
    )


def decode_metadata(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas.

    Partition-parallel, streaming batches — never materializes a
    partition's binaries in one Python object.
    """

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _decode_batch(pdf, decode_stub)

    return assets.mapInPandas(gen, schema=DECODED_SCHEMA)


EMBEDDING_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_embeddings(assets: DataFrame, dim: int = 64, model_stub: bool = True) -> DataFrame:
    """Binary content -> embedding column, the encoder stage of a
    multimodal training pipeline (CLIP-style image encoder in production).

    Stub: deterministic pseudo-embedding — seeded per-row from a byte hash
    so identical content embeds identically (dedup-by-cosine works on it).
    The Arrow batch shape, schema, and partition-parallelism are the real
    plumbing; swap the body for a model call (ONNX/torch) per batch.
    Output feeds operators/similarity (knn/IVF) and dedup.embedding_dup_pairs.
    """

    def gen(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        if not model_stub:
            raise NotImplementedError(
                "real encoder needs a model runtime (not in this container); "
                "use model_stub=True for the deterministic fake"
            )
        for pdf in batches:
            vecs = []
            for content in pdf["content"]:
                seed = int.from_bytes(hashlib.md5(bytes(content)).digest()[:4], "big")
                rng = np.random.RandomState(seed)
                v = rng.standard_normal(dim)
                vecs.append((v / np.linalg.norm(v)).astype("float32"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return assets.mapInPandas(gen, schema=EMBEDDING_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, frame_bytes: int = 64, every_k: int = 4) -> DataFrame:
    """'Video' frame sampling: split content into fixed-size chunks, keep
    every k-th — the batch-shape template for real frame extraction
    (1 input row -> N output rows through mapInPandas)."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                for i in range(0, max(1, len(b) // frame_bytes), every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(gen, schema=FRAME_SCHEMA)
