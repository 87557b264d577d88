"""Embedding-generation boundary: corpus text → vector column, the
"embed everything" stage between curation and similarity search in an
LLM data pipeline.

Same design as the OCR boundary (multimodal/ocr.py): a pluggable
backend behind an Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partition parallelism, error isolation) is
real and tested, while the model call is swappable. The default
:class:`StubEmbeddingBackend` is DETERMINISTIC (md5-derived features),
which makes the whole boundary oracle-checkable — the DuckDB replay
verifies batching/schema handling end to end, something a real model
backend could never offer.

100 TB posture: embedding is map-side — no shuffle, parallelism =
input partitions, Arrow batches amortize the Python boundary; a real
backend (sentence-transformers, an inference service) slots into
``embed`` unchanged, and per-row failures belong in an error column,
not exceptions (the OCR boundary's quarantine contract).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StubEmbeddingBackend:
    """Deterministic md5-feature embedder: dimension ``d`` of a text's
    vector is ``int(md5(key || ':' || d)[:8], 16) / 2^32 * 2 - 1`` —
    uniform in [-1, 1), identical in any engine/language, so pipelines
    built on it are replayable (the embedding analogue of the md5-parity
    LSH planes)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def embed(self, keys: list[str]) -> list[list[float]]:
        out = []
        for k in keys:
            vec = []
            for d in range(self.dim):
                h = hashlib.md5(f"{k}:{d}".encode()).hexdigest()[:8]
                vec.append(int(h, 16) / 4294967296.0 * 2 - 1)
            out.append(vec)
        return out


def embed_documents(
    docs: DataFrame,
    backend,
    id_col: str = "doc_id",
    key_col: str | None = None,
) -> DataFrame:
    """(id, embedding array<double>) for every document, computed in
    Arrow batches via mapInPandas. ``key_col`` is what the backend sees
    (defaults to the id as a string — content-keyed embedding would pass
    the text column instead)."""
    key_col = key_col or id_col
    schema = f"{id_col} long, embedding array<double>"
    cols = [id_col] if key_col == id_col else [id_col, key_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = [str(k) for k in pdf[key_col]]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "embedding": backend.embed(keys)}
            )

    return docs.select(*cols).mapInPandas(run, schema=schema)
