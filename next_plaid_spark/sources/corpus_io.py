"""JSONL corpus IO — the de-facto LLM-corpus interchange format.

The reference ingests documents as JSON objects with free-form metadata
(next-plaid-api/src/handlers/documents.rs:1118 — ``{"documents": [...],
"metadata": [...]}`` bodies); at rest the same corpora live as JSONL
files (one JSON object per line: ``{"text": ..., "url": ..., ...}``).
These helpers map such files onto the engine's documents contract —
``doc_id long, text string`` plus arbitrary metadata columns — so every
operator in this package (index build, BM25, dedup, curation, the
MetadataStore WHERE grammar) runs on a raw JSONL drop unchanged.

Scale shape: ``spark.read.json`` is a parallel scan with schema
inference (pass ``schema=`` to skip the inference pass on huge corpora);
id assignment is a per-row hash — no global sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _to_documents(df: DataFrame, path: str, text_col: str,
                  id_col: str | None, dedup_exact: bool) -> DataFrame:
    """Normalize a raw frame onto (doc_id, text, metadata...).

    Without ``id_col``, ``doc_id = xxhash64(text)`` — content-addressed
    ids, which makes ingestion idempotent and EXACT-DEDUPS identical
    texts by construction (the first curation step of every LLM
    pipeline; ``dedup_exact=False`` keeps hash-equal rows, but then
    doc_id is no longer unique). 64-bit collisions on distinct texts are
    ~N²/2⁶⁵ — negligible below ~10⁹ docs; above that, supply real ids.
    """
    if text_col != "text":
        # renaming onto an existing 'text' column would create a duplicate
        # name that only fails later as an ambiguous reference — fail here
        if "text" in df.columns:
            raise ValueError(
                f"{path} has both '{text_col}' and 'text' fields; pass "
                "text_col='text' or drop one before loading")
        df = df.withColumnRenamed(text_col, "text")
    if "text" not in df.columns:
        raise ValueError(f"no '{text_col}' field in {path}")
    if id_col is not None:
        if id_col not in df.columns:
            raise ValueError(f"no '{id_col}' field in {path}")
        if id_col != "doc_id":
            if "doc_id" in df.columns:
                raise ValueError(
                    f"{path} has both '{id_col}' and 'doc_id' fields; pass "
                    "id_col='doc_id' or drop one before loading")
            df = df.withColumnRenamed(id_col, "doc_id")
        df = df.withColumn("doc_id", F.col("doc_id").cast("long"))
    else:
        if "doc_id" in df.columns:
            raise ValueError(
                f"{path} already has a 'doc_id' field; pass id_col='doc_id' "
                "to use it (content-hash ids would silently overwrite it)")
        df = df.withColumn("doc_id", F.xxhash64(F.col("text")))
        if dedup_exact:
            df = df.dropDuplicates(["doc_id"])
    front = ["doc_id", "text"]
    return df.select(*front, *[c for c in df.columns if c not in front])


def load_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    text_col: str = "text",
    id_col: str | None = None,
    dedup_exact: bool = True,
    schema=None,
) -> DataFrame:
    """Read a JSONL corpus into the documents contract.

    ``text_col`` names the text field (renamed to ``text``); every other
    JSON field is preserved as a metadata column (the MetadataStore
    surface; nested objects stay as structs). Id assignment and the
    exact-dedup-on-ingest semantics: see ``_to_documents``.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return _to_documents(reader.json(path), path, text_col, id_col,
                         dedup_exact)


def load_documents_csv(
    spark: SparkSession,
    path: str,
    *,
    text_col: str = "text",
    id_col: str | None = None,
    dedup_exact: bool = True,
    sep: str = ",",
    header: bool = True,
    schema=None,
) -> DataFrame:
    """CSV/TSV variant of ``load_documents_jsonl`` (``sep="\\t"`` for
    TSV). Same contract: header columns become metadata columns,
    content-addressed ids dedup identical texts on ingest."""
    reader = (spark.read.option("header", str(header).lower())
              .option("multiLine", "true").option("escape", '"'))
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return _to_documents(reader.option("sep", sep).csv(path), path,
                         text_col, id_col, dedup_exact)


def write_documents_jsonl(df: DataFrame, path: str, *,
                          mode: str = "overwrite") -> None:
    """Write a documents DataFrame back out as JSONL (one object per
    line, metadata columns included) — the reverse direction for handing
    a curated corpus to a non-Spark consumer."""
    df.write.mode(mode).json(path)
