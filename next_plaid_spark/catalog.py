"""Index catalog — the multi-index management surface of the reference's
API layer (next-plaid-api/src/state.rs:505-560 ``list_all``/index dir,
handlers/documents.rs:1037-1099 ``get_index_info``/``list_indices``,
delete_index), re-expressed as a driver-side directory-of-snapshots
manager over :class:`~next_plaid_spark.local_index.LocalIndex`.

One catalog root holds one directory per index name; each index directory
holds LocalIndex's versioned snapshot children. All filesystem metadata
operations are driver-side and O(#indices) — no Spark job is launched
until an index is actually opened/searched.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from next_plaid_spark.local_index import LocalIndex
from next_plaid_spark.streaming.ingest import _versions


@dataclass(frozen=True)
class IndexInfo:
    """handlers/documents.rs:1071-1086 IndexInfoResponse analog."""

    name: str
    num_documents: int
    num_embeddings: int
    num_partitions: int
    avg_doclen: float
    dimension: int
    has_metadata: bool
    metadata_count: int | None


class IndexCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid index name: {name!r}")
        return os.path.join(self.root, name)

    # -- read surface ------------------------------------------------------

    def list_indices(self) -> list[str]:
        """state.rs:512-530 list_all: directories that contain at least one
        loadable snapshot; sorted for determinism."""
        out = []
        if not os.path.isdir(self.root):
            return out
        for entry in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, entry)
            if os.path.isdir(p) and _versions(p):
                out.append(entry)
        return out

    def exists(self, name: str) -> bool:
        p = self._dir(name)
        return os.path.isdir(p) and bool(_versions(p))

    def open(self, name: str) -> LocalIndex:
        if not self.exists(name):
            raise FileNotFoundError(f"index not found: {name}")
        return LocalIndex.load(self.spark, self._dir(name))

    def info(self, name: str) -> IndexInfo:
        """get_index_info parity: counts from meta, metadata presence +
        count from the metadata store when attached."""
        li = self.open(name)
        store = li.metadata()
        return IndexInfo(
            name=name,
            num_documents=li.num_documents(),
            num_embeddings=li.num_embeddings(),
            num_partitions=li.num_partitions(),
            avg_doclen=li.avg_doclen(),
            dimension=li.embedding_dim(),
            has_metadata=store is not None,
            metadata_count=store.count() if store is not None else None,
        )

    # -- write surface -----------------------------------------------------

    def create_from_jsonl(self, name: str, path: str, *,
                          text_col: str = "text",
                          id_col: str | None = None,
                          encoder=None, **build_kw) -> LocalIndex:
        """Raw JSONL drop → searchable index in one call — the batch
        analog of the reference's full ingestion flow (POST /indices +
        JSON documents with metadata, documents.rs:975/1118).

        Every JSON field besides the text becomes a metadata column
        (queryable through the WHERE grammar); ``encoder`` maps the
        documents DF to doc_tokens (default: the synthetic deterministic
        encoder — pass ``encode_with_model``-backed callables for a real
        model)."""
        from next_plaid_spark.encoding import encode_documents
        from next_plaid_spark.sources.corpus_io import load_documents_jsonl

        docs = load_documents_jsonl(
            self.spark, path, text_col=text_col, id_col=id_col
        )
        toks = (encoder or encode_documents)(docs)
        return self.create(name, toks, metadata=docs, **build_kw)

    def create(self, name: str, doc_tokens: DataFrame, *,
               metadata: DataFrame | None = None, **build_kw) -> LocalIndex:
        """create_index + add_documents in one step (the batch analog of
        POST /indices then POST /indices/{name}/documents)."""
        if self.exists(name):
            raise FileExistsError(f"index already exists: {name}")
        return LocalIndex.update_or_create(
            self.spark, doc_tokens, self._dir(name),
            metadata=metadata, **build_kw,
        )

    def update_config(self, name: str, *, max_documents: int | None) -> dict:
        """PUT /indices/{name}/config (handlers/documents.rs:1618-1650):
        persist the max_documents cap; the next update() enforces it by
        evicting the oldest documents."""
        if not self.exists(name):
            raise FileNotFoundError(f"index not found: {name}")
        return self.open(name).set_config(max_documents=max_documents)

    def delete_index(self, name: str) -> bool:
        """DELETE /indices/{name}: drop every snapshot of the index.
        Returns False when the index didn't exist (handlers return 404)."""
        p = self._dir(name)
        if not os.path.isdir(p):
            return False
        shutil.rmtree(p)
        return True
