"""BM25 keyword search over a postings table — K1/K3/K4 (SURVEY.md §2.5).

The reference delegates to SQLite FTS5 (`text_search.rs:1246-1272`); FTS5's
bm25 has column-weight quirks, so — per SURVEY §7's risk register — the
contract here is our own documented spec, checked against a DuckDB oracle
computing the identical formula:

    tokens     = unicode61-style: lowercase, split on non-[a-z0-9]
    tf         = term count in doc;  dl = doc token count (with repeats)
    N, avgdl   = corpus doc count, sum(dl)/N
    idf(t)     = ln(1 + (N - df + 0.5)/(df + 0.5))          [always ≥ 0]
    sat(t, d)  = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score(q,d) = Σ_{t ∈ q} qtf(t) · idf(t) · sat(t, d)      [k1=1.2, b=0.75]

Float discipline: per-term contributions are computed by one fixed
expression (bit-identical cross-engine up to ln's last ulp), summed in
sorted order, and the final score is rounded to 6 decimals on both sides —
ranks are then computed on the rounded score with a doc_id tie-break, so
rank columns are cross-engine deterministic.

Scale: postings build is one explode + two groupBys (map-side combinable);
search joins the (small, broadcast) query-term set against postings on
``term`` — the corpus never shuffles by doc.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.functions.text import tokenize_trigram, tokenize_unicode61

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6

# K1 tokenizer registry (text_search.rs:52-267): unicode61 (words), trigram
# (substring search), identifier_aware (code; see operators/colgrep.py)
TOKENIZERS = {
    "unicode61": tokenize_unicode61,
    "trigram": tokenize_trigram,
}


def _tokenizer(name: str):
    if name == "identifier_aware":
        from next_plaid_spark.operators.colgrep import identifier_tokens

        return identifier_tokens
    return TOKENIZERS[name]


@dataclass
class BM25Index:
    postings: DataFrame   # (term, doc_id, tf)
    doclens: DataFrame    # (doc_id, dl)
    n_docs: int
    avgdl: float
    tokenizer: str = "unicode61"

    @classmethod
    def build(cls, docs: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text", tokenizer: str = "unicode61") -> "BM25Index":
        tok_fn = _tokenizer(tokenizer)
        toks = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(tok_fn(F.col(text_col))).alias("term"),
        )
        postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
        doclens = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
        stats = doclens.agg(
            F.count("*").alias("n"), F.sum("dl").alias("total")
        ).collect()[0]
        n_docs = stats.n or 0
        avgdl = (stats.total / n_docs) if n_docs else 0.0
        return cls(postings.cache(), doclens.cache(), n_docs, avgdl, tokenizer)

    def search(self, queries: DataFrame, k: int = 10, *,
               query_id_col: str = "query_id", text_col: str = "text",
               subset: DataFrame | None = None,
               score_mode: str = "okapi",
               conjunctive: bool = False) -> DataFrame:
        """Batch BM25: queries(query_id, text) → (query_id, doc_id, score, rank).

        ``subset`` (doc_id) implements filtered keyword search (K4,
        text_search.rs:1277-1343) as a semi-join — no 900-param chunking.

        ``score_mode``:
        - ``"okapi"`` (default) — the documented spec above
          (idf = ln(1 + …), always ≥ 0).
        - ``"fts5"`` — SQLite FTS5 parity (the backend the reference
          actually queries, text_search.rs:1246-1272): per-phrase
          idf = ln((N − df + 0.5)/(df + 0.5)), floored at 1e-6 when ≤ 0
          (fts5_aux.c fts5Bm25Function); each query-token occurrence is
          one phrase, so repeated tokens contribute qtf times. FTS5
          returns the negated sum and the reference re-negates — the
          positive orientation here IS the reference's surfaced score.

        ``conjunctive=True`` reproduces ``sanitize_fts5_query``'s
        space-joined (implicit AND) form (text_search.rs:949-981): a doc
        matches only if it contains EVERY distinct query term — including
        terms absent from the corpus vocabulary, which kill the whole
        query, exactly as an FTS5 AND over a missing term matches nothing.
        False = the OR-joined form (``build_fts5_query_or``) colgrep uses.
        """
        qterms = (
            queries.select(
                F.col(query_id_col).cast("long").alias("query_id"),
                F.explode(_tokenizer(self.tokenizer)(F.col(text_col))).alias("term"),
            )
            .groupBy("query_id", "term")
            .agg(F.count("*").alias("qtf"))
        )
        df_counts = self.postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        n, avgdl = float(self.n_docs), float(self.avgdl)
        matched = (
            F.broadcast(qterms)
            .join(self.postings, "term")
            .join(F.broadcast(df_counts), "term")
            .join(self.doclens, "doc_id")
        )
        if subset is not None:
            matched = matched.join(
                subset.select(F.col("doc_id").cast("long")), "doc_id", "left_semi"
            )
        if conjunctive:
            # doc must match EVERY distinct query term (vocabulary-missing
            # terms included: they make n_terms unmatchable, as in FTS5)
            n_terms = qterms.groupBy("query_id").agg(
                F.countDistinct("term").alias("_nt")
            )
            full = (
                matched.groupBy("query_id", "doc_id")
                .agg(F.countDistinct("term").alias("_mt"))
                .join(F.broadcast(n_terms), "query_id")
                .filter(F.col("_mt") == F.col("_nt"))
                .select("query_id", "doc_id")
            )
            matched = matched.join(full, ["query_id", "doc_id"], "left_semi")
        if score_mode == "fts5":
            raw_idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            idf = F.when(raw_idf <= 0.0, F.lit(1e-6)).otherwise(raw_idf)
        elif score_mode == "okapi":
            idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        else:
            raise ValueError(f"unknown score_mode: {score_mode!r}")
        sat = (F.col("tf") * (K1 + 1.0)) / (
            F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
        )
        contrib = (F.col("qtf") * idf * sat).alias("contrib")
        scored = (
            matched.select("query_id", "doc_id", contrib)
            .groupBy("query_id", "doc_id")
            .agg(
                F.round(
                    F.aggregate(
                        F.array_sort(F.collect_list("contrib")),
                        F.lit(0.0).cast("double"),
                        lambda acc, v: acc + v,
                    ),
                    SCORE_DECIMALS,
                ).alias("score")
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )


def bm25_oracle_sql(*, n_queries: int, k: int, split_re: str,
                    query_max_tokens: int | None = None,
                    score_mode: str = "okapi",
                    conjunctive: bool = False) -> str:
    """DuckDB SQL computing the identical spec over ``documents`` with
    queries = first ``n_queries`` docs' text (optionally first M tokens)."""
    qtok = f"list_slice(toks, 1, {query_max_tokens})" if query_max_tokens else "toks"
    if score_mode == "fts5":
        idf = ("CASE WHEN ln((s.n - d.df + 0.5) / (d.df + 0.5)) <= 0.0 THEN 1e-6 "
               "ELSE ln((s.n - d.df + 0.5) / (d.df + 0.5)) END")
    else:
        idf = "ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))"
    conj_cte, conj_join = "", ""
    if conjunctive:
        conj_cte = """
full_match AS (
  SELECT m.query_id, m.doc_id FROM (
    SELECT q2.query_id, p2.doc_id, count(DISTINCT q2.term) AS mt
    FROM qterms q2 JOIN postings p2 USING (term)
    GROUP BY 1, 2
  ) m JOIN (
    SELECT query_id, count(DISTINCT term) AS nt FROM qterms GROUP BY 1
  ) t USING (query_id)
  WHERE m.mt = t.nt
),"""
        conj_join = "\n  JOIN full_match fm ON fm.query_id = q.query_id AND fm.doc_id = p.doc_id"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '{split_re}'), x -> x <> '')) AS term
  FROM documents
),
postings AS (
  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
),
doclens AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
),
stats AS (
  SELECT count(*) AS n, sum(dl) / count(*) AS avgdl FROM doclens
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY 1
),
qterms AS (
  SELECT query_id, term, count(*) AS qtf FROM (
    SELECT doc_id AS query_id, unnest({qtok}) AS term FROM (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '{split_re}'), x -> x <> '') AS toks
      FROM documents WHERE doc_id < {n_queries}
    )
  ) GROUP BY 1, 2
),{conj_cte}
contribs AS (
  SELECT q.query_id, p.doc_id,
         q.qtf * ({idf})
               * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl)) AS contrib
  FROM qterms q
  JOIN postings p USING (term)
  JOIN dfreq d USING (term)
  JOIN doclens l ON p.doc_id = l.doc_id
  CROSS JOIN stats s{conj_join}
),
scored AS (
  SELECT query_id, doc_id,
         round(list_reduce(list_prepend(0.0, list_sort(list(contrib))), (a, b) -> a + b), {SCORE_DECIMALS}) AS score
  FROM contribs GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
""".strip()
