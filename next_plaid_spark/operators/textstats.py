"""Text analysis operators for training-data pipelines (extension surface):
language ID, quality scoring, document fingerprinting, token stats.

All pure built-in-function pipelines (whole-stage codegen, no UDFs), each
with a DuckDB oracle generator. Ratios are exact int/int divisions and the
composite quality score is a fixed-order weighted sum — bit-identical
cross-engine.

Note: the driver's synthetic ``documents.lang`` labels are noise (every
language shares one vocabulary), so language ID is specified as a
deterministic character-trigram-profile scorer; the *prediction* is the
contract, accuracy against the synthetic label is not meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from next_plaid_spark.functions.text import TOKEN_SPLIT_RE, tokenize_unicode61

# -- language ID -------------------------------------------------------------

# Tiny, fixed character-trigram profiles (public linguistic commonplaces).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", "ed ", " th", "er "),
    "es": ("de ", "la ", "os ", "ión", "ent", " de", "ar "),
    "de": ("der", "ein", "sch", "und", "ich", "en ", " ge"),
    "fr": ("le ", "es ", "ent", "ion", " de", "que", "eur"),
    "zh": ("de5", "shi", "zho", "ng ", "ian", "ang", "eng"),
}


def _profile_score(text_col, grams: tuple[str, ...]):
    """Number of occurrences of any profile trigram in lower(text):
    Σ_g (len(t) − len(replace(t, g, ''))) / 3 — overlap-free counting via
    replace, identical in both engines."""
    t = F.lower(text_col)
    score = F.lit(0).cast("long")
    for g in grams:
        score = score + (
            (F.length(t) - F.length(F.replace(t, F.lit(g), F.lit("")))) / F.lit(3)
        ).cast("long")
    return score


def language_id(docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, lang_score): argmax profile score, ties broken by
    language code ascending."""
    scores = F.array(*[
        F.struct(
            _profile_score(F.col(text_col), LANG_PROFILES[lang]).alias("s"),
            F.lit(lang).alias("l"),
        )
        for lang in sorted(LANG_PROFILES)
    ])
    # max over (score, inverted tie-break): sort ascending, take last with
    # reversed lang comparison → emulate (s desc, l asc) by sorting on
    # (s asc, l desc) and taking the last element. Simpler: aggregate fold.
    best = F.aggregate(
        scores,
        F.struct(F.lit(-1).cast("long").alias("s"), F.lit("~").alias("l")),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]) | ((x["s"] == acc["s"]) & (x["l"] < acc["l"])), x
        ).otherwise(acc),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        best["l"].alias("pred_lang"),
        best["s"].alias("lang_score"),
    )


def sql_language_id() -> str:
    def score(lang: str) -> str:
        terms = " + ".join(
            f"CAST((length(lower(text)) - length(replace(lower(text), '{g}', ''))) / 3 AS BIGINT)"
            for g in LANG_PROFILES[lang]
        )
        return f"({terms})"

    structs = ", ".join(
        f"{{'s': {score(lang)}, 'l': '{lang}'}}" for lang in sorted(LANG_PROFILES)
    )
    return f"""
WITH scored AS (
  SELECT doc_id,
         list_reduce(
           list_prepend({{'s': CAST(-1 AS BIGINT), 'l': '~'}}, [{structs}]),
           (acc, x) -> CASE WHEN x.s > acc.s OR (x.s = acc.s AND x.l < acc.l) THEN x ELSE acc END
         ) AS best
  FROM documents
)
SELECT doc_id, best.l AS pred_lang, best.s AS lang_score FROM scored
""".strip()


# -- quality scoring ----------------------------------------------------------

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this",
)
# documented spec: quality = 0.3·len_norm + 0.3·(1−stop_ratio_excess)
#   + 0.2·(1−punct_ratio) + 0.2·alpha_ratio, where
#   len_norm = least(n_tokens, 256)/256, stop_ratio_excess =
#   |stop_ratio − 0.4| (ideal prose ≈ 40% stopwords), ratios over chars.
W_LEN, W_STOP, W_PUNCT, W_ALPHA = 0.3, 0.3, 0.2, 0.2
IDEAL_STOP = 0.4
LEN_CAP = 256


def quality_score(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    t = F.lower(F.col(text_col))
    toks = tokenize_unicode61(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^a-z0-9]", ""))
    n_alpha_space = F.length(F.regexp_replace(t, "[^a-z0-9 ]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, (n_chars - n_alpha_space) / n_chars
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    len_norm = F.least(n_tokens, F.lit(LEN_CAP)) / F.lit(float(LEN_CAP))
    q = (
        F.lit(W_LEN) * len_norm
        + F.lit(W_STOP) * (F.lit(1.0) - F.abs(stop_ratio - F.lit(IDEAL_STOP)))
        + F.lit(W_PUNCT) * (F.lit(1.0) - punct_ratio)
        + F.lit(W_ALPHA) * alpha_ratio
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.cast("int").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        q.alias("quality"),
    )


def sql_quality_score() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id,
         lower(text) AS t,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         length(t) AS n_chars,
         length(regexp_replace(t, '[^a-z0-9]', '', 'g')) AS n_alpha,
         length(regexp_replace(t, '[^a-z0-9 ]', '', 'g')) AS n_alpha_space,
         len(list_filter(toks, x -> list_contains([{stop_list}], x))) AS n_stop
  FROM base
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n_chars > 0 THEN (n_chars - n_alpha_space) * 1.0 / n_chars ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END AS alpha_ratio,
       {W_LEN} * (least(n_tokens, {LEN_CAP}) / {float(LEN_CAP)})
         + {W_STOP} * (1.0 - abs((CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END) - {IDEAL_STOP}))
         + {W_PUNCT} * (1.0 - (CASE WHEN n_chars > 0 THEN (n_chars - n_alpha_space) * 1.0 / n_chars ELSE 0.0 END))
         + {W_ALPHA} * (CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END) AS quality
FROM m
""".strip()


# -- unigram-LM perplexity proxy ----------------------------------------------

def unigram_logprob(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality signal (Wenzek et al. 2020 filter by KenLM
    perplexity; the corpus-unigram LM is the shuffle-trivial form of the
    same idea): bits_per_token(doc) = −(1/|T_d|) Σ_t log2 p(t), with
    p(t) = count(t)/total over the WHOLE corpus. High = improbable tokens
    (gibberish / rare-vocab docs); low = boilerplate-ish.

    Scale shape: one explode→agg builds the vocab table (map-side
    combinable; unigram vocab stays broadcastable far beyond 100 TB of
    text), one broadcast join back, one per-doc agg. The per-doc fold sums
    float64 in sorted order so the result is bit-identical to the DuckDB
    oracle's list_sort/list_reduce. One caveat: libm log2 differs from
    DuckDB's in the last ulp, so bits_per_token is rounded to 10 decimals
    on BOTH sides (the one textstats column that can't be bit-identical
    cross-engine)."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokenize_unicode61(F.col(text_col))).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    # T from doc-level array sizes — summing vocab would re-run the
    # explode + groupBy a second time to produce one number
    total = docs.select(
        F.size(tokenize_unicode61(F.col(text_col))).alias("_n")
    ).agg(F.sum("_n").alias("total"))
    nll = (
        vocab.crossJoin(F.broadcast(total))  # 1-row total, stays a DF job
        .select("term", (-F.log2(F.col("cnt") / F.col("total"))).alias("nll"))
    )
    per_doc = (
        toks.join(F.broadcast(nll), "term")
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("nll")),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("s"),
            F.count("*").alias("n"),
        )
    )
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.round(F.coalesce(F.col("s") / F.col("n"), F.lit(0.0)), 10).alias("bits_per_token"),
        F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_tokens"),
    )


def sql_unigram_logprob() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS term
  FROM documents
),
vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT sum(cnt) AS total FROM vocab),
nll AS (SELECT term, -log2(cnt * 1.0 / total) AS nll FROM vocab, tot),
per_doc AS (
  SELECT doc_id,
         list_reduce(list_prepend(0.0, list_sort(list(nll))), (a, b) -> a + b) AS s,
         count(*) AS n
  FROM toks JOIN nll USING (term) GROUP BY 1
)
SELECT d.doc_id,
       round(coalesce(p.s / p.n, 0.0), 10) AS bits_per_token,
       CAST(coalesce(p.n, 0) AS INT) AS n_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""".strip()


# -- document fingerprinting ---------------------------------------------------

def fingerprint(docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, fp, fp_bucket): md5 of the normalized token stream (content
    fingerprint robust to whitespace/punctuation/case), plus a 60-bit
    integer bucket for joining/sharding."""
    norm = F.concat_ws(" ", tokenize_unicode61(F.col(text_col)))
    fp = F.md5(norm)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        fp.alias("fp"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp_bucket"),
    )


def sql_fingerprint() -> str:
    return f"""
SELECT doc_id,
       md5(array_to_string(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> ''), ' ')) AS fp,
       CAST(concat('0x', substr(md5(array_to_string(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> ''), ' ')), 1, 15)) AS BIGINT) AS fp_bucket
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# PII scrubbing (FineWeb/RefinedWeb-style): replace emails / phone numbers /
# IPv4 addresses with typed placeholder tokens. Patterns are restricted to
# syntax with identical semantics in Java regex (Spark, codegen path) and
# RE2 (DuckDB oracle): character classes, bounded repeats, ASCII \\b.
# ---------------------------------------------------------------------------

PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d[\d().-]{7,}\d", "[PHONE]"),
]


def pii_scrub(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, text_clean, n_redactions): sequential per-type global
    regexp_replace — email before ipv4 before phone, each pass running on
    the previous pass's output so a span never double-counts. Pure column
    expressions (one projection, no shuffle, partition-parallel)."""
    from pyspark.sql import functions as F

    clean = F.col(text_col)
    n = F.lit(0)
    for _name, pat, token in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0)))
        clean = F.regexp_replace(clean, pat, token.replace("$", "\\$"))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        clean.alias("text_clean"),
        n.cast("int").alias("n_redactions"),
    )


def sql_pii_scrub(*, source_expr: str = "text") -> str:
    """DuckDB mirror over ``documents`` (same pass order; 'g' flag makes
    regexp_replace global like Spark's)."""
    clean = source_expr
    counts = []
    for _name, pat, token in PII_PATTERNS:
        esc = pat.replace("'", "''")
        counts.append(f"len(regexp_extract_all({clean}, '{esc}'))")
        clean = f"regexp_replace({clean}, '{esc}', '{token}', 'g')"
    n = " + ".join(counts)
    return (
        f"SELECT doc_id, {clean} AS text_clean, "
        f"CAST({n} AS INT) AS n_redactions FROM documents"
    )


def bigram_logprob(docs: DataFrame, *, lam: float = 0.7,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Interpolated-bigram LM quality signal — one rung up the CCNet ladder
    from ``unigram_logprob`` (Wenzek et al. 2020 use a 5-gram KenLM; the
    interpolation-with-unigram-backoff here is the same smoothing family,
    Jelinek-Mercer):

        p(w_i | w_{i−1}) = λ·c(w_{i−1} w_i)/c(w_{i−1}·) + (1−λ)·c(w_i)/T
        bits_per_token    = −(1/n) Σ_i log2 p     (first token: unigram only)

    Scale shape: two combinable count aggs (unigram vocab, bigram table —
    both ≪ corpus for natural text), the bigram-probability join back on
    (prev, cur), and one per-doc agg. The per-doc fold sums in sorted order
    (the repo-wide cross-engine discipline); rounded to 10 decimals for the
    last-ulp libm/DuckDB log2 difference."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(tokenize_unicode61(F.col(text_col))).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    stream = toks.withColumn("prev", F.lag("term", 1).over(w))

    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    # T = total token count, from doc-level array sizes — summing the
    # vocab counts would re-run the token explode + groupBy a second time
    # just to produce one number
    total = docs.select(
        F.size(tokenize_unicode61(F.col(text_col))).alias("_n")
    ).agg(F.sum("_n").alias("total"))
    uni = vocab.crossJoin(F.broadcast(total)).select(
        "term", (F.col("cnt") / F.col("total")).alias("p_uni")
    )
    bi = (
        stream.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count("*").alias("c_bi"))
    )
    # context totals as a prev-window over the aggregated bigram TABLE
    # (≪ corpus; partition size = distinct successors of one word) — a
    # groupBy+join-back would evaluate the stream subtree again
    bi_p = bi.withColumn(
        "c_ctx", F.sum("c_bi").over(Window.partitionBy("prev"))
    ).select(
        "prev", "term", (F.col("c_bi") / F.col("c_ctx")).alias("p_bi")
    )

    scored = (
        # no broadcast hint on the n-gram tables: at web-corpus scale the
        # bigram table is itself corpus-sized (billions of rows) and a
        # forced broadcast would OOM the driver — these are plain
        # shuffle-joins on (prev, term)/(term), and AQE converts them to
        # broadcasts on its own whenever the tables are actually small
        stream.join(uni, "term")
        .join(bi_p, ["prev", "term"], "left")
        .select(
            "doc_id",
            (-F.log2(
                F.when(
                    F.col("prev").isNull(), F.col("p_uni")
                ).otherwise(
                    F.lit(lam) * F.coalesce(F.col("p_bi"), F.lit(0.0))
                    + F.lit(1.0 - lam) * F.col("p_uni")
                )
            )).alias("nll"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("nll")), F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s"),
        F.count("*").alias("n"),
    )
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.round(F.coalesce(F.col("s") / F.col("n"), F.lit(0.0)), 10)
        .alias("bits_per_token"),
        F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_tokens"),
    )


def sql_bigram_logprob(*, lam: float = 0.7) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
    FROM documents
  ), unnest(range(1, len(t) + 1)) AS r(i)
),
stream AS (
  SELECT doc_id, pos, term,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
),
vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT sum(cnt) AS total FROM vocab),
uni AS (SELECT term, cnt * 1.0 / total AS p_uni FROM vocab, tot),
bi AS (
  SELECT prev, term, count(*) AS c_bi FROM stream
  WHERE prev IS NOT NULL GROUP BY 1, 2
),
ctx AS (SELECT prev, sum(c_bi) AS c_ctx FROM bi GROUP BY 1),
bi_p AS (SELECT b.prev, b.term, b.c_bi * 1.0 / c.c_ctx AS p_bi
         FROM bi b JOIN ctx c USING (prev)),
scored AS (
  SELECT s.doc_id,
         -log2(CASE WHEN s.prev IS NULL THEN u.p_uni
                    ELSE {lam} * coalesce(bp.p_bi, 0.0) + {1.0 - lam} * u.p_uni
               END) AS nll
  FROM stream s
  JOIN uni u ON u.term = s.term
  LEFT JOIN bi_p bp ON bp.prev = s.prev AND bp.term = s.term
),
per_doc AS (
  SELECT doc_id,
         list_reduce(list_prepend(0.0, list_sort(list(nll))), (a, b) -> a + b) AS s,
         count(*) AS n
  FROM scored GROUP BY 1
)
SELECT d.doc_id,
       round(coalesce(p.s / p.n, 0.0), 10) AS bits_per_token,
       CAST(coalesce(p.n, 0) AS INT) AS n_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""".strip()
