"""Trained quality-classifier filtering — the CCNet / GPT-3 curation step.

The canonical web-scale pipeline trains a linear classifier to separate a
TRUSTED seed corpus (Wikipedia/books/curated) from random crawl text,
scores every document, and keeps a quality-weighted slice (Brown et al.
2020, appendix A; Wenzek et al. 2020 CCNet §4.3). This module is that
step on Spark ML primitives:

- ``train_quality_classifier`` — hashed bag-of-words → logistic
  regression via ``pyspark.ml`` (distributed L-BFGS over the full
  training frame: the 100 TB-safe trainer — no driver materialization).
- ``score_quality`` — one broadcast of the coefficient vector inside a
  Spark ML transform; adds ``quality_prob`` per doc.
- ``pareto_quality_filter`` — GPT-3's stochastic acceptance
  ``keep iff score > 1 − pareto_draw`` with the draw derived from a
  CONTENT-HASH coin (the stratified_sample discipline): deterministic,
  partitioning-independent, reproducible — high-quality docs survive
  with probability → 1 while low-quality docs still contribute a thin
  tail instead of a hard cliff.

Training is iterative (non-SQL-expressible), so the gate is the pytest
separation test, like the k-means trainer — the DOWNSTREAM scoring and
filtering are plain Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from next_plaid_spark.functions.text import tokenize_unicode61

COIN_BITS = 60  # same 60-bit md5 derivation as the sampling/dedup suites


def _hash_coin(text_col, seed: int, salt: str):
    """Uniform (0,1) from a content hash — deterministic everywhere."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(salt), text_col)),
            1, 15,
        ),
        16, 10,
    ).cast("double")
    return (h + F.lit(0.5)) / F.lit(float(1 << COIN_BITS))


def _featurize(docs: DataFrame, *, text_col: str, n_features: int):
    from pyspark.ml.feature import HashingTF

    toks = docs.withColumn("_toks", tokenize_unicode61(F.col(text_col)))
    tf = HashingTF(inputCol="_toks", outputCol="_features",
                   numFeatures=n_features)
    return tf.transform(toks).drop("_toks")


def train_quality_classifier(good_docs: DataFrame, bad_docs: DataFrame, *,
                             text_col: str = "text",
                             n_features: int = 1 << 18,
                             max_iter: int = 30,
                             reg_param: float = 1e-4):
    """Fit the seed-vs-random classifier; returns the fitted
    ``LogisticRegressionModel`` (coefficients broadcast at scoring time).

    Both inputs stream through hashed term frequencies — nothing is
    collected; the trainer is ``pyspark.ml``'s distributed L-BFGS, so the
    training frame can be the full seed corpus + an equally sized crawl
    sample at any scale."""
    from pyspark.ml.classification import LogisticRegression

    train = _featurize(
        good_docs.select(F.col(text_col)).withColumn("label", F.lit(1.0))
        .unionByName(
            bad_docs.select(F.col(text_col)).withColumn("label", F.lit(0.0))
        ),
        text_col=text_col, n_features=n_features,
    )
    lr = LogisticRegression(featuresCol="_features", labelCol="label",
                            maxIter=max_iter, regParam=reg_param)
    return lr.fit(train)


def score_quality(model, docs: DataFrame, *, text_col: str = "text",
                  out_col: str = "quality_prob") -> DataFrame:
    """Every doc + P(seed-like) ∈ (0,1). One corpus scan, no shuffle."""
    n_features = model.numFeatures
    scored = model.transform(
        _featurize(docs, text_col=text_col, n_features=n_features)
    )
    # probability is a Vector [P(0), P(1)] — project the scalar out
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("_features", "rawPrediction", "probability", "prediction")


def pareto_quality_filter(model, docs: DataFrame, *,
                          text_col: str = "text",
                          alpha: float = 9.0,
                          seed: int = 42,
                          keep_col: str | None = None,
                          round_digits: int | None = None) -> DataFrame:
    """GPT-3's acceptance rule: keep a doc iff
    ``quality_prob > 1 − draw`` with ``draw ~ Pareto(α)`` (Brown et al.
    2020 appendix A — α=9 keeps mostly-high-quality text but admits a
    heavy-ish tail of lower scores, avoiding a hard quality cliff).

    The draw comes from the content-hash coin via the inverse CDF
    ``(1−u)^(−1/α) − 1``, so the decision is a pure function of
    (text, seed): reproducible, partitioning-independent, and stable as
    the rest of the corpus changes. ``keep_col`` keeps all rows and adds
    the boolean instead of filtering.

    ``round_digits`` rounds BOTH sides of the acceptance comparison before
    comparing. Sigmoid/pow go through libm, which differs across engines
    by ~1 ulp; a doc whose probability lands within that of its Pareto
    threshold could otherwise flip the keep bit between engines. Gate
    entries that cross-check against DuckDB set this to match the suite's
    rounding discipline; the default (None) compares exact doubles."""
    scored = score_quality(model, docs, text_col=text_col)
    u = _hash_coin(F.col(text_col), seed, "quality_pareto")
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    thresh = F.lit(1.0) - draw
    if round_digits is not None:
        keep = (F.round(F.col("quality_prob"), round_digits)
                > F.round(thresh, round_digits))
    else:
        keep = F.col("quality_prob") > thresh
    if keep_col is not None:
        return scored.withColumn(keep_col, keep)
    return scored.filter(keep)
