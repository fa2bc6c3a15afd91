"""Trainable document-quality classifier — the CCNet / fastText-style
contrast filter real pretraining pipelines run AFTER the cheap
heuristics (llm/text.quality_scores): train a linear model to separate
a REFERENCE corpus (e.g. curated text) from the raw crawl, then keep
crawl documents the model scores reference-like.

Spark-first: tokenization is a JVM expression, featurization is
pyspark.ml's HashingTF (hashed token + token-bigram counts — the
fastText recipe without the embedding table), and the model is
pyspark.ml LogisticRegression, so training is a distributed JVM job
and SCORING is a pure JVM pipeline transform — no Python in either hot
path, model size is O(2^hash_dim) independent of corpus size, and the
same persisted PipelineModel loads on any cluster
(``load_quality_classifier``).

No reference parity — the reference has no trainable text tier; this
is the extension tier (BASELINE.json north star), same charter as
llm/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_terms(df: DataFrame, text_col: str) -> DataFrame:
    """JVM-side fastText-style terms: lowercased alnum tokens plus
    adjacent-token bigrams (word order signal a pure bag misses)."""
    from sclera_spark.llm.text import _tokens

    # the SHARED tokenizer (llm/text._tokens — one recipe across
    # quality/packing/budget ops, so a fix there applies here too);
    # NULL text coalesces to '' BEFORE tokenizing: otherwise the NULL
    # propagates through both the scored and the empty-branch filters
    # and the row vanishes from the output entirely
    d = df.withColumn(
        "__toks", _tokens(F.coalesce(F.col(text_col), F.lit("")))
    )
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.zip_with(
            F.slice("__toks", 1, F.size("__toks") - 1),
            F.slice("__toks", 2, F.size("__toks") - 1),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
    ).otherwise(F.array())
    return d.withColumn("__terms", F.concat("__toks", bigrams)).drop("__toks")


def train_quality_classifier(
    reference: DataFrame,
    crawl: DataFrame,
    text_col: str = "text",
    hash_dim: int = 1 << 18,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the contrast classifier: label 1 = ``reference`` rows,
    label 0 = ``crawl`` rows. Returns a pyspark.ml PipelineModel
    (save with ``model.save(path)``, reload with
    :func:`load_quality_classifier`). Class imbalance is handled by
    per-row weights (each side contributes equal total weight), so a
    10B-doc crawl against a 10M-doc reference trains without
    downsampling either side."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    n_ref = reference.count()
    n_crawl = crawl.count()
    if n_ref == 0 or n_crawl == 0:
        raise ValueError(
            "train_quality_classifier needs non-empty reference AND "
            f"crawl sides (got {n_ref} / {n_crawl} rows)"
        )
    both = float(n_ref + n_crawl)
    train = (
        reference.select(F.col(text_col))
        .withColumn("__label", F.lit(1.0))
        .withColumn("__w", F.lit(both / (2.0 * n_ref)))
        .unionByName(
            crawl.select(F.col(text_col))
            .withColumn("__label", F.lit(0.0))
            .withColumn("__w", F.lit(both / (2.0 * n_crawl)))
        )
    )
    train = _with_terms(train, text_col).where(F.size("__terms") > 0)
    pipe = Pipeline(
        stages=[
            HashingTF(
                inputCol="__terms",
                outputCol="__features",
                numFeatures=int(hash_dim),
            ),
            LogisticRegression(
                featuresCol="__features",
                labelCol="__label",
                weightCol="__w",
                regParam=reg_param,
                maxIter=max_iter,
                standardization=False,
            ),
        ]
    )
    return pipe.fit(train)


def score_quality_classifier(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a trained contrast classifier: appends
    ``out_col`` = P(reference-like) in [0, 1]. Pure JVM pipeline
    transform (HashingTF + linear model) — scoring 100 TB is one
    map-only pass, no shuffle, no Python. Empty/NULL texts score NULL
    (no terms — the model has no opinion, and silently calling them
    high- or low-quality would bias a keep-threshold either way)."""
    from pyspark.ml.functions import vector_to_array

    featured = _with_terms(df, text_col)
    scored = model.transform(
        featured.where(F.size("__terms") > 0)
    ).withColumn(
        out_col,
        F.element_at(vector_to_array(F.col("probability")), 2),
    )
    empty = featured.where(
        ~(F.size("__terms") > 0)
    ).withColumn(out_col, F.lit(None).cast("double"))
    keep = df.columns + [out_col]
    return scored.select(*keep).unionByName(empty.select(*keep))


def load_quality_classifier(path: str):
    """Reload a persisted contrast classifier (PipelineModel.load)."""
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
