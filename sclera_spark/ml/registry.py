"""ML operators: named, persisted classifier/clusterer/imputer models
applied as relational operators.

Reference surface (SURVEY.md §2.10):
- `CREATE CLASSIFIER name (label) USING <query>` — SqlCudParser.scala:79-127,
  model objects analytics/ml/objects/MLObject.scala (default backend WEKA)
- `<input> CLASSIFIED WITH name(col...)` — analytics/ml/classifier/expr/
  Classify.scala:28-40
- `<input> CLUSTERED WITH name(col...)` — analytics/ml/clusterer/expr/Cluster.scala
- `<input> IMPUTED WITH name(col) [FLAG f]` — analytics/ml/imputer/expr/Impute.scala

Spark lowering: pyspark.ml pipelines (VectorAssembler + estimator).
Training fits on the cluster (distributed); `transform` is a narrow
map — no shuffle. Models persist via pyspark.ml's save/load so the
registry survives sessions (the reference persists models in its schema
store, exec/SchemaStore.scala).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class StumpModel:
    """A single-feature threshold classifier ('decision stump') trained
    by exact error minimization with a fully DETERMINISTIC spec, so any
    SQL engine can recompute both the training and the predictions:

    - candidates: every distinct value of every feature except each
      feature's maximum (so both sides are non-empty);
    - per candidate (f, t): each side predicts its majority label, ties
      to the SMALLEST label; error = misclassified count;
    - winner: minimal (error, feature-name, threshold) lexicographically.

    Prediction is one CASE expression — a narrow map, no shuffle, no
    model object serialization problem. Training is
    O(rows x candidates) pairs, all in Spark aggregations (fine for the
    small/medium training sets a stump is appropriate for; bin the
    candidate set upstream for anything larger)."""

    feature: str
    threshold: float
    pred_le: int
    pred_gt: int

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "prediction",
            F.when(
                F.col(self.feature) <= F.lit(self.threshold), F.lit(self.pred_le)
            ).otherwise(F.lit(self.pred_gt)),
        )


def _fit_stump(train: DataFrame, label_col: str, feature_cols: list[str]) -> StumpModel:
    stack = ", ".join(f"'{c}', {c}" for c in feature_cols)
    melted = train.selectExpr(
        f"CAST({label_col} AS INT) AS __y",
        f"stack({len(feature_cols)}, {stack}) AS (__f, __v)",
    ).withColumn("__v", F.col("__v").cast("double"))
    cands = (
        melted.groupBy("__f")
        .agg(F.max("__v").alias("__mx"))
        .join(melted.select("__f", F.col("__v").alias("__t")).distinct(), "__f")
        .filter(F.col("__t") < F.col("__mx"))
        .select("__f", "__t")
    )
    # per (candidate, side, label) counts -> majority label per side with
    # min-label tie-break -> error per candidate
    side = (
        melted.join(cands, "__f")
        .withColumn("__le", F.col("__v") <= F.col("__t"))
        .groupBy("__f", "__t", "__le", "__y")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_side = side.groupBy("__f", "__t", "__le").agg(
        F.sum("__n").alias("__tot"),
        # max (count, -label) = majority with ties to the SMALLEST label
        F.max(
            F.struct(F.col("__n").alias("n"), (-F.col("__y")).alias("negy"))
        ).alias("__best"),
    )
    scored = per_side.groupBy("__f", "__t").agg(
        F.sum(F.col("__tot") - F.col("__best.n")).alias("__err"),
        F.min(F.when(F.col("__le"), -F.col("__best.negy"))).alias("__ple"),
        F.min(F.when(~F.col("__le"), -F.col("__best.negy"))).alias("__pgt"),
    )
    win = scored.orderBy("__err", "__f", "__t").first()
    return StumpModel(win["__f"], float(win["__t"]), int(win["__ple"]), int(win["__pgt"]))


@dataclass
class VoronoiModel:
    """Deterministic seeded-Voronoi clusterer: ``seeds`` is a list of
    k feature tuples; a row's cluster is the argmin squared-L2 seed
    (ties to the lowest index). Assignment is one JVM expression — a
    narrow map, no shuffle (same shape as ivf_assign)."""

    seeds: list[tuple]
    feature_cols: list[str]

    def transform(self, df: DataFrame) -> DataFrame:
        entries = []
        for i, s in enumerate(self.seeds):
            d = None
            for c, v in zip(self.feature_cols, s):
                t = (F.col(c) - F.lit(float(v))) * (F.col(c) - F.lit(float(v)))
                d = t if d is None else d + t
            entries.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
        return df.withColumn("__cluster", F.array_min(F.array(*entries))["i"])


def _fit_voronoi(train: DataFrame, feature_cols: list[str], k: int) -> VoronoiModel:
    seeds = [
        tuple(r[c] for c in feature_cols)
        for r in train.select(*feature_cols)
        .distinct()
        .orderBy(*[F.col(c).asc() for c in feature_cols])
        .limit(k)
        .collect()
    ]
    if not seeds:
        raise ValueError("voronoi clusterer: empty training set")
    return VoronoiModel(seeds, list(feature_cols))


def _fit_text_logistic(train: DataFrame, label_col: str, text_col: str):
    """Hashed-ngram logistic text classifier as ONE persistable
    pyspark.ml pipeline: coalesce-NULL SQLTransformer -> RegexTokenizer
    -> (unigram TF, bigram NGram TF) -> assembler -> logistic. The
    SQLTransformer makes NULL text score like empty text instead of
    NPE-ing the tokenizer; every stage survives PipelineModel
    save/load, so the sidecar hydration path needs nothing new."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (
        HashingTF,
        NGram,
        RegexTokenizer,
        SQLTransformer,
        VectorAssembler,
    )

    null_safe = SQLTransformer(
        statement=(
            f"SELECT *, coalesce(`{text_col}`, '') AS __txt FROM __THIS__"
        )
    )
    tok = RegexTokenizer(
        inputCol="__txt",
        outputCol="__toks",
        pattern=r"[^\p{L}\p{N}]+",
        toLowercase=True,
        minTokenLength=1,
    )
    bi = NGram(n=2, inputCol="__toks", outputCol="__bi")
    tf_u = HashingTF(inputCol="__toks", outputCol="__f_u", numFeatures=1 << 17)
    tf_b = HashingTF(inputCol="__bi", outputCol="__f_b", numFeatures=1 << 17)
    asm = VectorAssembler(inputCols=["__f_u", "__f_b"], outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=1e-4,
        maxIter=50,
        standardization=False,
    )
    # size-adaptive partitioning (guide §1.2/§5): every LBFGS iteration
    # pays #tasks x feature-dim DENSE gradient buffers (2 x 2^17
    # doubles per task here), so a small training frame spread over
    # many partitions spends its time allocating, zeroing and merging
    # megabyte buffers for 25-row tasks — measured 67 s -> 17 s for a
    # 200-row fit at local[8] by going to ONE partition. ~100k rows
    # per task keeps real corpora data-parallel while small frames get
    # a single buffer. (Aggregation order shifts coefficients only in
    # ulps — iterative training was never layout-stable to begin with.)
    n = train.count()
    parts = max(
        1,
        min(
            train.sparkSession.sparkContext.defaultParallelism,
            -(-n // 100_000),
        ),
    )
    return Pipeline(stages=[null_safe, tok, bi, tf_u, tf_b, asm, lr]).fit(
        train.repartition(parts)
    )


@dataclass
class MLRegistry:
    """Named model store — the engine-side analogue of Sclera's ML object
    catalog."""

    models: dict[str, object] = field(default_factory=dict)
    feature_cols: dict[str, list[str]] = field(default_factory=dict)
    kinds: dict[str, str] = field(default_factory=dict)  # classifier|clusterer
    store_dir: str | None = None

    # ---- DDL: CREATE CLASSIFIER name USING <query> ----

    def create_classifier(
        self,
        name: str,
        train: DataFrame,
        label_col: str,
        feature_cols: list[str],
        algorithm: str = "decision_tree",
        max_depth: int = 5,
    ) -> None:
        if algorithm == "stump":
            # deterministic, SQL-recomputable threshold rule (StumpModel):
            # the oracle-able path — pyspark.ml below stays the general one
            self._store(name, _fit_stump(train, label_col, feature_cols), feature_cols)
            return
        if algorithm == "text_logistic":
            # fastText/CCNet-style text classifier: the ONE feature
            # column is raw text; the pipeline owns tokenization
            # (hashed unigrams + bigrams -> weighted logistic), so
            # `CLASSIFIED WITH` applies straight to a text column and
            # the whole thing persists as one PipelineModel. All
            # stages are JVM transforms — scoring is a map-only pass.
            if len(feature_cols) != 1:
                raise ValueError(
                    "text_logistic takes exactly ONE feature column "
                    f"(the text), got {feature_cols}"
                )
            self._store(
                name,
                _fit_text_logistic(train, label_col, feature_cols[0]),
                feature_cols,
            )
            return
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import (
            DecisionTreeClassifier,
            LogisticRegression,
            RandomForestClassifier,
        )
        from pyspark.ml.feature import VectorAssembler

        assembler = VectorAssembler(inputCols=feature_cols, outputCol="__features")
        est = {
            "decision_tree": lambda: DecisionTreeClassifier(
                featuresCol="__features", labelCol=label_col, maxDepth=max_depth, seed=42
            ),
            "random_forest": lambda: RandomForestClassifier(
                featuresCol="__features", labelCol=label_col, maxDepth=max_depth, seed=42
            ),
            "logistic": lambda: LogisticRegression(featuresCol="__features", labelCol=label_col),
        }[algorithm]()
        model = Pipeline(stages=[assembler, est]).fit(train)
        self._store(name, model, feature_cols)

    def create_clusterer(
        self,
        name: str,
        train: DataFrame,
        feature_cols: list[str],
        k: int = 4,
        algorithm: str = "kmeans",
    ) -> None:
        if algorithm == "voronoi":
            # deterministic seeded-Voronoi assignment (the canopy/seed
            # step of k-means without the iterations): seeds = the k
            # lexicographically-smallest DISTINCT feature rows, cluster =
            # argmin squared-L2 to a seed, ties to the lowest seed index.
            # No RNG, no iteration -> a SQL oracle can retrain it
            # from scratch (see __spark_entry__ clustered_with).
            self._store(
                name, _fit_voronoi(train, feature_cols, k), feature_cols
            , kind="clusterer")
            return
        from pyspark.ml import Pipeline
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.feature import VectorAssembler

        assembler = VectorAssembler(inputCols=feature_cols, outputCol="__features")
        km = KMeans(featuresCol="__features", predictionCol="__cluster", k=k, seed=42)
        model = Pipeline(stages=[assembler, km]).fit(train)
        self._store(name, model, feature_cols, kind="clusterer")

    def _store(
        self, name: str, model, feature_cols: list[str], kind: str = "classifier"
    ) -> None:
        import json

        key = name.upper()
        self.models[key] = model
        self.feature_cols[key] = feature_cols
        self.kinds[key] = kind
        if self.store_dir and hasattr(model, "write"):
            # pyspark.ml persistence + a sidecar with what the model
            # file does not carry (kind, feature columns) — a restarted
            # engine lazily reloads on first use (reference: models
            # persist in the schema store, exec/SchemaStore.scala)
            path = os.path.join(self.store_dir, key)
            model.write().overwrite().save(path)
            with open(path + ".json", "w") as fh:
                json.dump(
                    {"kind": kind, "feature_cols": feature_cols}, fh
                )
        elif self.store_dir and isinstance(
            model, (StumpModel, VoronoiModel)
        ):
            # the deterministic models are a handful of scalars —
            # persist them in the sidecar itself, so they survive a
            # restart exactly like the pyspark.ml pipelines (late r12)
            path = os.path.join(self.store_dir, key)
            spec: dict = {"kind": kind, "feature_cols": feature_cols}
            if isinstance(model, StumpModel):
                spec["stump"] = {
                    "feature": model.feature,
                    "threshold": model.threshold,
                    "pred_le": model.pred_le,
                    "pred_gt": model.pred_gt,
                }
            else:
                spec["voronoi"] = {
                    "seeds": [list(s) for s in model.seeds],
                    "feature_cols": model.feature_cols,
                }
            with open(path + ".json", "w") as fh:
                json.dump(spec, fh)

    def hydrate_index(self) -> None:
        """Merge persisted sidecars into the kind/feature-column index
        WITHOUT loading the models — LIST/DESCRIBE after a restart must
        show persisted models a query has not touched yet (reference:
        the schema store lists everything it holds)."""
        import json

        if not self.store_dir or not os.path.isdir(self.store_dir):
            return
        for f in os.listdir(self.store_dir):
            if not f.endswith(".json"):
                continue
            key = f[:-5]
            if key in self.kinds:
                continue
            try:
                with open(os.path.join(self.store_dir, f)) as fh:
                    meta = json.load(fh)
                self.kinds[key] = meta["kind"]
                self.feature_cols[key] = meta["feature_cols"]
            except Exception:
                continue  # a foreign/corrupt sidecar never breaks LIST

    def model_class(self, name: str) -> str:
        """Model class name for DESCRIBE, WITHOUT loading the model:
        a loaded model answers from memory; a persisted one answers
        from its sidecar (stump/voronoi payloads name their class,
        a bare sidecar means a pyspark.ml PipelineModel dir). A stale
        sidecar whose pipeline dir is missing reports 'unavailable'
        instead of breaking the whole listing (hydrate_index's
        'a foreign/corrupt sidecar never breaks LIST' contract)."""
        import json

        key = name.upper()
        m = self.models.get(key)
        if m is not None:
            return type(m).__name__
        if not self.store_dir:
            return "unavailable"
        path = os.path.join(self.store_dir, key)
        try:
            with open(path + ".json") as fh:
                meta = json.load(fh)
        except Exception:
            return "unavailable"
        if "stump" in meta:
            return "StumpModel"
        if "voronoi" in meta:
            return "VoronoiModel"
        return "PipelineModel" if os.path.isdir(path) else "unavailable"

    def get(self, name: str, spark=None):
        """The named model; with ``spark`` given, a model persisted by a
        previous session (pyspark.ml save + sidecar) reloads lazily."""
        key = name.upper()
        m = self.models.get(key)
        if m is None and spark is not None and self.store_dir:
            m = self._load(key, spark)
        if m is None:
            raise KeyError(f"unknown ML object: {name}")
        return m

    def _load(self, key: str, spark):
        import json

        path = os.path.join(self.store_dir, key)
        sidecar = path + ".json"
        if not os.path.isfile(sidecar):
            return None
        with open(sidecar) as fh:
            meta = json.load(fh)
        if "stump" in meta:
            s = meta["stump"]
            model = StumpModel(
                s["feature"], s["threshold"], s["pred_le"], s["pred_gt"]
            )
        elif "voronoi" in meta:
            v = meta["voronoi"]
            model = VoronoiModel(
                [tuple(s) for s in v["seeds"]], list(v["feature_cols"])
            )
        else:
            if not os.path.isdir(path):
                return None
            from pyspark.ml import PipelineModel

            model = PipelineModel.load(path)
        self.models[key] = model
        self.feature_cols[key] = meta["feature_cols"]
        self.kinds[key] = meta["kind"]
        return model

    def drop(self, name: str) -> None:
        import shutil

        self.models.pop(name.upper(), None)
        self.feature_cols.pop(name.upper(), None)
        self.kinds.pop(name.upper(), None)
        if self.store_dir:
            path = os.path.join(self.store_dir, name.upper())
            shutil.rmtree(path, ignore_errors=True)
            try:
                os.unlink(path + ".json")
            except FileNotFoundError:
                pass


def classify(
    registry: MLRegistry, df: DataFrame, name: str, out_col: str = "label"
) -> DataFrame:
    """`<input> CLASSIFIED WITH name` — original columns + predicted label."""
    model = registry.get(name, df.sparkSession)
    out = model.transform(df)
    return out.select(*df.columns, F.col("prediction").cast("int").alias(out_col))


def cluster(
    registry: MLRegistry, df: DataFrame, name: str, out_col: str = "cluster"
) -> DataFrame:
    """`<input> CLUSTERED WITH name` — original columns + cluster id."""
    model = registry.get(name, df.sparkSession)
    out = model.transform(df)
    return out.select(*df.columns, F.col("__cluster").alias(out_col))


def impute(
    registry: MLRegistry,
    df: DataFrame,
    name: str,
    col: str,
    flag_col: str | None = None,
) -> DataFrame:
    """`<input> IMPUTED WITH name(col) [FLAG f]`: NULLs in ``col`` replaced
    by the named classifier's prediction from the other feature columns;
    optional boolean flag marks imputed rows (reference ImputeSpec.scala)."""
    model = registry.get(name, df.sparkSession)
    # mark nullness BEFORE filling (the model needs a non-null feature value
    # to produce a prediction for the missing rows)
    marked = df.withColumn("__was_null", F.col(col).isNull())
    filled = marked.withColumn(col, F.coalesce(F.col(col), F.lit(0)))
    pred = model.transform(filled).withColumnRenamed("prediction", "__pred")
    sel = []
    for c in df.columns:
        if c == col:
            sel.append(
                F.when(F.col("__was_null"), F.col("__pred").cast(df.schema[col].dataType))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            sel.append(F.col(c))
    if flag_col:
        sel.append(F.col("__was_null").alias(flag_col))
    return pred.select(*sel)
