"""Phase breakdown for span_dups (duplicated_spans) at a given data dir.

Times each pipeline phase in isolation with the noop sink so the cost of
tokenize / gram-explode / eligibility / self-join / merge / verify is
attributable. Usage:
    python tools/profile_span_dups.py <data_dir> [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df, label, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"{label:38s} {dt:7.2f}s", flush=True)
    return dt


def main() -> None:
    data_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "200")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sclera_spark.llm.text import _tokens
    from sclera_spark.llm.spandedup import duplicated_spans

    docs = spark.read.parquet(os.path.join(data_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    k = 8

    # whole query, as declared
    t_all = noop(
        duplicated_spans(docs, k=8, max_gram_freq=1000, verify=True),
        "FULL duplicated_spans",
        spark,
    )

    base = docs.select(
        F.col("doc_id").alias("__id"), _tokens(F.col("text")).alias("__t")
    ).filter(F.size("__t") >= k)
    noop(base, "phase1 tokenize", spark)

    grams = base.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - (k - 1)),
                lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice("__t", i, k))),
            )
        ).alias("__p0", "__fp"),
    ).select("__id", (F.col("__p0") + 1).alias("__pos"), "__fp")
    noop(grams, "phase2 tokenize+grams", spark)

    elig = (
        grams.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter((F.col("__n") >= 2) & (F.col("__n") <= 1000))
        .select("__fp")
    )
    noop(elig, "phase3 eligibility agg", spark)

    seeds_pool = grams.join(elig, "__fp")
    noop(seeds_pool, "phase4 seeds_pool (grams x elig)", spark)

    a = seeds_pool.select(
        F.col("__fp"), F.col("__id").alias("id_a"), F.col("__pos").alias("pos_a")
    )
    b = seeds_pool.select(
        F.col("__fp"), F.col("__id").alias("id_b"), F.col("__pos").alias("pos_b")
    )
    seeds = a.join(b, "__fp").where(F.col("id_a") < F.col("id_b"))
    noop(seeds, "phase5 seed self-join", spark)

    diag = (F.col("pos_a") - F.col("pos_b")).alias("__diag")
    w = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pos_a")
    isl = seeds.select("id_a", "id_b", "pos_a", "pos_b", diag).withColumn(
        "__grp", F.col("pos_a") - F.row_number().over(w)
    )
    spans = (
        isl.groupBy("id_a", "id_b", "__diag", "__grp")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + k).alias("span_len"),
        )
        .drop("__diag", "__grp")
        .filter(F.col("span_len") >= k)
    )
    noop(spans, "phase6 span merge (no verify)", spark)

    n = spans.count()
    print(f"span rows before verify: {n}")
    print(f"FULL again: {noop(duplicated_spans(docs, k=8, max_gram_freq=1000, verify=True), 'FULL rep2', spark):.2f}")


if __name__ == "__main__":
    main()
