"""Phase breakdown for crawl_gate_incr at a given data dir.

The entry is a ~20-job pipeline (3 sketch passes, 2 manifest write
barriers, 2 LSH gates); this times each barrier in sequence with wall
clocks and job descriptions so the Spark UI / logs attribute the cost.
Usage:
    python tools/profile_crawl_gate.py <data_dir> [cpus] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    data_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    def full(label):
        t0 = time.time()
        qs["crawl_gate_incr"](spark, data_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{label:44s} {time.time() - t0:7.2f}s", flush=True)

    full("warmup FULL crawl_gate_incr")
    for r in range(reps):
        full(f"FULL crawl_gate_incr rep{r}")

    # phase breakdown (mirrors the entry body)
    import tempfile

    from sclera_spark.llm import minhash_anti_join_sketched, minhash_sketch
    from sclera_spark.llm.dedup import _collapse_probe_worthwhile
    from sclera_spark.sources.manifest import ManifestTable

    eng = entry._engine(spark, data_dir)
    docs = eng.table("documents").select("doc_id", "text")
    corpus = docs.where("doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    b2 = docs.where("doc_id % 3 = 2")

    t0 = time.time()
    worth = _collapse_probe_worthwhile(docs)
    print(f"{'phase0 collapse probe':44s} {time.time() - t0:7.2f}s")
    gate_collapse = None if worth else False
    sk_cols = ["minhash", "hset"] + (["hset_fp"] if worth else [])

    def sk(df):
        return minhash_sketch(df, "text", 128, 5, with_fp=worth).select(
            F.col("doc_id").alias("id"), *sk_cols
        )

    def clock(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        out = fn()
        print(f"{label:44s} {time.time() - t0:7.2f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    path = os.path.join(tempfile.mkdtemp(prefix="sclera_gate_prof_"), "sketch")

    def sketches():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_mt = pool.submit(ManifestTable.create, sk(corpus), path)
            f_sk1 = pool.submit(lambda: sk(b1).localCheckpoint(eager=True))
            f_sk2 = pool.submit(lambda: sk(b2).localCheckpoint(eager=True))
            return f_mt.result(), f_sk1.result(), f_sk2.result()

    mt, sk1, sk2 = clock("phase1-2-5 3 sketch jobs (overlapped)", sketches)
    from pyspark.sql.types import StructField, StructType

    read_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in sk1.schema.fields]
    )
    kept1 = clock(
        "phase3 gate b1 (LSH + dup_ids ckpt)",
        lambda: minhash_anti_join_sketched(
            b1, mt.read(spark, schema=read_schema), threshold=0.8,
            num_perm=128, bands=16,
            new_sketch=sk1, collapse=gate_collapse,
        ),
    )
    clock(
        "phase4 append(sk1 semi kept1) [write]",
        lambda: mt.append(
            sk1.join(kept1.select(F.col("doc_id").alias("id")), "id", "left_semi")
        ),
    )
    kept2 = clock(
        "phase6 gate b2 (LSH + dup_ids ckpt)",
        lambda: minhash_anti_join_sketched(
            b2, mt.read(spark, schema=read_schema), threshold=0.8,
            num_perm=128, bands=16,
            new_sketch=sk2, collapse=gate_collapse,
        ),
    )
    clock(
        "phase7 final union noop",
        lambda: (
            kept1.select("doc_id").withColumn("batch", F.lit(1))
            .unionByName(kept2.select("doc_id").withColumn("batch", F.lit(2)))
            .write.format("noop").mode("overwrite").save()
        ),
    )


if __name__ == "__main__":
    main()
