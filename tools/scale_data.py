"""Build a replicated scale-up of the documents/embeddings tables for
scaling-slope measurement (VERDICT r4 "Next round" #3).

The testdata tops out at sf0.1; to measure how the capped/bucketed
operators scale PAST it, this replicates sf0.1 `factor`× with id
remapping.  Replication must not change the workload's *shape*, only
its size, so:

* every replica's `text` is word-salted with a replica tag ("w" →
  "w~i"): shingles and minhash/simhash signatures within a replica
  keep the original near-dup structure, while cross-replica shingles
  never collide — candidate pairs, clusters, and bucket sizes scale
  ~linearly with `factor` instead of exploding quadratically (a naive
  copy makes every doc an exact dup of its R-1 clones);
* run-length/character statistics (repetition filters) are preserved
  per doc: salting appends to words, it never merges or splits them;
* embeddings keep their vectors (top-k/bucket queries scan linearly in
  corpus size; the near-dup-by-cosine query is NOT a slope target
  because identical replica vectors would be real cross-replica dups).

The output directory carries only the two replicated tables — point
only documents/embeddings-reading queries at it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_ID_STRIDE = 100_000_000


def _salted_documents(docs, i: int):
    salt = F.lit(f"~{i}")
    return docs.select(
        (F.col("doc_id") + i * _ID_STRIDE).alias("doc_id"),
        F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, salt)), " "
        ).alias("text"),
        "lang",
        "source",
        F.col("n_chars"),  # per-doc stat: kept as-is (word salt is metadata)
    )


def build_scaled_dir(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int
) -> None:
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    parts = [docs] + [_salted_documents(docs, i) for i in range(1, factor)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    eparts = [emb] + [
        emb.select(
            (F.col("vec_id") + i * _ID_STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(1, factor)
    ]
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


if __name__ == "__main__":
    import sys

    from pyspark.sql import SparkSession

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_scale/x5"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    build_scaled_dir(spark, src, out, factor)
    print(f"built {out} at {factor}x from {src}")
