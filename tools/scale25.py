"""One-off 25x scaling probe (SCALE.md "third point") — re-times
selected documents-only registry queries on the x1 and x25 replicated
dirs built by tools/scale_data.py, printing slope_vs_linear per query.

Usage:  python tools/scale25.py [query ...]
The session mirrors the round-5 sizing lesson: 48g heap, 64 shuffle
partitions (the default heap GC-thrashed label propagation at 25x).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "dup_span_removal",
    "incremental_dedup_bloom",
    "image_phash_dedup",
    "audio_fingerprint_dedup",
    "bpe_vocab_induction",
    "bpe_apply_trained",
]

# queries whose work happens while building the DataFrame — the ONE
# authoritative set lives in bench.py (ADVICE r8: the hand-copied
# subset here drifted, yielding sink-only — wrong — slope timings for
# crawl_pipeline/csv_ingest/ann_ivf_upsert/length_quantile_sketch)
from bench import BUILD_TIMED  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from firewatch_spark.queries import registry

    # SPARK_GRAFT_SCALE_FACTOR=125 probes x1 -> x125 instead (build the
    # dir first: tools/scale_data.py /root/testdata/sf0.1 .bench_scale/x125 125)
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "25"))
    names = sys.argv[1:] or DEFAULT
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_scale"
    )
    dirs = {1: os.path.join(root, "x1"), factor: os.path.join(root, f"x{factor}")}
    for d in dirs.values():
        if not os.path.exists(os.path.join(d, "documents.parquet", "_SUCCESS")):
            raise SystemExit(f"missing scaled dir {d} — run bench.py first (x1/x5) "
                             "and tools/scale_data.py for x25")

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    def run(name: str, sf_dir: str) -> float:
        if name in BUILD_TIMED:
            t0 = time.perf_counter()
            df = reg[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        df = reg[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        # PER-OP warmup at x1: each query's first execution pays Arrow
        # worker-pool fork + per-stage codegen once — measured 18.4 s
        # cold vs 2.4 s warm for the audio fingerprint — which would
        # otherwise corrupt the slope's x1 denominator
        run(name, dirs[1])
        t1 = run(name, dirs[1])
        tN = run(name, dirs[factor])
        print(
            f"{name}: t_1x={t1:.2f}s t_{factor}x={tN:.2f}s "
            f"slope_vs_linear={(tN / t1 / factor):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
