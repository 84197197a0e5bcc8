"""Time a subset of registered queries and capture their plans.

The per-round optimization loop needs isolated, repeatable numbers for
the handful of queries being worked on — without paying the full
bench.py sweep each iteration.  Same methodology as bench.py: noop
sink, BUILD_TIMED clock convention, min-of-N, per-row load stamps.

    python tools/bench_some.py [--sf DIR] [--reps N] [--plans DIR] q1 q2 ...

With --plans, each query's .explain("formatted") output is written to
DIR/<query>.txt (the round's before/after plan evidence).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BUILD_TIMED  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    args = ap.parse_args()

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell"
    )
    from firewatch_spark.queries import registry
    from firewatch_spark.session import get_spark

    spark = get_spark("firewatch-bench-some")
    reg = registry()

    # same warmups as bench.py, off-clock
    reg["completion_stats"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    if any(q.startswith("streaming_") for q in args.queries):
        reg["streaming_session_parity"].fn(
            spark, "/root/testdata/sf0.001"
        ).write.format("noop").mode("overwrite").save()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"bench_some: {name}")
        if name in BUILD_TIMED:
            t0 = time.perf_counter()
            df = reg[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        df = reg[name].fn(spark, args.sf)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {}
    for name in args.queries:
        if name not in reg:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = reg[name].fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        if args.reps < 1:
            print(f"{name}: plan captured", flush=True)
            continue
        load1 = os.getloadavg()[0]
        runs = [run(name) for _ in range(args.reps)]
        results[name] = {
            "min": round(min(runs), 3),
            "runs": [round(t, 3) for t in runs],
            "load1m": round(load1, 2),
        }
        print(f"{name}: min {min(runs):.3f}s  runs "
              f"{[round(t, 3) for t in runs]}  load1m {load1:.2f}",
              flush=True)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
