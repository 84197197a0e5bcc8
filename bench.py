"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with the noop sink (full pipeline
runs, nothing collected to the driver), after a warmup action to pay
JVM/codegen startup once.  BASELINE.md's reference numbers are
frames/sec on the streaming path; the comparable figure here is
events-rows/sec through the flagship surrogate->session->stats
pipeline, reported as `rows_per_sec_flagship`.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Queries whose WORK happens while building the DataFrame (the
# streaming replays run a whole availableNow query inside the callable;
# video_scan materializes its temp input files; near_dup_clusters runs
# its label-propagation actions in the build loop) — for these the
# clock wraps build + sink, for plain batch queries it wraps the sink
# only (plan construction is sub-ms noise).  Every registered query
# gets a datapoint either way.
BUILD_TIMED = {
    "streaming_session_parity",
    "streaming_ep2_parity",
    "video_scan",
    "near_dup_clusters",
    "llm_pipeline",  # runs near_dup_clusters' propagation actions in-build
    "cluster_representatives",  # same propagation actions in-build
    # verify_candidates localCheckpoints the candidate pairs in-build —
    # the LSH lineage materializes there, so the sink-only clock would
    # miss most of the query's real work
    "lsh_verify",
    # both compose verify_candidates (same in-build checkpoint)
    "split_leakage_audit",
    "split_leakage_repair",
    "incremental_dedup",
    # both checkpoint the capped candidate pairs in-build (same reason)
    "incremental_dedup_indexed",
    # bpe_merge_k3 / llm_pipeline-style per-round materializations
    "bpe_merge_k3",
    # the shard WRITE is the query's work; the returned agg only reads
    # the written files back
    "training_shards",
    # Lloyd iterations checkpoint per round in-build
    "ivf_train_centroids",
    "ann_ivf_trained_topk",
    # runs a whole availableNow foreachBatch query in-build
    "streaming_incremental_dedup",
    # index store + availableNow foreachBatch serving run in-build
    "streaming_ann_serve",
    # label propagation actions in-build (like near_dup_clusters)
    "embedding_dedup_keep",
    # round-7: localCheckpoints the capped candidates in-build (same
    # reason as incremental_dedup_indexed)
    "incremental_dedup_bloom",
    # residual checkpoint + per-round codebook materializations + dim
    # probes run in-build
    "ann_ivf_pq_topk",
    "ann_ivf_pq_refine",  # wraps ann_ivf_pq_topk's build
    "ann_pq_recall",  # runs BOTH PQ builds + the exact audit side
    "jsonl_ingest",  # the JSONL write happens in-build
    # round-8 build-timed audit (the host_pagerank lesson, swept with
    # a static action-in-build scan): the CSV fixture write, the
    # stored-index parquet write, and the histogram localCheckpoint
    # all run while the frame is built
    "csv_ingest",
    "ann_ivf_upsert",
    "length_quantile_sketch",
    "warc_ingest",  # the WARC-shaped dump write happens in-build
    "crawl_pipeline",  # same dump write in-build
    "web_corpus_pipeline",  # same dump write in-build (round 10)
    "streaming_sketch_merge",  # availableNow foreachBatch run in-build
    "dedup_index_roll",  # localCheckpoints the stored index in-build
    # stop-rule probes (vocab count, argmax collect) + per-round
    # checkpoints run in-build
    "bpe_vocab_induction",
    # 24 in-build jobs (trained-merge materializations) — caught by the
    # r8 job-count audit; sink-only timed through r7
    "bpe_apply_trained",
    # per-round rank checkpoints (pagerank) / contraction-round
    # checkpoints (star) run in-build — found by the r8 25× probe
    # reading host_pagerank at 0.04 s sink-only
    "host_pagerank",
    "near_dup_clusters_star",
    # round-9: replay-chunk write + availableNow foreachBatch run
    # in-build (the streaming_ann_serve shape)
    "streaming_weighted_sample",
    # composes web.pagerank — per-round rank checkpoints in-build
    "frontier_schedule",
    # round-10: both compose web.pagerank (same in-build checkpoints)
    "crawl_budget_allocate",
    "crawl_budget_apply",
    # delivery-file writes + availableNow foreachBatch run in-build
    "streaming_recrawl_schedule",
    # dump write + availableNow foreachBatch run in-build
    "streaming_warc_ingest",
    # localCheckpoints the scored corpus in-build (load-bearing cut)
    "curation_pipeline",
    # round-10: frontier write + availableNow foreachBatch run in-build
    "streaming_blocklist_filter",
    # localCheckpoints the per-source shingle-hash table in-build (the
    # 4-consumer cut; 1.59× → 0.43× linear at the 25× probe)
    "corpus_overlap_minhash",
    # localCheckpoints the JM-scored corpus in-build (the
    # curation_pipeline cut; rank phases + count re-ran the scorer)
    "quality_filter_ensemble",
    # the JM scorer now cuts pairs/bigram-vocab lineage in-build
    # (uncut, the static planner broadcast the corpus-scale bigram
    # vocabulary — 173–570 s at the 25× probe vs ~115–176 s cut)
    "interpolated_lm_score",
    "quality_tier_mixture",  # composes the JM scorer (same cut)
    # rides bpe_apply's trained-merge materializations (the
    # bpe_apply_trained shape) before the lang aggregation
    "tokenizer_compression",
    # round-11: ivf_train's per-iteration checkpoints + the label-
    # propagation actions run in-build (the embedding_dedup_keep shape)
    "semantic_dedup_pipeline",
    # round-13: these four gained lazy localCheckpoint cuts of their
    # multiply-consumed stage tables (OPTIMIZATION_r13.md CS2/CS3) — and
    # Dataset.checkpoint(eager=false) materializes the AQE query stages
    # UP TO the checkpoint at call time (only the result stage is
    # deferred), so the cut work runs in-build; the sink-only clock
    # would miss it.  Caught for frontier_pipeline by
    # tests/test_plans.py::test_build_time_work_is_declared_build_timed;
    # the other three sit under that guard's 5-job threshold but move
    # the same kernel work in-build, so they are declared too (the
    # pre-r13 code did no in-build jobs in any of the four, so their
    # earlier sink-only numbers remain comparable).
    "video_frame_dedup",
    "video_segment_dedup",
    "embedding_near_dup",
    "frontier_pipeline",
    # round-13 second pass: these three gained localCheckpoint cuts of
    # multiply-consumed tables (the DSIR importance table, the scored
    # corpus, the phash-keyed pair table), so the cut kernel work now
    # runs in-build (their pre-cut code did no in-build jobs — earlier
    # sink-only numbers remain comparable)
    "dsir_importance_sample",
    "quality_budget_select",
    "image_text_pair_dedup",
    # round-14 (VERDICT r13 #4): the structural guard — any query whose
    # FINAL plan reads a Scan ExistingRDD materialized part of its
    # lineage in-build (tests/test_plans.py::
    # test_checkpointing_queries_are_build_timed) — caught these five
    # running sub-5-job checkpoints the old job-count threshold missed;
    # declaring them moves that work ONTO the clock (their r13-and-
    # earlier sink-only numbers under-measured, so r14 rows can only
    # read slower than a true comparison, never faster)
    "bm25_topk",
    "domain_blocklist_filter",
    "hybrid_retrieval_rrf",
    "lsh_band_plan",
    "quality_threshold_sweep",
    # round-14 replay cuts (lazy localCheckpoint of narrow stage tables
    # materializes their upstream AQE stages in-build)
    "curation_funnel",
    "crawl_delay_schedule",
    "recrawl_schedule",
    # r14: the k-scaled SemDeDup row (VERDICT r13 #7) — same in-build
    # Lloyd checkpoints as semantic_dedup_pipeline, plus the count()
    # that sizes k
    "semantic_dedup_kscaled",
}


# Evidence hygiene, round 11 (VERDICT r10 #1 — second offense): a
# bench captured under ambient load fabricates regressions (r10's
# committed artifact showed 3 phantom 3-4x slowdowns that idle reruns
# disproved), so a non-idle machine is now a REFUSAL, not a warning.
# The gate spin-waits for the 1-min load average to drop below
# IDLE_LOAD1M (ambient load decays with its own 1-minute time
# constant, so waiting is usually enough), then hard-fails — non-zero
# exit, no artifact written, nothing on stdout — if the machine never
# quiets down.  SPARK_GRAFT_BENCH_FORCE=1 restores the old
# warn-and-stamp behavior for debugging ONLY; a forced artifact still
# carries load_warning=true and must never be committed.
# Round 13 (VERDICT r12 #1a): thresholds scale with the core count.
# The r12 absolute gates (load1m < 1.0 to start / storm >= 1.5) were
# unreachable bars on this 32-core box — 1.0 is 3 % utilization, the
# sandbox's AMBIENT load sits ~2.2, and the bench's own just-finished
# stages keep load1m >= 1.5 essentially always — so the r12 driver run
# dissolved into back-to-back 120 s cooldowns until the driver timeout
# killed it (BENCH_r12.json: rc=124, zero parsed results).  The gates
# now measure load as a FRACTION of the machine: idle = < 15 % of
# cores busy (4.8 on 32 cores — ambient 2.2 passes, a real storm at
# 8+ still waits), decaying-storm 5m gate at 25 %, per-row storm
# stamp at 20 %.  The max(...) floors keep the old absolute semantics
# on small boxes (and keep the guard tests meaningful at ncpu=1).
NCPU = os.cpu_count() or 1
IDLE_LOAD1M = max(1.0, 0.15 * NCPU)
# Round 12 (VERDICT r11 #1): the load1m-only gate let a DECAYING storm
# through — r11's driver artifact passed at load1m 0.86 while
# load5m/15m sat at 8.6/9.6, i.e. the machine was minutes out of heavy
# load and its page cache / scheduler state still carried the storm
# (symptoms: flagship p50 +49 %, pandas_vs_row 1.19x vs the idle
# 2.11x).  The gate also requires load5m below IDLE_LOAD5M, so a
# recently-stormy machine must actually cool down before timing starts.
IDLE_LOAD5M = max(2.5, 0.25 * NCPU)
# Per-row storm stamp threshold: a query whose start-of-run load1m
# exceeded this is re-timed in the retry pass (VERDICT r11 #1c) — the
# automated form of SCALE.md's manual storm protocol.
STORM_LOAD1M = max(1.5, 0.20 * NCPU)
# A machine more than half-busy after the full wait is genuinely
# slammed: timing there is pure weather, so the start gate still
# refuses (SystemExit) past this line.  BETWEEN IDLE_LOAD1M and this,
# an expired wait now runs WITH load_warning=true instead of refusing
# — VERDICT r12 #1 adjudicated a stamped-warning artifact as strictly
# better evidence than no artifact at all (the r10 "refusal, not
# warning" doctrine cost round 12 its entire perf record).
REFUSE_LOAD1M = max(4.0, 0.5 * NCPU)
IDLE_WAIT_SEC = 600
IDLE_POLL_SEC = 15
# Total mid-bench cooldown across the WHOLE run (VERDICT r12 #1b).
# r12's per-trigger 120 s cooldowns had no global cap, so ~30 stormy-
# stamped slope rows alone could burn an hour of driver budget.  Every
# mid-bench wait now draws from this shared pot; once it's spent, the
# run stamps and proceeds — never waits again.
COOLDOWN_BUDGET_SEC = 300.0
_cooldown_spent = 0.0


def wait_for_idle(
    threshold: float = IDLE_LOAD1M,
    timeout_sec: float = IDLE_WAIT_SEC,
    poll_sec: float = IDLE_POLL_SEC,
    threshold5m: float = IDLE_LOAD5M,
    exit_on_busy: bool = True,
) -> float:
    """Block until load1m < threshold AND load5m < threshold5m; return
    the final load1m.  Raises SystemExit(2) if the machine is still
    busy after timeout_sec (unless SPARK_GRAFT_BENCH_FORCE=1).
    ``exit_on_busy=False`` is for MID-BENCH cooldowns (the storm-retry
    passes): a refusal there would abort a bench whose timings are
    already complete and lose the artifact — instead return the load
    and let the caller's per-row stamps tell the story."""
    deadline = time.monotonic() + timeout_sec
    load1, load5 = os.getloadavg()[:2]
    while (load1 >= threshold or load5 >= threshold5m) and (
        time.monotonic() < deadline
    ):
        print(
            f"bench: waiting for idle (load1m {load1:.2f} / load5m "
            f"{load5:.2f}; need < {threshold} / < {threshold5m}) ...",
            file=sys.stderr,
        )
        time.sleep(poll_sec)
        load1, load5 = os.getloadavg()[:2]
    if load1 >= threshold or load5 >= threshold5m:
        if not exit_on_busy:
            print(
                f"bench: mid-bench cooldown expired still busy (load1m "
                f"{load1:.2f} / load5m {load5:.2f}) — proceeding; retry "
                "rows carry their load stamps",
                file=sys.stderr,
            )
            return load1
        if os.environ.get("SPARK_GRAFT_BENCH_FORCE") == "1":
            print(
                f"bench: FORCED run under load1m {load1:.2f} / load5m "
                f"{load5:.2f} — artifact will be flagged "
                "load_warning=true; do not commit it",
                file=sys.stderr,
            )
            return load1
        if load1 < REFUSE_LOAD1M:
            # VERDICT r12 #1: the r10 refusal doctrine zeroed round
            # 12's entire perf record.  A merely-non-idle machine now
            # runs with the warning stamped in the artifact; only a
            # genuinely slammed one (>= 50 % of cores) still refuses.
            print(
                f"bench: still non-idle after {timeout_sec:.0f}s (load1m "
                f"{load1:.2f} / load5m {load5:.2f}) — proceeding with "
                "load_warning=true; do not commit this artifact "
                "(VERDICT r12 #1: a stamped warning beats no evidence)",
                file=sys.stderr,
            )
            return load1
        print(
            f"bench: REFUSING to run — load1m {load1:.2f} >= "
            f"{REFUSE_LOAD1M} ({0.5 * NCPU:.0f} = half the cores) after "
            f"waiting {timeout_sec:.0f}s; timings would measure machine "
            "weather, not code (VERDICT r10 #1, r11 #1).  Re-run when "
            "idle, or set SPARK_GRAFT_BENCH_FORCE=1 for a debug-only run.",
            file=sys.stderr,
        )
        raise SystemExit(2)
    return load1


def cooldown(timeout_sec: float = 120.0) -> float:
    """Mid-bench cooldown drawing from the shared COOLDOWN_BUDGET_SEC
    pot (VERDICT r12 #1b).  Once the budget is spent the bench never
    waits again — it stamps the load and proceeds, so weather can slow
    the run but can no longer starve it into a driver timeout."""
    global _cooldown_spent
    remaining = COOLDOWN_BUDGET_SEC - _cooldown_spent
    if remaining <= 0:
        load1 = os.getloadavg()[0]
        print(
            f"bench: cooldown budget exhausted ({COOLDOWN_BUDGET_SEC:.0f}s "
            f"spent) — proceeding at load1m {load1:.2f}; row stamps tell "
            "the story",
            file=sys.stderr,
        )
        return load1
    t0 = time.monotonic()
    load1 = wait_for_idle(
        timeout_sec=min(timeout_sec, remaining), exit_on_busy=False
    )
    _cooldown_spent += time.monotonic() - t0
    return load1


# Driver-timeout backstop (VERDICT r12 #1c): after every completed
# pass main() stores the freshest driver-parseable compact line here;
# if the driver's `timeout` SIGTERMs the bench, the handler prints it
# before dying, so a truncated run still delivers everything timed so
# far (r12 lost all ~187 per-query timings to rc=124 with an empty
# stdout).  BENCH_FULL.json is likewise rewritten at each checkpoint.
_SNAPSHOT: dict = {"line": None}


def _emit_snapshot_and_exit(signum, frame):  # pragma: no cover - signal path
    line = _SNAPSHOT.get("line")
    if line:
        print(line, flush=True)
    os._exit(3)


def main() -> None:
    # Size the single local-mode JVM for the whole registry session:
    # the default heap survived ~165 queries and then OOMed in task
    # broadcast deserialization once web_corpus_pipeline's sf0.1
    # payload DISTINCTs landed at the end of the alphabet (round 10).
    # 24 g since round 11: min-of-2 everywhere roughly doubled the
    # allocation volume per session and the 16 g heap GC-aged by the
    # streaming rows (see the fresh-session note below).
    # PYSPARK_SUBMIT_ARGS is the one route that reaches a
    # not-yet-started JVM (session.py documents why getOrCreate can't).
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell"
    )
    from firewatch_spark.queries import registry
    from firewatch_spark.session import get_spark

    # Evidence hygiene (VERDICT r9 #2 / r10 #1): refuse to measure a
    # busy machine — see wait_for_idle.  The stamps stay in the
    # artifact so a reader can verify the gate held (load_warning can
    # only be true on a debug-forced run, which must not be committed).
    wait_for_idle()
    load_start = os.getloadavg()
    load_warning = (
        load_start[0] >= IDLE_LOAD1M or load_start[1] >= IDLE_LOAD5M
    )
    # prior committed artifact, for the flagship sanity gate below
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    prev_p50 = None
    prev_queries: dict[str, float] = {}
    try:
        with open(full_path) as fh:
            _prev = json.load(fh)
        prev_p50 = _prev.get("flagship_p50_sec")
        prev_queries = _prev.get("queries", {}) or {}
    except (OSError, ValueError):
        pass

    spark = get_spark("firewatch-bench")
    reg = registry()

    def run(name: str, sf_dir: str = SF_DIR) -> float:
        if name in BUILD_TIMED:
            t0 = time.perf_counter()
            df = reg[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        df = reg[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # ---- incremental evidence assembly (VERDICT r12 #1c) ----------
    # State the passes fill in as they complete; assemble() tolerates
    # the not-yet-run ones so a checkpoint after ANY pass yields a
    # valid (partial-flagged) artifact + compact line.
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    SCALE_FACTOR = 5
    times: dict[str, float] = {}
    times_detail: dict[str, dict[str, float]] = {}
    flagship_runs: list[float] = []
    inference: dict | None = None
    scaling: dict = {}
    retry_overturned: list[str] = []
    retry_dropped: list[str] = []
    n_events: int | None = None

    def assemble(stage: str) -> dict:
        total = round(sum(times.values()), 4)
        fr = flagship_runs
        pct = (
            (lambda p: round(fr[min(int(p * len(fr)), len(fr) - 1)], 4))
            if fr
            else (lambda p: None)
        )
        p50 = pct(0.5)
        med = fr[len(fr) // 2] if fr else None
        stream_t = times.get("streaming_session_parity")
        full = {
            "metric": "total_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": dict(times),
            "queries_runs": times_detail,
            "sf": float(sf),
            "rows_per_sec_flagship": (
                round(n_events / med, 1) if n_events and med else None
            ),
            # min-of-5 beside p50 (VERDICT r6 #6): min is the standard
            # noise-robust latency statistic for fixed work — use
            # flagship_min_sec for round-over-round code comparison
            "flagship_min_sec": round(fr[0], 4) if fr else None,
            "flagship_p50_sec": p50,
            "flagship_p95_sec": pct(0.95),
            # flagship sanity gate (VERDICT r9 #2): if p50 moved >25 %
            # against the PRIOR committed artifact the ratio says so in
            # the artifact itself; load stamps tell weather from code
            "flagship_p50_prev": prev_p50,
            "flagship_p50_vs_prev": (
                round(p50 / prev_p50, 3) if p50 and prev_p50 else None
            ),
            "loadavg_start": [round(x, 2) for x in load_start],
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            "load_warning": load_warning,
            "cooldown_spent_sec": round(_cooldown_spent, 1),
            # streaming throughput headline: the full stateful session
            # operator (W1-W4) replayed as a real micro-batched query
            # end-to-end — comparable to the reference's 20-30
            # fps/processor figure (docs/PERFORMANCE.md:7-9)
            "sessionized_rows_per_sec_stream": (
                round(n_events / stream_t, 1) if n_events and stream_t else None
            ),
            "batched_inference": inference,
            "retry_overturned": retry_overturned,
            "retry_dropped": retry_dropped,
            "scaling": {"factor": SCALE_FACTOR, "queries": scaling},
        }
        if stage != "final":
            full["partial"] = stage
        return full

    def compact_line(full: dict, min_sec: float) -> str:
        tmap = full["queries"]
        kept = {n: round(v, 2) for n, v in tmap.items() if v >= min_sec}
        payload = {
            "metric": "total_wall_sec",
            "value": full["value"],
            "unit": "sec",
            "sf": full["sf"],
            "n_queries": len(tmap),
            # slowest-first: the informative end of the distribution
            "queries": dict(sorted(kept.items(), key=lambda kv: -kv[1])),
            "q_omitted_below_sec": min_sec,
            "q_omitted": len(tmap) - len(kept),
            "rows_per_sec_flagship": full.get("rows_per_sec_flagship"),
            "flagship_min_sec": full.get("flagship_min_sec"),
            "flagship_p50_sec": full.get("flagship_p50_sec"),
            "flagship_p95_sec": full.get("flagship_p95_sec"),
            "load1m_start": round(load_start[0], 2),
            "load_warning": full["load_warning"],
            "sessionized_rows_per_sec_stream": full.get(
                "sessionized_rows_per_sec_stream"
            ),
        }
        if full.get("partial"):
            payload["partial"] = full["partial"]
        inf = full.get("batched_inference") or {}
        if "pandas_vs_row_speedup" in inf:
            payload["pandas_vs_row_speedup"] = inf["pandas_vs_row_speedup"]
            payload["column_vs_row_speedup"] = inf["column_vs_row_speedup"]
        sc = (full.get("scaling") or {}).get("queries") or {}
        if sc:
            payload["scaling_slope_vs_linear"] = {
                n: s["slope_vs_linear"] for n, s in sc.items()
            }
        payload["full"] = "BENCH_FULL.json"
        return json.dumps(payload, separators=(",", ":"))

    def fit_line(full: dict) -> str:
        # ONE compact line guaranteed < 1.9 kB so the driver's 2 kB
        # capture parses it (VERDICT r5 #1: rounds 4 and 5 both lost
        # the external perf record to mid-line truncation).
        line = compact_line(full, 0.0)
        for threshold in (0.05, 0.1, 0.2, 0.3, 0.5, 1.0):
            if len(line) <= 1900:
                return line
            line = compact_line(full, threshold)
        if len(line) > 1900:
            # graceful degradation (r7): drop the slope map FIRST
            # (verbatim in BENCH_FULL.json), then truncate the query
            # map slowest-first — the expensive tail ALWAYS survives.
            payload = json.loads(compact_line(full, 1.0))
            payload.pop("scaling_slope_vs_linear", None)
            qs = list(payload["queries"].items())  # already slowest-first
            while True:
                payload["queries"] = dict(qs)
                payload["q_omitted"] = payload["n_queries"] - len(qs)
                line = json.dumps(payload, separators=(",", ":"))
                if len(line) <= 1900 or not qs:
                    break
                qs = qs[:-1]
        return line

    def checkpoint(stage: str) -> dict:
        """Write BENCH_FULL.json and refresh the SIGTERM snapshot line
        with everything timed so far (VERDICT r12 #1c: a driver
        timeout may truncate the bench, never zero its evidence)."""
        full = assemble(stage)
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
        _SNAPSHOT["line"] = fit_line(full)
        return full

    signal.signal(signal.SIGTERM, _emit_snapshot_and_exit)

    # warmup: pay JVM/codegen/parquet-footer costs outside the clock
    reg["completion_stats"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # Arrow python-worker pool warmup: a trivial mapInPandas across the
    # full core count forks the pyspark daemon's worker pool once,
    # off-clock.  Round 5's ann_topk "regression" was exactly this cost
    # landing on whichever one-shot query touched Python first
    # (measured: 2.8 s cold vs 0.65 s warm at sf0.1).
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    # streaming warmup at the smallest SF: state-store provider, Arrow
    # python workers and the streaming engine cold-start cost ~3x the
    # steady-state replay time on a fresh JVM — pay it off-clock so the
    # timed streaming rows measure the operator, not process init
    reg["streaming_session_parity"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    # flagship latency percentiles (reference scripts/bench.py reports
    # p50/p95/p99 per frame; the batch analog is repeated query runs).
    # Run BEFORE the main loop: round 4 ran these last, right after
    # near_dup_clusters' ~40 label-propagation actions, and the session
    # residue inflated p50 0.33→0.41 s (VERDICT r4 "Next round" #8).
    # One untimed rep first: the flagship is now the session's first
    # sf-dir query, so it would otherwise pay the first-read footer +
    # codegen cost inside its percentile window.
    run("session_stats")
    flagship_runs = sorted(run("session_stats") for _ in range(5))

    # Per-query table is MIN-OF-2 for fast queries (VERDICT r7 #1): the
    # single-run table under driver load manufactured 12 phantom ≥1.4×
    # "regressions" in round 7 (class_filter 1.08→2.77 s on identical
    # code; idle rerun 0.13 s).  min is the noise-robust statistic for
    # fixed work — the flagship's min-of-5 proved the pattern in r6.
    # Per-query table is min-of-2 for every query whose first timing is
    # >= MIN2_FLOOR_SEC (round 12, VERDICT r11 #5): round 11 ran
    # min-of-2 on all 187 rows and the driver bench hit ~340 s wall;
    # the sub-0.5 s rows were never the fabrication surface (the storm
    # risk lives in the multi-second rows), so their second timing buys
    # nothing.  A sub-second query caught by a storm reads SLOWER than
    # 0.5 s and therefore still earns its second run.
    # BENCH_FULL.json keeps BOTH runs per query ({"t": min, "t1":
    # first}) plus the start-of-row load1m stamp (VERDICT r11 #1b) so a
    # reader can tell weather from code per ROW, not just per session.
    MIN2_FLOOR_SEC = 0.5

    def time_queries(names) -> None:
        for i, name in enumerate(names, 1):
            row_load = os.getloadavg()[0]
            t1 = run(name)
            t = min(t1, run(name)) if t1 >= MIN2_FLOOR_SEC else t1
            times[name] = round(t, 4)
            times_detail[name] = {
                "t": round(t, 4),
                "t1": round(t1, 4),
                "load1m": round(row_load, 2),
            }
            # mid-pass snapshot every 25 rows (VERDICT r12 #1c): the
            # per-query pass is the longest stretch of the run, so a
            # driver timeout landing inside it must still find the
            # rows timed so far in the artifact + SIGTERM line
            if i % 25 == 0:
                checkpoint(f"queries:{i}")

    # (Round-11 restructure note: a mid-bench `spark.stop()` +
    # re-`get_spark()` before the streaming rows was TRIED and measured
    # WORSE — the restart shares the aged JVM, so it drops the warmed
    # state-store/codegen caches while keeping the heap residue;
    # streaming_session_parity read 77.9 s cold in the restarted
    # session vs 6.3-7.0 s in a fresh process and ~7 s warm in-loop.
    # The rows stay in the single warmed session; their replay-chunk
    # count dropped 3→2 (VERDICT r10 #6) which fresh-process probes
    # put at ep2 3.4-4.1 s / blocklist 4.2-5.6 s.)
    time_queries(sorted(reg))
    checkpoint("queries")

    # Batched-inference demonstration — the reference's explicitly
    # deferred win (docs/PERFORMANCE.md:148-150): same surrogate model
    # as a row-at-a-time Python UDF vs Arrow pandas UDF vs JVM column
    # expression, timed over the same scan.
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from firewatch_spark import surrogate

    # lineitem's key column: enough rows that per-row Python overhead
    # (what batching removes) dominates the timing signal
    ev = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("event_id")
    )

    row_udf = F.udf(
        lambda s: float((s * surrogate.KNUTH) % surrogate.MOD) / surrogate.MOD,
        "double",
    )
    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which breaks pandas_udf signature inference
    arrow_udf = pandas_udf(
        lambda s: ((s * surrogate.KNUTH) % surrogate.MOD) / float(surrogate.MOD),
        "double",
    )

    def time_variant(col) -> float:
        # min-of-2 (round 12, VERDICT r11 #1): this block is the
        # BASELINE.md batched-inference headline; r11's driver artifact
        # caught a storm here (pandas leg 7.15 s vs 0.73 s idle) and
        # published a 1.19x reading that contradicted the committed
        # 2.11x.  Fixed work → min is the noise statistic.
        df = ev.select(col.alias("p"))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    inference_load = os.getloadavg()[0]
    inference = {
        "row_udf_sec": round(time_variant(row_udf(F.col("event_id"))), 4),
        "pandas_udf_sec": round(time_variant(arrow_udf(F.col("event_id"))), 4),
        "column_expr_sec": round(
            time_variant(surrogate.raw_probability(F.col("event_id"))), 4
        ),
        "load1m": round(inference_load, 2),
    }
    if inference_load >= STORM_LOAD1M or os.getloadavg()[0] >= STORM_LOAD1M:
        # storm retry (same doctrine as the per-query pass below): wait
        # out the weather and keep the per-variant min across sessions
        cooldown(timeout_sec=120)
        inference["storm_retry"] = True
        for key, col in (
            ("row_udf_sec", row_udf(F.col("event_id"))),
            ("pandas_udf_sec", arrow_udf(F.col("event_id"))),
            ("column_expr_sec", surrogate.raw_probability(F.col("event_id"))),
        ):
            inference[key] = round(
                min(inference[key], time_variant(col)), 4
            )
        inference["retry_load1m"] = round(os.getloadavg()[0], 2)
    # NB: the surrogate's arithmetic is trivial, so this measures pure
    # per-row overhead; a real model forward pass widens the gap by its
    # per-call cost (the reference's deferred "batched inference" win).
    inference["pandas_vs_row_speedup"] = round(
        inference["row_udf_sec"] / inference["pandas_udf_sec"], 2
    )
    inference["column_vs_row_speedup"] = round(
        inference["row_udf_sec"] / inference["column_expr_sec"], 2
    )
    checkpoint("inference")

    # Scaling slope (VERDICT r4 #3): the capped/bucketed operators,
    # re-timed on a 5x replication of SF_DIR's documents+embeddings
    # (word-salted so near-dup structure scales linearly, see
    # tools/scale_data.py).  slope_vs_linear = (t_5x / t_1x) / 5:
    # 1.0 = perfectly linear, < 1 sublinear (fixed overhead amortizing
    # out), > 1 superlinear (a pair explosion or an uncapped join).
    from tools.scale_data import build_scaled_dir

    # fresh session for the slope points too (see the JVM-residue note
    # above — the x5 numbers are exactly the rows a tired heap poisons)
    spark.stop()
    spark = get_spark("firewatch-bench")
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    SCALE_QUERIES = [
        "dedup_exact",
        "dedup_minhash_lsh",
        "simhash_pairs",
        "near_dup_clusters",
        "repetition_stats",
        "ann_lsh_buckets",
        "ann_ivf_topk",
        "cross_doc_packing",
        # the production O(candidates) verify composition; the sampled
        # all-pairs ngram_jaccard is deliberately NOT a slope target —
        # its pair count is quadratic in the sample BY DESIGN (measured
        # 1.46× linear at 5x; C(200,2)→C(1000,2) rows)
        "lsh_verify",
        # round-5 session-4 operators whose caps/buckets should be
        # proven, not argued: capped cross-side band join, vocabulary-
        # keyed joins, bucket-offset global rank, two-phase top-k
        "incremental_dedup",
        "unigram_score",
        "corpus_shuffle",
        "source_cap",
        # every-offset gram window + per-doc interval union — the
        # heaviest linear text op, slope should stay ~linear
        "dup_ngram_coverage",
        # bigram count + argmax broadcast + parity windows — the
        # tokenizer-induction round
        "bpe_merge",
        # round-6 operators whose caps/buckets should be proven:
        # stored-index band join + carrier md5 scan
        "incremental_dedup_indexed",
        # bucketed cosine self-join + label propagation
        "embedding_dedup_keep",
        # pure linear token fold — the slope floor
        "quality_classifier",
        # round-7 operators: bloom-prefiltered band join (the prefilter
        # should IMPROVE the slope vs the unfiltered indexed form),
        # PQ index build + ADC probe (codes/LUT joins must stay
        # Σ-probed-cell, never corpus²), island-union removal and the
        # hamming-banded image pairs (both linear by construction)
        "incremental_dedup_bloom",
        "ann_ivf_pq_topk",
        "dup_span_removal",
        "image_phash_dedup",
        # int8 brute-force scan — linear by construction like ann_topk;
        # hard_negative_mining shares the identical scan shape
        "ann_sq8_topk",
        # round-8: two bounded gram-count aggs + broadcast ≤10⁴-row
        # log-ratio table + two-phase rank — should track the linear
        # token-fold floor (quality_classifier), never the pair ops
        "dsir_importance_sample",
        # round-10: postings join + per-query top-k (constant query
        # set — the posting count, not the corpus, should scale)
        "bm25_topk",
        # pure let-bound line folds — the quality_classifier floor
        "c4_filters",
        # groupBy(line-hash) min-coords + reassembly — span_dedup's
        # shape on natural boundaries
        "line_dedup",
        # round-11: keep-first postings (min/max partials) + the same
        # island/rebuild tail as dup_span_removal — must track it
        "cross_doc_span_dedup",
        # round-12: the span-50 hash-doubling form — 6 per-row md5
        # sweeps replace the 50x window-string blow-up; must track the
        # family's linear slope, not the direct builder's string cost
        "long_span_dedup",
        # distinct (source, hash) + two-phase bottom-k + exact-audit
        # equi-join — the audit join is the only corpus-scale edge
        "corpus_overlap_minhash",
        # bounded suffix explode + plain equi-join on the suffix key
        "domain_blocklist_filter",
        # trained-merge apply rounds + one lang-keyed agg (BUILD_TIMED)
        "tokenizer_compression",
        # JM scorer + two-phase global rank + two doc-keyed joins —
        # the stacked filter gate, JM-dominated
        "quality_filter_ensemble",
        # quality_threshold_sweep / dedup_savings_report are NOT slope
        # targets: they ride quality_classifier's fold and
        # dedup_exact's hash-groupBy respectively, both already proven;
        # lsh_band_plan is sample-bound by ngram_jaccard (deliberately
        # quadratic in its 1/25 sample, like ngram_jaccard itself);
        # semantic_dedup_pipeline is quadratic-within-cell AT FIXED k
        # BY DESIGN (SemDeDup's scale control is k ∝ √n, a caller
        # parameter the registered fixed-k attestation can't vary —
        # SCALE.md records the measured fixed-k slope and the k-scaling
        # arithmetic instead)
    ]
    # Both points use IDENTICALLY-built dirs (32-file parquet): timing
    # the x1 point off SF_DIR's single-file layout confounds the slope
    # with scan parallelism (measured: two queries ran FASTER at 5x
    # against the one-file baseline).
    bench_root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_scale"
    )
    dirs = {}
    for factor in (1, SCALE_FACTOR):
        d = os.path.join(bench_root, f"x{factor}")
        # BOTH tables must exist: documents is written first, so a
        # crash between the two writes would otherwise look complete
        # forever and feed the embedding slopes stale/missing data
        if not all(
            os.path.exists(os.path.join(d, t, "_SUCCESS"))
            for t in ("documents.parquet", "embeddings.parquet")
        ):
            build_scaled_dir(spark, SF_DIR, d, factor)
        dirs[factor] = d
    # min-of-2 per slope POINT (round 11): the x1 points are sub-second
    # for several operators, so a 0.3 s jitter spike doubles the
    # reported slope — r11's probes saw ann_lsh_buckets read 2.07
    # "slope" from exactly that, on unchanged code
    for name in SCALE_QUERIES:
        slope_load = os.getloadavg()[0]
        t_base = min(run(name, dirs[1]), run(name, dirs[1]))
        t_scaled = min(
            run(name, dirs[SCALE_FACTOR]), run(name, dirs[SCALE_FACTOR])
        )
        if slope_load >= STORM_LOAD1M or os.getloadavg()[0] >= STORM_LOAD1M:
            # storm-aware slope protocol (VERDICT r11 #3): a stormy x1
            # point doubles the reported slope — cool down, keep mins
            cooldown(timeout_sec=120)
            t_base = min(t_base, run(name, dirs[1]))
            t_scaled = min(t_scaled, run(name, dirs[SCALE_FACTOR]))
        scaling[name] = {
            "t_1x_sec": round(t_base, 4),
            f"t_{SCALE_FACTOR}x_sec": round(t_scaled, 4),
            "slope_vs_linear": round(t_scaled / t_base / SCALE_FACTOR, 3),
            "load1m": round(slope_load, 2),
        }
    checkpoint("scaling")

    # Outlier-retry pass (round 11, extended round 12): this host's
    # weather comes in MINUTE-long slow windows invisible to loadavg
    # (measured: an 8 s query reading 31.5 s on BOTH of its
    # back-to-back runs, then 8 s again standalone an hour later), so
    # per-query min-of-2 cannot save a row whose whole window was slow.
    # Two triggers now feed the retry set:
    #   (a) regressed > 1.5x against the last committed artifact, or
    #   (b) the row's start-of-run load1m stamp exceeded STORM_LOAD1M
    #       (VERDICT r11 #1c — the automated storm protocol; r11's
    #       driver artifact had stormy rows the old trigger missed
    #       because there was no prior row to compare against).
    # Each retried row gets ONE more timing, in the restarted session,
    # minutes later — and keeps the min (fixed work; min is the repo's
    # noise doctrine).  A real regression survives this: it reproduces
    # in the retry.  ADVICE r11 asked for overturned regressions to be
    # VISIBLE, not silently green: rows where the retry disproved a
    # (a)-trigger regression are flagged retry_overturned both per-row
    # and in a top-level list, so a repeatedly-overturned query can be
    # spotted across committed artifacts (an intermittent ~50 %
    # regression shows up as the same name overturned round after
    # round).
    regressed = {
        n for n, t in times.items()
        if n in prev_queries and t > 1.5 * prev_queries[n] + 0.5
    }
    stormy = {
        n for n, d in times_detail.items()
        if d.get("load1m", 0.0) >= STORM_LOAD1M
    }
    retry_candidates = sorted(regressed | stormy, key=lambda n: -times[n])
    retry = retry_candidates[:30]
    # ADVICE r12: the [:30] cap must not be silent — in a widespread
    # storm the overflow rows keep contaminated timings with no retry,
    # so the artifact names them (retry_dropped) and stderr logs them.
    retry_dropped.extend(retry_candidates[30:])
    if retry_dropped:
        print(
            f"bench: retry cap 30 hit — {len(retry_dropped)} stormy/"
            f"regressed rows NOT retried: {retry_dropped}",
            file=sys.stderr,
        )
    if retry:
        # cool down before re-timing: retrying INTO the same storm that
        # stamped the row would just re-measure the weather
        cooldown(timeout_sec=120)
        # re-pay the streaming warmup so stateful retries measure the
        # operator, not engine cold-start
        if any(n.startswith("streaming_") for n in retry):
            reg["streaming_session_parity"].fn(
                spark, "/root/testdata/sf0.001"
            ).write.format("noop").mode("overwrite").save()
        for name in retry:
            # ADVICE r12: stamp load BEFORE the retried run — a
            # post-run load1m on local[32] measures the run's own
            # self-generated load, not ambient weather (SCALE.md r12
            # postmortem), inverting the stamp's meaning vs the
            # per-row start-of-run convention.
            retry_load = os.getloadavg()[0]
            t3 = run(name)
            times_detail[name]["t_retry"] = round(t3, 4)
            times_detail[name]["retry_load1m"] = round(retry_load, 2)
            if name in stormy:
                times_detail[name]["storm_retry"] = True
            if t3 < times[name]:
                times[name] = round(t3, 4)
                times_detail[name]["t"] = times[name]
            if (
                name in regressed
                and name in prev_queries
                and times[name] <= 1.5 * prev_queries[name] + 0.5
            ):
                times_detail[name]["retry_overturned"] = True
                retry_overturned.append(name)

    # flagship retry under the same weather rule: the percentile block
    # runs early, so one slow window poisons all 5 reps together
    if prev_p50 and sorted(flagship_runs)[len(flagship_runs) // 2] > 1.25 * prev_p50:
        run("session_stats")
        rerun = sorted(run("session_stats") for _ in range(5))
        if rerun[len(rerun) // 2] < flagship_runs[len(flagship_runs) // 2]:
            flagship_runs = rerun

    checkpoint("final")
    print(_SNAPSHOT["line"])
    spark.stop()


if __name__ == "__main__":
    main()
