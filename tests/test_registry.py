"""Driver-contract surface: registry shape + a sampled oracle replay.

The full gate is tools/oracle_check.py (all queries, sf0.01); this
keeps a fast representative slice inside pytest.
"""

import duckdb
import pytest

import __spark_entry__ as entrypoint

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SAMPLE = ["session_stats", "inference_cadence", "dedup_exact", "asof_join"]

# the LLM-pack attestation queries: cheap enough to gate in pytest
# too, so a registry edit can't silently break them before the driver
# sees them (doc_chunks moved to _TAIL in round 5 — covered by the
# tail replay below); llm_pipeline is the round-5 composition
SAMPLE += ["repetition_stats", "chunk_packing", "dataset_split", "llm_pipeline"]
# round-5 session-4 head queries
SAMPLE += ["unigram_score", "incremental_dedup", "udtf_chunks", "udaf_user_peak"]
# round-9 curation/crawl flagships — pinned inside the driver window,
# so the unwindowed sf0.01 replay below never reaches them; this keeps
# a pytest-side gate on them too
SAMPLE += ["quality_budget_select", "frontier_pipeline", "curation_pipeline"]
# round-11 additions: never-attested queries sort INTO the driver
# window (staleness order), so the unwindowed replay below skips them —
# gate them here until their first driver row lands
SAMPLE += ["cross_doc_span_dedup", "semantic_dedup_pipeline", "hybrid_retrieval_rrf",
           "anchor_text_agg", "curation_funnel"]
# round-14 addition: the k ∝ √n SemDeDup row (VERDICT r13 #7) — gate it
# here until its first driver window row lands
SAMPLE += ["semantic_dedup_kscaled"]


def replay_against_oracle(spark, sf_dir, name):
    """The ONE oracle-replay body both gates share (ADVICE r4): run the
    registered Spark query and its DuckDB oracle side-by-side and
    assert row-count + column-set + value equality.  Rows-only entries
    (oracle is None) assert the weaker runnable-with-a-real-schema
    contract — that IS the whole driver-side check for them."""
    from firewatch_spark import queries as Q

    spec = Q.registry()[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only by design: the contract is "runs and yields a
        # non-degenerate schema" (the driver records rows+schema only)
        assert len(sdf.columns) > 0
        return
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    odf = con.execute(spec.oracle).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    key = sorted(sdf.columns)
    a = sdf.reindex(key, axis=1).sort_values(key).reset_index(drop=True)
    b = odf.reindex(key, axis=1).sort_values(key).reset_index(drop=True)
    b = b.astype(a.dtypes.to_dict())
    assert a.equals(b)


def test_contract_shape():
    qs = entrypoint.queries()
    osql = entrypoint.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs)
    # the ONE oracle-less query left is deliberate: Spark's HLL++
    # sketch is engine-specific (its pytest VALUE gate is
    # test_approx_distinct_users_within_rsd); video_scan gained a
    # closed-form literal oracle in r8
    assert set(qs) - set(osql) == {"approx_distinct_users"}


def test_approx_distinct_users_within_rsd(spark, sf_dir, sf_dir_mid):
    """VERDICT r7 #2: the registry's one rows-only-by-design query gets
    its VALUE gate here — HLL++ at rsd=0.05 must land every group's
    estimate within the configured rsd of the exact distinct count, at
    both pytest scale factors.  (measured: max rel_err 0.0067 at
    sf0.01; rsd is a standard deviation, so a deterministic fixture
    comfortably inside it stays inside it.)"""
    from firewatch_spark import queries as Q

    fn = Q.registry()["approx_distinct_users"].fn
    for d in (sf_dir, sf_dir_mid):
        out = fn(spark, d).collect()
        assert len(out) == 5  # one row per event_type
        for r in out:
            assert r["exact_users"] > 0
            assert r["rel_err"] <= 0.05, (d, r)


def test_entry_returns_rows(spark):
    df = entrypoint.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, name):
    replay_against_oracle(spark, sf_dir, name)


def _unwindowed_names():
    """Registry entries outside the external driver's 50-query window
    this round (queries.py _ordered — staleness-sorted since r11).  They
    must keep a continuous gate: this replay runs them against the same
    DuckDB oracle AT THE DRIVER'S sf0.01 SCALE (VERDICT r5 #6) so
    cap/bucket-boundary bugs can't hide at the smaller fixture size —
    rotation (VERDICT r6 #5) decides only who ALSO gets an external
    driver hash row, never who gets gated."""
    from firewatch_spark import queries as Q

    return list(Q._ordered())[Q._DRIVER_WINDOW:]


@pytest.mark.parametrize("name", _unwindowed_names())
def test_unwindowed_queries_keep_oracle_coverage(spark, sf_dir_mid, name):
    replay_against_oracle(spark, sf_dir_mid, name)


def test_driver_window_is_staleness_sorted():
    """The attestation schedule invariants (VERDICT r10 #2): permanent
    pins lead, then the pool ascends by last-green-attestation round
    (never-attested first), no duplicates, and every registry entry
    appears exactly once — so the window can never starve a query and
    there is no per-round constant to hand-bump (the r10 failure
    mode)."""
    from firewatch_spark import queries as Q

    ordered = list(Q._ordered())
    assert len(ordered) == len(set(ordered)) == len(Q.registry())
    pins = [n for n in Q._PERMANENT_PINS if n in Q.registry()]
    assert ordered[: len(pins)] == pins
    last = Q._attested_round()
    tail_rounds = [last.get(n, -1) for n in ordered[len(pins):]]
    assert tail_rounds == sorted(tail_rounds)
    # a query red/errored in its latest round must NOT count as
    # attested then (it keeps its older green round)
    import json
    import os
    import tempfile
    from unittest import mock

    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "CORRECTNESS_r03.json"), "w") as fh:
            json.dump(
                {
                    "green_hash": {"hash_match": True, "rows_match": True},
                    "red_hash": {"hash_match": False, "rows_match": True},
                    "no_oracle": {
                        "hash_match": None,
                        "rows_match": None,
                        "spark_rows": 5,
                        "err": "no_oracle",
                    },
                    "errored": {
                        "hash_match": None,
                        "rows_match": None,
                        "spark_rows": None,
                        "err": "boom",
                    },
                },
                fh,
            )
        with mock.patch.object(Q.os.path, "dirname", return_value=td):
            got = Q._attested_round()
    # hash-green and the deliberate no-oracle row count; a red hash and
    # a hard error do not
    assert got == {"green_hash": 3, "no_oracle": 3}
