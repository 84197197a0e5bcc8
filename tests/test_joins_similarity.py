"""As-of join, top-k, and embedding-similarity operator contracts."""

from pyspark.sql import functions as F

from firewatch_spark.operators import joins, similarity
from tests.conftest import rows


def _events(spark, data):
    return spark.createDataFrame(data, "user_id string, event_id long, value double")


def test_asof_join_strict(spark):
    left = _events(spark, [("u", 10, 0.0), ("u", 20, 0.0), ("u", 5, 0.0)]).select(
        "user_id", "event_id"
    )
    right = _events(spark, [("u", 10, 1.0), ("u", 15, 2.0)])
    out = rows(
        joins.asof_join(left, right, "user_id", "event_id", ["value"], strict=True),
        "event_id",
    )
    # strict: the right row AT event 10 is not visible to left event 10
    assert [(r["event_id"], r["asof_value"]) for r in out] == [
        (5, None), (10, None), (20, 2.0),
    ]


def test_asof_join_non_strict(spark):
    left = _events(spark, [("u", 10, 0.0)]).select("user_id", "event_id")
    right = _events(spark, [("u", 10, 1.0)])
    out = rows(
        joins.asof_join(left, right, "user_id", "event_id", ["value"], strict=False)
    )
    assert out[0]["asof_value"] == 1.0  # <= semantics matches same-seq row


def test_asof_join_per_key_isolation(spark):
    left = _events(spark, [("a", 10, 0.0), ("b", 10, 0.0)]).select("user_id", "event_id")
    right = _events(spark, [("a", 5, 1.0)])
    out = {r["user_id"]: r["asof_value"] for r in rows(
        joins.asof_join(left, right, "user_id", "event_id", ["value"])
    )}
    assert out == {"a": 1.0, "b": None}


def test_topk_per_group_with_tiebreak(spark):
    df = _events(
        spark,
        [("u", 1, 5.0), ("u", 2, 5.0), ("u", 3, 1.0), ("v", 9, 2.0)],
    )
    out = rows(
        joins.topk_per_group(df, "user_id", [F.desc("value"), F.asc("event_id")], k=2),
        "user_id",
        "rank",
    )
    assert [(r["user_id"], r["event_id"], r["rank"]) for r in out] == [
        ("u", 1, 1), ("u", 2, 2), ("v", 9, 1),
    ]


def _emb(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # nearest to 1
        (3, [0.0, 1.0, 0.0]),   # orthogonal to 1
        (4, [-1.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(vecs, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 1)
    out = rows(similarity.cosine_topk(emb, q, k=3), "rank")
    assert [r["neighbor_id"] for r in out] == [2, 3, 4]
    assert out[0]["cos_sim"] > 0.99
    assert abs(out[1]["cos_sim"]) < 1e-9
    assert out[2]["cos_sim"] < -0.99


def test_cosine_excludes_self(spark):
    emb = _emb(spark)
    out = rows(similarity.cosine_topk(emb, emb, k=3))
    assert all(r["query_id"] != r["neighbor_id"] for r in out)


def test_cosine_topk_neq_col_excludes_same_label(spark):
    """Hard-negative form: candidates sharing the anchor's label (and
    NULL-labeled rows on either side) never appear."""
    vecs = [
        (1, [1.0, 0.0, 0.0], "a"),
        (2, [0.99, 0.1, 0.0], "a"),   # nearest overall, but same label
        (3, [0.9, 0.2, 0.0], "b"),    # the hard negative
        (4, [0.0, 1.0, 0.0], "b"),
        (5, [0.5, 0.5, 0.0], None),   # NULL label: excluded
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label string"
    )
    q = emb.filter(F.col("vec_id") == 1)
    out = rows(similarity.cosine_topk(emb, q, k=3, neq_col="label"), "rank")
    assert [r["neighbor_id"] for r in out] == [3, 4]
    # a NULL-labeled ANCHOR matches nothing either
    qn = emb.filter(F.col("vec_id") == 5)
    assert rows(similarity.cosine_topk(emb, qn, k=3, neq_col="label")) == []


def test_int_dot_topk_matches_float_ranking_here(spark):
    """On well-separated vectors the int8 serving tier reproduces the
    float ranking; dots are exact int64 (no float ties by design)."""
    from firewatch_spark.operators import sampling

    emb = _emb(spark)
    qz = sampling.with_int8_quantized(sampling.with_unit_norm(emb)).select(
        "vec_id", "q8"
    )
    out = rows(similarity.int_dot_topk(qz, qz.filter(F.col("vec_id") == 1), k=3), "rank")
    assert [r["neighbor_id"] for r in out] == [2, 3, 4]
    assert all(isinstance(r["dot_q8"], int) for r in out)
    # unit-norm × 127 ⇒ self-dot bound 127²·(1+d·quantization slack)
    assert out[0]["dot_q8"] <= 127 * 127 + 127


def test_lsh_bucket_collision_for_identical_vectors(spark):
    vecs = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.75]), (2, [0.5, -0.25, 0.75]), (3, [-0.5, 0.25, -0.75])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["bucket"] for r in rows(similarity.with_lsh_bucket(vecs))}
    assert out[1] == out[2]          # identical vectors share a bucket
    assert len(out[1]) == 8
    # an exactly-opposite vector flips every hyperplane sign (no zero
    # projections with these weights) -> different bucket
    assert out[3] != out[1]


def test_lsh_topk_finds_in_bucket_neighbor(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0, 3.01]), (3, [9.0, -8.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    q = vecs.filter(F.col("vec_id") == 1)
    out = rows(similarity.lsh_topk(vecs, q, k=2))
    assert out and out[0]["neighbor_id"] == 2


def test_pq_empty_corpus_raises_clear_error(spark):
    """ADVICE r7 #4: an empty residual corpus must raise a clear
    ValueError from the single dim probe, not an opaque TypeError."""
    import pytest

    from firewatch_spark.operators import similarity as S

    empty = spark.createDataFrame([], "vec_id long, rs array<bigint>")
    with pytest.raises(ValueError, match="empty residual corpus"):
        S.pq_train(empty)


def test_ivf_pq_perfect_reconstruction_on_seed_corpus(spark):
    """VERDICT r6 #1: when the corpus has exactly ks=16 vectors, every
    vector is its own PQ seed, each residual subvector quantizes to
    itself at distance 0, and ADC distances become EXACT:
    adc_d2 == Σ_d (q_iv[d] − x_iv[d])² for candidates sharing the
    query's probed cells — pinned against a numpy mirror."""
    import numpy as np

    from firewatch_spark.operators import similarity as S

    rng = np.random.default_rng(5)
    vecs = rng.uniform(-1, 1, size=(16, 64)).astype("float32")
    rows_in = [(i, [float(x) for x in vecs[i]]) for i in range(16)]
    emb = spark.createDataFrame(rows_in, "vec_id long, embedding array<float>")

    # probe EVERY cell so the exactness property is unconditional
    out = S.ivf_pq_topk(emb, emb, k=16, nprobe=16, k_centroids=4, train_iters=1)
    got = {(r["query_id"], r["neighbor_id"]): r["adc_d2"] for r in out.collect()}
    assert len(got) == 16 * 15  # all ordered pairs, self excluded

    iv = np.floor(vecs.astype("float64") * 1_000_000).astype("int64")
    for (q, n), d in got.items():
        expected = int(((iv[q] - iv[n]) ** 2).sum())
        assert d == expected, (q, n, d, expected)


def test_ivf_pq_refine_exact_rerank(spark):
    """The refine stage's contract: exact_d2 equals the true scaled-int
    L2² for every returned pair (numpy mirror), and with the shortlist
    covering the whole probed set the final ranking IS the exact
    brute-force ranking over those candidates — i.e. refine undoes any
    ADC quantization error inside the shortlist."""
    import numpy as np

    from firewatch_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    vecs = rng.uniform(-1, 1, size=(20, 64)).astype("float32")
    rows_in = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    emb = spark.createDataFrame(rows_in, "vec_id long, embedding array<float>")

    out = S.ivf_pq_refine_topk(
        emb, emb, k=3, shortlist_k=19, nprobe=4, k_centroids=4, train_iters=1
    ).collect()
    iv = np.floor(vecs.astype("float64") * 1_000_000).astype("int64")
    for r in out:
        expected = int(((iv[r["query_id"]] - iv[r["neighbor_id"]]) ** 2).sum())
        assert r["exact_d2"] == expected
    # with every candidate shortlisted, rank 1 must be the true nearest
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        d2 = ((iv - iv[qid]) ** 2).sum(axis=1)
        d2[qid] = np.iinfo(np.int64).max  # self excluded
        true_nn = int(np.argmin(d2))
        top = min(rs, key=lambda r: r["rank"])
        assert top["neighbor_id"] == true_nn, (qid, top, true_nn)


def test_rrf_fuse_agreement_and_integer_grid(spark):
    # doc 10 appears in both lists (ranks 2 and 1) and must outrank
    # doc 20 (rank 1 in one list only): 1e9//62 + 1e9//61 > 1e9//61
    lex = spark.createDataFrame(
        [("q", 20, 1), ("q", 10, 2), ("q", 30, 3)],
        "query_id string, doc_id long, rank long",
    )
    den = spark.createDataFrame(
        [("q", 10, 1), ("q", 40, 2)],
        "query_id string, doc_id long, rank long",
    )
    out = rows(similarity.rrf_fuse([lex, den], k=4), "rank")
    assert [r["doc_id"] for r in out] == [10, 20, 40, 30]
    ten = out[0]
    assert ten["n_lists"] == 2
    # exact integer-grid contributions, no float anywhere
    assert ten["rrf_scaled"] == 10**9 // 62 + 10**9 // 61
    assert out[1]["rrf_scaled"] == 10**9 // 61
    # deterministic tie-break: equal score -> lower doc_id first
    tied = spark.createDataFrame(
        [("q", 7, 1), ("q", 3, 1)], "query_id string, doc_id long, rank long"
    )
    t = rows(similarity.rrf_fuse([tied], k=2), "rank")
    assert [r["doc_id"] for r in t] == [3, 7]


def test_with_scaled_vec_short_circuits_on_existing_iv(spark):
    """r13: pipelines that materialize the scaled corpus once pass it
    back through operators that open with with_scaled_vec — the
    function must return the input untouched when `iv` already exists
    (same values, no recomputed column)."""
    from firewatch_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [1.0, 0.0])], ["vec_id", "embedding"]
    )
    once = sim.with_scaled_vec(df)
    twice = sim.with_scaled_vec(once)
    assert twice is once  # literal pass-through, no new projection
    vals = {r["vec_id"]: r["iv"] for r in twice.collect()}
    assert vals == {1: [500000, -250000], 2: [1000000, 0]}
