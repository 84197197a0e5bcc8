"""End-to-end compositions of the LLM-pipeline operators — the shapes a
real 100 TB dedup/ANN pipeline actually runs, cross-checked against
DuckDB on the driver's sf0.01 tables (not just unit corpora).

1. MinHash-LSH candidates → exact n-gram-Jaccard verification
   (`verify_candidates`) — proving the "verify stage input is the LSH
   output" claim as running code with a value-level oracle.
2. ANN recall: the LSH-bucket and IVF-probe scale paths measured
   against the exact brute-force top-k ground truth.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from firewatch_spark.operators import dedup, similarity

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_lsh_candidates_then_exact_verify(spark, docs):
    cand = dedup.lsh_candidate_pairs(docs)
    verified = dedup.verify_candidates(cand, docs)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"], r["jaccard"])
        for r in verified.collect()
    }
    assert got, "LSH produced no candidates on sf0.01"

    # no cartesian anywhere in the composed plan
    plan = verified._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    # DuckDB replays the exact-Jaccard arithmetic for the same pairs
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    con.execute(
        "CREATE TABLE cand (doc_a BIGINT, doc_b BIGINT)"
    )
    con.executemany("INSERT INTO cand VALUES (?, ?)", list(got))
    rows = con.execute(
        """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3
                      THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                           i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                                || ' ' || list_extract(toks, i + 2)))
                      ELSE [concat_ws(' ', toks)] END AS sh
          FROM t
        )
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(a.sh, b.sh)) AS n_inter,
               len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS n_union
        FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
        """
    ).fetchall()
    assert len(rows) == len(got)
    for doc_a, doc_b, n_inter, n_union in rows:
        gi, gu, gj = got[(doc_a, doc_b)]
        assert (gi, gu) == (n_inter, n_union)
        assert gj == n_inter / n_union

    # identical-signature star edges ESTIMATE identity (12/12 matching
    # minhashes), they don't prove it — but verification must confirm
    # them as strong near-dups, which is exactly why the verify stage
    # exists downstream of LSH
    stars = [r for r in cand.collect() if r["est_jaccard"] == 1.0]
    assert stars, "sf0.01 contains at least one identical-sig cluster"
    for s in stars:
        assert got[(s["doc_a"], s["doc_b"])][2] >= 0.8


def test_near_dup_clusters_match_union_find(spark, docs):
    """The full dedup deliverable: LSH candidates → clusters → one
    canonical doc per cluster, checked against a Python union-find on
    the same edges."""
    cand = dedup.lsh_candidate_pairs(docs)
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(cand, docs).collect()
    }

    edges = [(r["doc_a"], r["doc_b"]) for r in cand.select("doc_a", "doc_b").collect()]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id of the component
    comp_min: dict = {}
    for i in ids:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expected = {i: comp_min[find(i)] for i in ids}

    assert labels == expected
    # keep-list: exactly one doc per cluster survives
    keep = {i for i, c in labels.items() if i == c}
    assert len(keep) == len(set(labels.values()))
    # chains collapse: every clustered doc reaches the component min
    assert all(labels[b] == labels[a] for a, b in edges)


import pytest as _pytest


@_pytest.mark.parametrize("seed", [3, 11, 42])
def test_near_dup_clusters_random_graphs(spark, seed):
    """Label propagation vs union-find on random graphs — chains,
    cycles, isolated nodes, multi-component topologies the sf0.01
    fixture can't guarantee."""
    import random

    rng = random.Random(seed)
    n = 40
    ids = list(range(n))
    edges = sorted(
        {tuple(sorted(rng.sample(ids, 2))) for _ in range(25)}
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(pairs, docs).collect()
    }

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict = {}
    for i in ids:
        comp_min.setdefault(find(i), i)  # ids ascending -> first is min
    expected = {i: comp_min[find(i)] for i in ids}
    assert labels == expected


def test_near_dup_clusters_string_ids_deep_chain(spark):
    """ADVICE r3 regression: with STRING doc ids the old sum(label)
    convergence probe returned NULL every round, so the loop exited
    after one propagation and any graph of diameter > 1 got wrong
    clusters.  A 6-hop chain of string ids must fully collapse."""
    ids = [f"doc{i:02d}" for i in range(8)]
    chain = [(ids[i], ids[i + 1]) for i in range(6)]  # doc06 needs 6 hops
    pairs = spark.createDataFrame(chain, "doc_a string, doc_b string")
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(pairs, docs).collect()
    }
    assert labels == {i: ("doc00" if i != "doc07" else "doc07") for i in ids}


def test_near_dup_clusters_converges_at_exactly_max_iter(spark):
    """A propagation that needs exactly max_iter changing rounds IS a
    fixpoint — the budget-exhausted path must confirm with one probe
    round and return, not false-alarm (and max_iter < 1 is rejected
    loudly, not a NameError)."""
    from firewatch_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"]
    )
    # the 4-chain needs exactly 3 changing rounds
    out = near_dup_clusters(pairs, docs, max_iter=3)
    assert {r["cluster_id"] for r in out.collect()} == {1}
    with pytest.raises(ValueError):
        near_dup_clusters(pairs, docs, max_iter=0)


def test_near_dup_clusters_raises_when_not_converged(spark):
    """ADVICE r4: exhausting max_iter with labels still moving must be
    a loud error, not a silently under-merged result that only the
    driver's transitive-closure oracle would catch."""
    import pytest

    ids = [f"d{i:02d}" for i in range(10)]
    chain = [(ids[i], ids[i + 1]) for i in range(9)]  # diameter 9
    pairs = spark.createDataFrame(chain, "doc_a string, doc_b string")
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.near_dup_clusters(pairs, docs, max_iter=2)
    # and a sufficient budget still converges cleanly
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(pairs, docs, max_iter=12).collect()
    }
    assert set(labels.values()) == {"d00"}


@_pytest.mark.parametrize("seed", [3, 11, 42])
def test_star_contraction_matches_union_find(spark, seed):
    """Alternating large-star/small-star contraction vs union-find on
    the same random graphs the propagation twin is pinned against —
    both algorithms must land on identical (doc, component-min)
    labels."""
    import random

    rng = random.Random(seed)
    n = 40
    ids = list(range(n))
    edges = sorted({tuple(sorted(rng.sample(ids, 2))) for _ in range(25)})
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters_star(pairs, docs).collect()
    }

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict = {}
    for i in ids:
        comp_min.setdefault(find(i), i)  # ids ascending -> first is min
    expected = {i: comp_min[find(i)] for i in ids}
    assert labels == expected


def test_star_contraction_deep_chain_logarithmic_rounds(spark):
    """The reason the star variant exists: a 64-hop string-id chain
    needs 64 propagation rounds but must collapse within a
    max_iter=10 star budget (~log2 rounds, diameter-independent).
    Duplicate/reversed pair rows and isolated docs ride along."""
    ids = [f"doc{i:03d}" for i in range(65)]
    chain = [(ids[i], ids[i + 1]) for i in range(64)]
    chain += [(b, a) for a, b in chain[:5]] + chain[:3]  # noise dups
    pairs = spark.createDataFrame(chain, "doc_a string, doc_b string")
    docs = spark.createDataFrame(
        [(i,) for i in ids + ["isolated"]], "doc_id string"
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters_star(pairs, docs, max_iter=10).collect()
    }
    assert labels["isolated"] == "isolated"
    assert all(labels[i] == "doc000" for i in ids)
    with pytest.raises(ValueError):
        dedup.near_dup_clusters_star(pairs, docs, max_iter=0)


def test_star_contraction_agrees_with_propagation_on_lsh_pairs(spark, docs):
    """On the real sf0.001 LSH candidate graph both algorithms are the
    same function: identical label maps (and thus identical keep-lists
    downstream).  Empty pair sets degrade to all-self labels."""
    cand = dedup.lsh_candidate_pairs(docs)
    prop = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(cand, docs).collect()
    }
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters_star(cand, docs).collect()
    }
    assert star == prop

    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters_star(empty, docs).collect()
    }
    assert all(k == v for k, v in out.items())


def test_ivf_upsert_batch_invariance(spark):
    """The property that makes assign-only IVF upsert correct: with
    FROZEN centroids, assigning a delta batch alone produces exactly
    the rows a full re-assignment would produce for those vectors —
    regardless of how the corpus is split into batches."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = emb.filter(F.col("vec_id") % 5 != 2)
    newb = emb.filter(F.col("vec_id") % 5 == 2)
    cents = similarity.ivf_centroids(base, k=4)
    full = {
        r["vec_id"]: (r["centroid_id"], r["d2"])
        for r in similarity.ivf_assign(emb, cents).collect()
    }
    delta = {
        r["vec_id"]: (r["centroid_id"], r["d2"])
        for r in similarity.ivf_assign(newb, cents).collect()
    }
    assert delta == {k: v for k, v in full.items() if k % 5 == 2}
    # and singleton batches land identically (the streaming-ingest case)
    one = newb.limit(1)
    (row,) = similarity.ivf_assign(one, cents).collect()
    assert (row["centroid_id"], row["d2"]) == delta[row["vec_id"]]


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(truth, approx):
    per_q = [len(approx.get(q, set()) & t) / len(t) for q, t in truth.items()]
    return sum(per_q) / len(per_q)


def test_ann_scale_paths_recall_on_clustered_vectors(spark):
    """On CLUSTERED embeddings (the regime ANN indexes exist for —
    real text/image embeddings cluster), both scale paths must recover
    nearly all true neighbors: cluster-mates share hyperplane signs
    (tiny angles) and IVF cells (tiny L2)."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 64))
    rows = []
    for c_idx in range(20):
        for m in range(25):
            v = centers[c_idx] + 0.05 * rng.normal(size=64)
            rows.append((c_idx * 25 + m, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 25 == 0)  # one per cluster

    truth = _topk_sets(similarity.cosine_topk(emb, queries, k=5))
    lsh = _topk_sets(similarity.lsh_topk(emb, queries, k=5))
    ivf = _topk_sets(similarity.ivf_topk(emb, queries, k=5, nprobe=2))
    assert _recall(truth, lsh) >= 0.8
    assert _recall(truth, ivf) >= 0.8
    # neighbors never include the query itself
    for q, ns in {**lsh, **ivf}.items():
        assert q not in ns


def test_multi_table_lsh_raises_recall(spark):
    """The standard LSH recall lever: with T independent tables a true
    neighbor is found iff it collides in ANY table — recall
    1-(1-p^P)^T grows monotonically in T.  On noisy clusters (where
    one table recalls ~0.4) the measured curve must climb."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 64))
    rows = []
    for c_idx in range(20):
        for m in range(25):
            v = centers[c_idx] + 0.45 * rng.normal(size=64)
            rows.append((c_idx * 25 + m, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    truth = _topk_sets(similarity.cosine_topk(emb, queries, k=5))
    r = {
        t: _recall(truth, _topk_sets(similarity.lsh_topk(emb, queries, k=5, num_tables=t)))
        for t in (1, 2, 4)
    }
    assert r[1] >= 0.3  # deterministic: seeded data + md5 planes
    assert r[2] > r[1]
    assert r[4] > r[2]


def test_ann_ivf_recall_on_driver_testdata(spark, emb):
    """sf0.01 embeddings are near-random (top-1 cosine ≈ 0.4), the
    WORST case for ANN.  IVF with nprobe=2 of 16 cells must still beat
    the 2/16 = 0.125 random-probe baseline because exact-L2 cell
    assignment co-locates whatever structure exists.  (Single-table
    8-plane LSH recalls ~0 here by design — the planes/recall tradeoff
    documented in similarity.py; its recall is asserted on clustered
    vectors above.)"""
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    truth = _topk_sets(similarity.cosine_topk(emb, queries, k=5))
    ivf = _topk_sets(similarity.ivf_topk(emb, queries, k=5, nprobe=2))
    assert _recall(truth, ivf) >= 2 * (2 / 16)


def test_llm_pipeline_single_lineage_invariants(spark, sf_dir):
    """VERDICT r4 #5: the full scan → quality filter → repetition
    filter → exact+near dedup → split → chunk → pack → quantize
    composition runs as ONE lineage and its per-split counts obey the
    arithmetic the stages promise.  (Value-level parity vs the composed
    DuckDB oracle is the registry gate — test_registry SAMPLE.)"""
    import math

    from firewatch_spark.queries import PACK_BUDGET, registry

    out = {
        r["split"]: r.asDict()
        for r in registry()["llm_pipeline"].fn(spark, sf_dir).collect()
    }
    assert out  # at least one split survives the filters
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_surv = sum(v["n_docs"] for v in out.values())
    assert 0 < n_surv <= total_docs  # filters and dedup only drop docs
    for v in out.values():
        # zero-overlap chunking partitions each doc's tokens exactly:
        # at least one chunk per doc, every chunk non-empty
        assert v["n_chunks"] >= v["n_docs"]
        assert v["sum_chunk_tokens"] >= v["n_chunks"]
        # greedy packing bounds: cannot beat the token budget (sum of
        # per-doc ceils >= ceil of the sum), cannot exceed chunk count
        assert (
            math.ceil(v["sum_chunk_tokens"] / PACK_BUDGET)
            <= v["n_packs"]
            <= v["n_chunks"]
        )
        # quantize leg joins on surviving docs only
        assert v["n_vecs"] <= v["n_docs"]


def test_split_shuffle_shard_output_tail(spark, sf_dir, tmp_path):
    """The pipeline's OUTPUT tail as one lineage: split → keep train →
    deterministic shuffle → fixed-size shard write.  The shards must
    jointly hold exactly the train docs, positions dense 1..N, every
    shard full except possibly the last."""
    from firewatch_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    train = sampling.split_by_hash(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).filter("split = 'train'").drop("split")
    n_train = train.count()
    shuffled = sampling.corpus_shuffle(train)
    out = str(tmp_path / "shards")
    n_shards = sampling.write_training_shards(shuffled, out, shard_size=64)
    back = spark.read.parquet(out)
    assert back.count() == n_train
    assert set(r["doc_id"] for r in back.collect()) == set(
        r["doc_id"] for r in train.collect()
    )
    pos = sorted(r["shuffle_pos"] for r in back.collect())
    assert pos == list(range(1, n_train + 1))  # dense global order
    sizes = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").count().withColumnRenamed("count", "n").collect()
    }
    assert len(sizes) == n_shards
    for shard, n in sizes.items():
        assert n == 64 or (shard == max(sizes) and 0 < n <= 64)


def _python_lloyd(vecs, k, iters):
    """Reference Lloyd in the exact integer domain ivf_train uses:
    floor(x*1e6) scaling, md5-smallest seeds, argmin with lower-id tie
    break, truncating (toward-zero, matching Spark `div`) mean."""
    import hashlib

    iv = {
        i: [int(__import__("math").floor(x * 1_000_000.0)) for x in v]
        for i, v in vecs.items()
    }
    seeds = sorted(iv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = {cid: list(iv[cid]) for cid in seeds}
    for _ in range(iters):
        members: dict = {}
        for i, v in iv.items():
            best = min(
                cents,
                key=lambda cid: (
                    sum((a - b) ** 2 for a, b in zip(v, cents[cid])),
                    cid,
                ),
            )
            members.setdefault(best, []).append(v)
        for cid, vs in members.items():
            n = len(vs)
            new = []
            for d in range(len(cents[cid])):
                s = sum(v[d] for v in vs)
                q, r = divmod(s, n)
                new.append(q if r == 0 or s >= 0 else q + 1)  # trunc, not floor
            cents[cid] = new
    return cents


def test_ivf_train_matches_python_lloyd(spark):
    import random

    rng = random.Random(3)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    # the reference must see the same float32-rounded values Spark does
    f32 = {
        i: [float(r["embedding"][d]) for d in range(8)]
        for i, v in vecs.items()
        for r in [emb.filter(F.col("vec_id") == i).first()]
    }
    got = {
        r["centroid_id"]: list(r["civ"])
        for r in similarity.ivf_train(emb, k=4, iters=3).collect()
    }
    assert got == _python_lloyd(f32, k=4, iters=3)


def test_ivf_train_raises_recall_on_clustered_vectors(spark):
    """The point of training: on clustered data with noisy spread, the
    Lloyd-refined centroids separate the clusters better than the raw
    md5 sample, so probe search recovers at least as many true
    neighbors at the same nprobe."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 64))
    rows = []
    for c_idx in range(20):
        for m in range(25):
            v = centers[c_idx] + 0.45 * rng.normal(size=64)
            rows.append((c_idx * 25 + m, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    truth = _topk_sets(similarity.cosine_topk(emb, queries, k=5))
    fixed = _recall(truth, _topk_sets(similarity.ivf_topk(emb, queries, k=5, nprobe=2)))
    trained_cents = similarity.ivf_train(emb, k=16, iters=2)
    trained = _recall(
        truth,
        _topk_sets(
            similarity.ivf_topk(emb, queries, k=5, nprobe=2, centroids=trained_cents)
        ),
    )
    print(f"ivf recall fixed={fixed:.3f} trained={trained:.3f}")
    # deterministic corpus + deterministic training: measured
    # fixed=0.92, trained=1.00 — training must never lose to the seed
    # sample and must hold its near-perfect recall here
    assert trained >= max(fixed, 0.95)
