"""Round-5 session-4 operators: unigram scoring, per-group caps,
incremental (new-vs-index) dedup, cluster-balanced sampling.

Oracle replay covers engine parity (test_registry + tools/
oracle_check.py); these pin the SEMANTICS against independent Python
references and hand-built scenarios, plus the layout-independence the
two-phase top-k claims.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from firewatch_spark.operators import dedup, sampling, text


def test_unigram_score_matches_python_reference(spark):
    docs = [
        (1, "a a b"),
        (2, "b c"),
        (3, "a a a a"),
        (4, "d"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in text.unigram_score(df).collect()}

    tf = Counter(tok for _, t in docs for tok in t.split(" "))
    total = sum(tf.values())
    for doc_id, t in docs:
        toks = t.split(" ")
        sum_tf = sum(tf[tok] for tok in toks)
        got = out[doc_id]
        assert got["n_tokens"] == len(toks)
        assert got["sum_tf"] == sum_tf
        assert got["min_tf"] == min(tf[tok] for tok in toks)
        assert got["total_tokens"] == total
        assert got["mean_token_tf"] == sum_tf / len(toks)
        assert got["mean_token_prob"] == sum_tf / (len(toks) * float(total))


def test_unigram_score_rare_vs_boilerplate_ordering(spark):
    # a doc of corpus-frequent tokens must outscore a doc of hapaxes —
    # the property the quality filter gates on
    docs = [(i, "common words here") for i in range(10)]
    docs.append((100, "zzyzx qwfp vexing"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r["mean_token_prob"] for r in text.unigram_score(df).collect()}
    assert out[0] > out[100]


def _naive_topk(spark, df, k):
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def test_top_k_per_group_equals_naive_window(spark):
    rows = [(i % 7, i, (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    fast = sampling.top_k_per_group(df, "g", 5, [F.desc("v"), F.asc("id")])
    naive = _naive_topk(spark, df, 5)
    assert sorted(fast.collect()) == sorted(naive.collect())


def test_top_k_per_group_layout_independent(spark):
    """The partition-id pre-prune must not leak into the result: any
    repartitioning of the input yields the identical top-k."""
    rows = [(0, i, i % 13) for i in range(300)]  # one hot group
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    base = sorted(
        sampling.top_k_per_group(df, "g", 4, [F.desc("v"), F.asc("id")]).collect()
    )
    for n in (1, 3, 17):
        shuffled = df.repartition(n)
        got = sorted(
            sampling.top_k_per_group(
                shuffled, "g", 4, [F.desc("v"), F.asc("id")]
            ).collect()
        )
        assert got == base


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_incremental_dedup_scenarios(spark):
    boiler = " ".join(f"w{i}" for i in range(20))
    near = " ".join(f"w{i}" for i in range(19)) + " zz"  # 1-token edit
    index = _docs(spark, [(1, boiler), (2, "totally different index text here")])
    new = _docs(
        spark,
        [
            (10, boiler),  # exact dup of index doc 1
            (11, near),  # near dup of index doc 1
            (12, "unique fresh content nothing shared"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.incremental_dedup(new, index, threshold=0.5).collect()
    }
    assert out[10]["is_exact_dup"] and not out[10]["kept"]
    assert not out[11]["is_exact_dup"]
    assert out[11]["n_dups"] >= 1 and not out[11]["kept"]
    assert out[12]["kept"] and out[12]["n_candidates"] == 0


def test_incremental_dedup_new_docs_not_compared_to_each_other(spark):
    """Two identical NEW docs with no index counterpart must BOTH be
    kept — the incremental contract compares new-vs-index only (the
    in-batch pair belongs to the self-join family)."""
    dup = "same new document text repeated verbatim across the batch"
    index = _docs(spark, [(1, "an unrelated index document")])
    new = _docs(spark, [(10, dup), (11, dup)])
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.incremental_dedup(new, index).collect()
    }
    assert out[10]["kept"] and out[11]["kept"]
    assert out[10]["n_candidates"] == 0


def test_incremental_dedup_tolerates_colliding_id_spaces(spark):
    """Each crawl batch numbers its own ids from 1, so new and index
    ids collide routinely — verification must resolve new ids against
    new_docs and index ids against index_docs (a union-keyed join
    would duplicate pairs and attach the wrong side's shingles)."""
    boiler = " ".join(f"w{i}" for i in range(20))
    near = " ".join(f"w{i}" for i in range(19)) + " zz"
    # index id 1 is UNRELATED text; new id 1 near-dups index id 2
    index = _docs(spark, [(1, "index one entirely unrelated words"), (2, boiler)])
    new = _docs(spark, [(1, near), (2, "fresh unique new content here")])
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.incremental_dedup(new, index, threshold=0.5).collect()
    }
    assert not out[1]["is_exact_dup"]
    assert out[1]["n_candidates"] == 1  # exactly index doc 2, once
    assert out[1]["n_dups"] == 1 and not out[1]["kept"]
    assert out[2]["kept"] and out[2]["n_candidates"] == 0


def test_incremental_dedup_every_new_doc_reported(spark):
    index = _docs(spark, [(1, "index doc one"), (2, "index doc two")])
    new = _docs(spark, [(10, "index doc one"), (11, "something else entirely")])
    out = dedup.incremental_dedup(new, index)
    assert sorted(r["doc_id"] for r in out.collect()) == [10, 11]


def test_cluster_balanced_sample_deterministic_and_subset(spark):
    from firewatch_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, k=4)
    cells = similarity.ivf_assign(emb, cents).select("vec_id", "centroid_id")
    kept1 = sorted(
        r["vec_id"]
        for r in sampling.rebalance_groups(
            cells, strata_col="centroid_id", id_col="vec_id", salt="cellbal"
        ).collect()
    )
    kept2 = sorted(
        r["vec_id"]
        for r in sampling.rebalance_groups(
            cells, strata_col="centroid_id", id_col="vec_id", salt="cellbal"
        ).collect()
    )
    assert kept1 == kept2  # content-stable, no RNG state
    all_ids = {r["vec_id"] for r in cells.collect()}
    assert set(kept1) <= all_ids and kept1


def _py_incremental_dedup(new_docs, index_docs, num_hashes=12, bands=4,
                          shingle_n=3, threshold=0.5, max_bucket=4):
    """Independent pure-Python mirror of dedup.incremental_dedup."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()

    def shingle_set(text):
        toks = text.split(" ")
        if len(toks) >= shingle_n:
            sh = [" ".join(toks[i:i + shingle_n]) for i in range(len(toks) - shingle_n + 1)]
        else:
            sh = [" ".join(toks)]
        return sh

    def banded(docs):
        rows = num_hashes // bands
        buckets = {}
        for doc_id, text in docs:
            sh = shingle_set(text)
            sig = [min(md5(f"{j}|{s}") for s in sh) for j in range(num_hashes)]
            for b in range(bands):
                bh = md5("|".join(sig[b * rows + r] for r in range(rows)))
                buckets.setdefault((b, bh), []).append(doc_id)
        return {
            k: sorted(v)[:max_bucket] for k, v in buckets.items()
        }

    bn, bi = banded(new_docs), banded(index_docs)
    cand = set()
    for k, new_ids in bn.items():
        for a in new_ids:
            for b in bi.get(k, []):
                cand.add((a, b))
    texts = dict(new_docs) | dict(index_docs)
    per_new = {}
    for a, b in cand:
        sa, sb = set(shingle_set(texts[a])), set(shingle_set(texts[b]))
        jac = len(sa & sb) / (len(sa) + len(sb) - len(sa & sb))
        n_c, n_d = per_new.get(a, (0, 0))
        per_new[a] = (n_c + 1, n_d + (1 if jac >= threshold else 0))
    idx_md5 = {md5(t) for _, t in index_docs}
    out = {}
    for doc_id, text in new_docs:
        exact = md5(text) in idx_md5
        n_c, n_d = per_new.get(doc_id, (0, 0))
        out[doc_id] = (exact, n_c, n_d, not exact and n_d == 0)
    return out


@pytest.mark.parametrize("seed", [7, 21])
def test_incremental_dedup_fuzz_vs_python_reference(spark, seed):
    """Random small-vocab corpora (natural exact + near dups) through
    the Spark operator vs the independent Python mirror — signatures,
    band hashes, bucket caps (tightened to 4 to exercise the cap
    path), verification and the keep verdict must all agree."""
    import random

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

    def mk_docs(start_id, n):
        return [
            (start_id + i,
             " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 8))))
            for i in range(n)
        ]

    index_docs = mk_docs(0, 30)
    new_docs = mk_docs(100, 15)
    expect = _py_incremental_dedup(new_docs, index_docs)

    idx_df = spark.createDataFrame(index_docs, ["doc_id", "text"])
    new_df = spark.createDataFrame(new_docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["is_exact_dup"], r["n_candidates"], r["n_dups"], r["kept"])
        for r in dedup.incremental_dedup(new_df, idx_df, max_bucket=4).collect()
    }
    assert got == expect


def test_dup_ngram_coverage_union_arithmetic(spark):
    """Hand-built corpus pinning the interval-union math: overlapping
    duplicated windows must not double-count positions, clean docs and
    too-short docs report zero."""
    shared = " ".join(f"w{i}" for i in range(6))  # a duplicated 6-token run
    docs = [
        (1, shared + " unique_a tail_a1 tail_a2"),
        (2, shared + " unique_b tail_b1 tail_b2"),
        (3, "totally clean document with distinct words here ok"),
        (4, "short doc"),  # < gram_n tokens: no window at all
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.with_dup_ngram_coverage(df, gram_n=4).collect()
    }
    # docs 1/2: 4-grams at starts 1,2,3 of the shared run are
    # duplicated (starts 4+ mix in unique words) → union covers
    # positions 1..6 exactly — overlapping windows counted once
    for d in (1, 2):
        assert out[d]["n_dup_positions"] == 6, out[d]
        assert out[d]["dup_frac"] == 6 / 9
    assert out[3]["n_dup_positions"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[4]["n_dup_positions"] == 0


@pytest.mark.parametrize("seed", [3, 11])
def test_dup_ngram_coverage_fuzz_vs_python_reference(spark, seed):
    """Random small-vocab corpora (plenty of natural window collisions)
    through the Spark operator vs an independent Python mirror —
    duplication detection and interval-union lengths must agree."""
    import random

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d"]
    gram_n = 3
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(40)
    ]

    from collections import Counter

    counts = Counter()
    windows = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        ws = [
            (s, tuple(toks[s:s + gram_n]))
            for s in range(0, max(len(toks) - gram_n + 1, 0))
        ]
        windows[doc_id] = ws
        counts.update(g for _, g in ws)
    expect = {}
    for doc_id, text in docs:
        covered = set()
        for s, g in windows[doc_id]:
            if counts[g] > 1:
                covered.update(range(s, s + gram_n))
        expect[doc_id] = (len(text.split(" ")), len(covered))

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_positions"])
        for r in dedup.with_dup_ngram_coverage(df, gram_n=gram_n).collect()
    }
    assert got == expect


def _py_bpe_round(docs):
    """Independent Python mirror of text.bpe_merge_round: corpus-argmax
    adjacent pair + the sequential greedy left-to-right apply rule."""
    from collections import Counter

    cnt = Counter()
    for _, t in docs:
        toks = t.split(" ")
        cnt.update(zip(toks, toks[1:]))
    top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    out = {}
    for doc_id, t in docs:
        toks = t.split(" ")
        new, i, m = [], 0, 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i], toks[i + 1]) == top:
                new.append(toks[i] + "_" + toks[i + 1])
                i += 2
                m += 1
            else:
                new.append(toks[i])
                i += 1
        out[doc_id] = (m, " ".join(new))
    return out


@pytest.mark.parametrize("seed", [5, 17])
def test_bpe_merge_round_fuzz_vs_python_reference(spark, seed):
    """The gaps-and-islands parity rule must equal the sequential
    greedy left-to-right BPE apply on random small-vocab corpora
    (overlapping runs like 'a a a a' included by construction)."""
    import random

    rng = random.Random(seed)
    vocab = ["a", "b", "c"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10))))
        for i in range(50)
    ]
    expect = _py_bpe_round(docs)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_merges"], r["new_text"])
        for r in text.bpe_merge_round(df).collect()
    }
    assert got == expect


def test_bpe_merge_iterates_like_sequential_bpe(spark):
    """Three rounds of the distributed merge (re-applied to new_text)
    must equal three rounds of the Python reference — the K-round
    tokenizer-induction loop composes."""
    docs = [
        (1, "x y x y x y z"),
        (2, "x y q x y"),
        (3, "z z z z z"),
    ]
    py = {d: t for d, t in docs}
    for _ in range(3):
        res = _py_bpe_round(list(py.items()))
        py = {d: t for d, (_, t) in res.items()}

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for _ in range(3):
        df = text.bpe_merge_round(df).select(
            "doc_id", F.col("new_text").alias("text")
        )
    got = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got == py


def test_corpus_shuffle_is_dense_global_rank(spark):
    """The two-phase (bucket offsets + local rank) position must equal
    the one-task global row_number over the same key — a dense 1..N
    permutation — and be invariant to input layout."""
    import hashlib

    ids = list(range(1, 301))
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = {r["doc_id"]: r["shuffle_pos"] for r in sampling.corpus_shuffle(df).collect()}
    expect_order = sorted(
        ids, key=lambda i: (hashlib.md5(f"shuf|{i}".encode()).hexdigest(), i)
    )
    expect = {i: pos + 1 for pos, i in enumerate(expect_order)}
    assert out == expect
    out2 = {
        r["doc_id"]: r["shuffle_pos"]
        for r in sampling.corpus_shuffle(df.repartition(7)).collect()
    }
    assert out2 == expect


def test_write_training_shards_contiguous_and_ordered(spark, tmp_path):
    """Each shard partition must hold exactly its contiguous position
    range, internally ordered — the contract a data loader maps
    workers onto."""
    df = spark.createDataFrame([(i,) for i in range(1, 121)], ["doc_id"])
    shuffled = sampling.corpus_shuffle(df)
    out = str(tmp_path / "shards")
    n = sampling.write_training_shards(shuffled, out, shard_size=50)
    assert n == 3  # 120 positions / 50 → shards 0,1,2
    back = spark.read.parquet(out)
    got = {
        r["shard"]: sorted(x["shuffle_pos"] for x in back.filter(back.shard == r["shard"]).collect())
        for r in back.select("shard").distinct().collect()
    }
    assert got[0] == list(range(1, 51))
    assert got[1] == list(range(51, 101))
    assert got[2] == list(range(101, 121))
    # physical in-file order (read WITHOUT sorting): the writer's own
    # sort must have ordered each shard by position
    import glob as _glob

    import pyarrow.parquet as pq

    for shard_dir in _glob.glob(str(tmp_path / "shards" / "shard=*")):
        pos = []
        for f in sorted(_glob.glob(f"{shard_dir}/*.parquet")):
            pos.extend(pq.read_table(f).column("shuffle_pos").to_pylist())
        assert pos == sorted(pos), shard_dir


def test_embedding_gram_drives_numpy_pca(spark, sf_dir):
    """The distributed gram query must reproduce numpy's covariance of
    the same scaled vectors, and its tiny driver-side result must be
    eigen-solvable — the full aggregate-huge/solve-tiny PCA loop."""
    import math

    import numpy as np

    from firewatch_spark.queries import registry

    rows = registry()["embedding_gram"].fn(spark, sf_dir).collect()
    d = 64
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"] - 1, r["j"] - 1] = C[r["j"] - 1, r["i"] - 1] = r["cov"]

    vecs = [
        r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ]
    X = np.array([[math.floor(float(x) * 1e6) for x in v] for v in vecs], dtype=float)
    mu = X.mean(axis=0)
    Cref = X.T @ X / len(X) - np.outer(mu, mu)
    assert np.allclose(C, Cref, rtol=1e-9, atol=1e-3)

    w, V = np.linalg.eigh(C)
    # a valid eigh of a real covariance: non-negative spectrum (up to
    # fp noise) and C v = w v for the principal direction
    assert w[-1] > 0 and w[0] > -1e-3 * w[-1]
    assert np.allclose(C @ V[:, -1], w[-1] * V[:, -1], rtol=1e-6, atol=1e-3)


def test_embedding_gram_fails_loudly_on_dim_drift(spark, tmp_path):
    """A corpus whose embedding dim != 64 must raise, not NULL-poison
    the covariance (out-of-range element_at returns NULL and the DuckDB
    oracle mirrors the bug, so the hash gate can't catch it —
    ADVICE r5)."""
    import pytest

    from firewatch_spark.queries import registry

    bad = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3], 0)], "vec_id long, embedding array<float>, label int"
    )
    bad.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    with pytest.raises(Exception, match="embedding_gram: embedding dim 3"):
        registry()["embedding_gram"].fn(spark, str(tmp_path)).collect()


def test_mixture_pivot_totals(spark, sf_dir):
    from firewatch_spark.queries import registry

    out = registry()["mixture_pivot"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = docs.groupBy("source").count().collect()
    totals = {r["source"]: r["n_total"] for r in out}
    for r in expect:
        assert totals[r["source"]] == r["count"]


def test_bpe_merge_k_matches_python_three_rounds(spark):
    """bpe_merge_k (the packaged K-round loop, VERDICT r5 #5) must
    equal K sequential Python BPE rounds — total merges included."""
    docs = [
        (1, "x y x y x y z"),
        (2, "x y q x y"),
        (3, "z z z z z"),
        (4, "q"),
    ]
    py = {d: t for d, t in docs}
    total = {d: 0 for d, _ in docs}
    for _ in range(3):
        res = _py_bpe_round(list(py.items()))
        py = {d: t for d, (_, t) in res.items()}
        for d, (m, _) in res.items():
            total[d] += m

    from firewatch_spark.operators import text as text_ops

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_merges"], r["new_text"])
        for r in text_ops.bpe_merge_k(df, k=3).collect()
    }
    assert got == {d: (total[d], py[d]) for d, _ in docs}


def test_incremental_dedup_indexed_equals_stateless(spark, sf_dir):
    """The precomputed-index form must return bit-identical answers to
    the stateless form when the index is built from the same corpus
    with the same parameters (VERDICT r5 #4)."""
    from firewatch_spark.operators import sampling as sampling_ops
    from firewatch_spark.queries import _INCR_FRAC, _INCR_THRESHOLD, _tbl

    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "text")
    u = docs.withColumn("_u", sampling_ops._hash_uniform("doc_id", "incr"))
    idx_docs = u.filter(F.col("_u") < _INCR_FRAC).drop("_u")
    new = u.filter(F.col("_u") >= _INCR_FRAC).drop("_u")

    stateless = {
        r["doc_id"]: (r["is_exact_dup"], r["n_candidates"], r["n_dups"], r["kept"])
        for r in dedup.incremental_dedup(
            new, idx_docs, threshold=_INCR_THRESHOLD
        ).collect()
    }
    index = dedup.build_dedup_index(idx_docs)
    indexed = {
        r["doc_id"]: (r["is_exact_dup"], r["n_candidates"], r["n_dups"], r["kept"])
        for r in dedup.incremental_dedup_indexed(
            new, index, idx_docs, threshold=_INCR_THRESHOLD
        ).collect()
    }
    assert indexed == stateless and len(indexed) > 0


def test_build_dedup_index_carries_md5_of_cap_evicted_docs(spark):
    """Round-6 review (confirmed by live repro): a doc evicted from
    EVERY band bucket by the per-bucket cap must still contribute its
    content_md5 to the stored index — otherwise the indexed form misses
    exact duplicates the stateless form catches.  Cyclic-rotation texts
    share a shingle SET (hence minhash signature and band buckets) while
    having different md5s, which constructs the eviction."""
    t1 = "x y z x y z"
    t2 = "y z x y z x"  # same 3-shingle set as t1, different md5
    idx_docs = spark.createDataFrame(
        [(1, t1), (2, t1), (3, t2)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(100, t2)], "doc_id long, text string")

    stateless = dedup.incremental_dedup(new, idx_docs, max_bucket=2).collect()
    assert stateless[0]["is_exact_dup"] is True

    index = dedup.build_dedup_index(idx_docs, max_bucket=2)
    # doc 3 must be cap-evicted from every band bucket (ids 1,2 fill
    # them) — the carrier row is its ONLY presence in the index
    band_ids = {
        r["doc_id"] for r in index.filter(F.col("band_idx") >= 0).collect()
    }
    assert 3 not in band_ids
    indexed = dedup.incremental_dedup_indexed(
        new, index, idx_docs, max_bucket=2
    ).collect()
    assert indexed[0]["is_exact_dup"] is True
    assert [tuple(r) for r in indexed] == [tuple(r) for r in stateless]


def test_incremental_dedup_indexed_cap_new_false_is_batch_invariant(spark):
    """cap_new=False (the streamed form's setting) must make per-doc
    verdicts independent of how the new set is batched: splitting the
    new docs into singleton batches and unioning the outputs equals the
    whole-set run even when a new-side bucket exceeds the cap — while
    cap_new=True provably could not (the whole-set cap keeps fewer
    survivors than per-batch caps)."""
    t = "a b c a b c"
    idx_docs = spark.createDataFrame([(1, t)], "doc_id long, text string")
    index = dedup.build_dedup_index(idx_docs, max_bucket=2)
    # 4 new docs, all in the same new-side bucket, cap 2 would bind
    new_rows = [(10, t), (11, t), (12, t), (13, t)]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    whole = {
        r["doc_id"]: tuple(r)
        for r in dedup.incremental_dedup_indexed(
            new, index, idx_docs, max_bucket=2, cap_new=False
        ).collect()
    }
    per_batch = {}
    for row in new_rows:
        single = spark.createDataFrame([row], "doc_id long, text string")
        for r in dedup.incremental_dedup_indexed(
            single, index, idx_docs, max_bucket=2, cap_new=False
        ).collect():
            per_batch[r["doc_id"]] = tuple(r)
    assert per_batch == whole
    # every new doc sees the index candidate — nothing was cap-evicted
    assert all(v[2] >= 1 for v in whole.values())


def test_token_budget_cap_equals_naive_window(spark):
    """The two-phase (bucket offsets + local running sums) cumulative
    token count must keep EXACTLY the docs the naive one-task-per-source
    running-sum window keeps — including the boundary doc that crosses
    the budget (kept: its preceding cumulative is still under) — and be
    invariant to input layout."""
    import hashlib

    import random

    rng = random.Random(11)
    rows = [
        (i, f"s{i % 3}", " ".join("w" for _ in range(rng.randint(1, 30))))
        for i in range(1, 201)
    ]
    budget = 300

    # naive Python reference
    def key(i):
        return hashlib.md5(f"tb|{i}".encode()).hexdigest()

    expect = set()
    for src in {r[1] for r in rows}:
        cum = 0
        for i, s, t in sorted(
            (r for r in rows if r[1] == src), key=lambda r: (key(r[0]), r[0])
        ):
            if cum < budget:
                expect.add(i)
            cum += len(t.split(" "))

    for nparts in (1, 7):
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"]).repartition(
            nparts
        )
        got = {
            r["doc_id"]
            for r in sampling.token_budget_cap(
                df, budget=budget, strata_col="source"
            ).collect()
        }
        assert got == expect, nparts


def test_bloom_prefilter_preserves_verdicts_at_any_size(spark, sf_dir):
    """VERDICT r6 #3: the partitioned-Bloom prefilter must be a pure
    prefilter — bit-identical verdicts with it off, with a roomy
    filter, AND with a deliberately saturated 2-bit filter (pure
    false-positive regime: everything passes, nothing breaks)."""
    from firewatch_spark.operators import sampling as sampling_ops
    from firewatch_spark.queries import _INCR_FRAC, _INCR_THRESHOLD, _tbl

    docs = _tbl(spark, sf_dir, "documents").select("doc_id", "text")
    u = docs.withColumn("_u", sampling_ops._hash_uniform("doc_id", "incr"))
    idx_docs = u.filter(F.col("_u") < _INCR_FRAC).drop("_u")
    new = u.filter(F.col("_u") >= _INCR_FRAC).drop("_u")
    index = dedup.build_dedup_index(idx_docs)

    def run(**kw):
        return {
            r["doc_id"]: tuple(r)
            for r in dedup.incremental_dedup_indexed(
                new, index, idx_docs, threshold=_INCR_THRESHOLD, **kw
            ).collect()
        }

    base = run()
    assert len(base) > 0
    assert run(bloom_m=1 << 16) == base
    assert run(bloom_m=2, bloom_k=2) == base  # saturated: all-pass FP regime


def test_bloom_prefilter_no_false_negatives_and_reduces_rows(spark):
    """Membership superset property (a key present in the index ALWAYS
    survives — Bloom has no false negatives) plus the point of the
    prefilter: banded rows of novel docs mostly vanish before the
    candidate join."""
    idx_docs = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}") for i in range(20)],
        "doc_id long, text string",
    )
    # new side: 20 docs copied from the index (must all survive) + 80
    # novel docs sharing nothing with it
    new_docs = spark.createDataFrame(
        [(100 + i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}") for i in range(20)]
        + [(200 + i, f"nov{i}a nov{i}b nov{i}c nov{i}d nov{i}e") for i in range(80)],
        "doc_id long, text string",
    )
    index = dedup.build_dedup_index(idx_docs)
    new_banded = dedup.banded_capped(
        dedup.with_minhash_signature(new_docs, "text", 12, 3),
        "doc_id", 12, 4, dedup.MAX_BUCKET, keep_sig=False,
    ).select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
    m, k = 1 << 16, 2
    surv = dedup.bloom_prefilter_bands(
        new_banded, dedup.band_bloom_bits(index, m, k), m, k
    )
    n_before, n_after = new_banded.count(), surv.count()
    surv_ids = {r["doc_a"] for r in surv.select("doc_a").distinct().collect()}
    # every index-duplicate doc's bands survive in full
    assert set(range(100, 120)) <= surv_ids
    # the novel docs' bands are (almost) all dropped: ≥60% row reduction
    assert n_after <= n_before * 0.4, (n_before, n_after)


def test_bpe_vocab_induction_stop_rules(spark):
    """VERDICT r6 #8: the induction loop must stop on each rule —
    vocab target already met (0 rounds, text unchanged), min_freq
    binding (no pair repeats enough), and otherwise equal the fixed-K
    loop while the target hasn't bound."""
    from firewatch_spark.operators import text as text_ops

    docs = [(1, "a b a b c d"), (2, "a b e f a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = text_ops.corpus_vocab_size(df)  # a b c d e f -> 6

    # target already met -> no rounds, passthrough
    got0 = {r["doc_id"]: (r["n_merges"], r["new_text"])
            for r in text_ops.bpe_vocab_induction(df, vocab_target=base).collect()}
    assert got0 == {1: (0, "a b a b c d"), 2: (0, "a b e f a b")}

    # min_freq binds after round 1: 'a b' (4x) merges, after which no
    # pair occurs 3+ times -> exactly the K=1 result despite room to grow
    got1 = {r["doc_id"]: (r["n_merges"], r["new_text"])
            for r in text_ops.bpe_vocab_induction(
                df, vocab_target=base + 5, min_freq=3, max_rounds=5
            ).collect()}
    k1 = {r["doc_id"]: (r["n_merges"], r["new_text"])
          for r in text_ops.bpe_merge_k(df, k=1).collect()}
    assert got1 == k1
    assert got1[1][1] == "a_b a_b c d"

    # unconstrained (huge target, min_freq 1): equals the fixed-K loop
    got3 = {r["doc_id"]: (r["n_merges"], r["new_text"])
            for r in text_ops.bpe_vocab_induction(
                df, vocab_target=10_000, min_freq=1, max_rounds=3
            ).collect()}
    k3 = {r["doc_id"]: (r["n_merges"], r["new_text"])
          for r in text_ops.bpe_merge_k(df, k=3).collect()}
    assert got3 == k3


def test_bpe_apply_uses_trained_ranks_not_recounts(spark):
    """The apply half must replay the TRAINED merge priorities, not
    re-argmax the merged corpus: after merging (x,y), the trained
    rank-2 pair (y,z) no longer occurs — apply merges nothing in round
    2, while the retraining loop (bpe_merge_k) merges (x_y,z)."""
    from firewatch_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "x y z x y z x y z")], "doc_id long, text string"
    )
    merges = text_ops.top_adjacent_pairs(df, 2)
    assert merges == [("x", "y"), ("y", "z")]

    applied = text_ops.bpe_apply(df, merges).collect()[0]
    assert applied["n_merges"] == 3
    assert applied["new_text"] == "x_y z x_y z x_y z"

    retrained = text_ops.bpe_merge_k(df, k=2).collect()[0]
    assert retrained["n_merges"] == 6
    assert retrained["new_text"] == "x_y_z x_y_z x_y_z"


def test_bpe_merge_round_carry_passthrough(spark):
    """r13: the K-round loops ride their accumulator THROUGH the merge
    round (carry=...) instead of joining it back per round — the carry
    column must arrive unchanged next to the merge results, and the
    merge results must be identical to the no-carry call."""
    docs = [(1, "a a a a", 7), (2, "b c b c", 11), (3, "z", 0)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "_acc"])
    top = spark.createDataFrame(
        [("a", "a")], "pair_left string, pair_right string"
    )
    out = {
        r["doc_id"]: (r["n_merges"], r["new_text"], r["_acc"])
        for r in text.bpe_merge_round(df, top=top, carry=("_acc",)).collect()
    }
    assert out == {
        1: (2, "a_a a_a", 7),
        2: (0, "b c b c", 11),
        3: (0, "z", 0),
    }
    plain = {
        r["doc_id"]: (r["n_merges"], r["new_text"])
        for r in text.bpe_merge_round(
            df.select("doc_id", "text"), top=top
        ).collect()
    }
    assert plain == {d: v[:2] for d, v in out.items()}
