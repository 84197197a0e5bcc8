"""Dedup (exact / MinHash-LSH / SimHash / Jaccard) and text-analysis
operator contracts on hand-built corpora."""

import pytest

from pyspark.sql import functions as F

from firewatch_spark.operators import dedup, text
from tests.conftest import rows

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog today"),      # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat today"),      # near dup of 1
    (4, "completely different words about spark query engines here"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_exact_dedup_groups_and_keeps_min_id(spark):
    out = rows(dedup.exact_dedup(_docs(spark)), "keep_doc_id")
    by_keep = {r["keep_doc_id"]: r["n_copies"] for r in out}
    assert by_keep == {1: 2, 3: 1, 4: 1}


def test_minhash_identical_docs_estimate_1(spark):
    pairs = rows(dedup.lsh_candidate_pairs(_docs(spark)), "doc_a", "doc_b")
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in pairs}
    # exact duplicates always collide in every band with estimate 1.0
    assert by_pair[(1, 2)]["est_jaccard"] == 1.0
    assert by_pair[(1, 2)]["n_common_minhash"] == 12
    # the unrelated doc never pairs with anything
    assert not any(4 in p for p in by_pair)


def test_minhash_near_dup_candidate_found(spark):
    # one changed word in a 20-word doc leaves the minimal shingle of
    # every salt untouched here -> the pair collides in every band
    # (deterministic for this fixed corpus; verified empirically)
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, base.replace("tau", "tav")),
         (3, "totally different content about nothing shared at all")],
        "doc_id long, text string",
    )
    pairs = rows(dedup.lsh_candidate_pairs(docs), "doc_a", "doc_b")
    found = {(r["doc_a"], r["doc_b"]): r["n_common_minhash"] for r in pairs}
    assert found == {(1, 2): 12}


def test_ngram_jaccard_exact_values(spark):
    docs = _docs(spark)
    out = rows(
        dedup.ngram_jaccard(docs, docs, F.col("a.doc_id") < F.col("b.doc_id")),
        "doc_a",
        "doc_b",
    )
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert by_pair[(1, 2)]["jaccard"] == 1.0
    # docs 1 and 3 differ in word 9 of 10 -> the 2 shingles covering it
    # differ; 6 of 8 shared, union 10
    j13 = by_pair[(1, 3)]
    assert (j13["n_inter"], j13["n_union"]) == (6, 10)
    assert j13["jaccard"] == 6 / 10
    assert by_pair[(1, 4)]["n_inter"] == 0


def test_simhash_identical_and_near(spark):
    out = {r["doc_id"]: r["simhash"] for r in rows(dedup.with_simhash(_docs(spark)))}
    assert out[1] == out[2]
    assert len(out[1]) == 64 and set(out[1]) <= {"0", "1"}
    # near-dup differs in few bits, unrelated differs in many
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(out[1], out[3]) < ham(out[1], out[4])


def test_simhash_near_pairs_bucketed(spark):
    out = rows(dedup.simhash_near_pairs(_docs(spark), max_hamming=10))
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert found[(1, 2)] == 0


def test_mega_bucket_identical_docs_linear(spark):
    # VERDICT r2 contract: a 10k-member duplicate bucket must complete
    # with bounded per-task rows.  The naive clique would be ~50M
    # pairs; the identical-sig collapse emits exactly n-1 star edges
    # to the min-id representative, est_jaccard 1.0.
    n = 10_000
    docs = spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog today").alias("text"),
    )
    out = dedup.lsh_candidate_pairs(docs)
    assert out.count() == n - 1
    agg = out.agg(
        F.min("doc_a"), F.max("doc_a"), F.min("est_jaccard"), F.min("n_common_minhash")
    ).first()
    assert tuple(agg) == (1, 1, 1.0, 12)


def test_mega_bucket_simhash_identical_docs_linear(spark):
    n = 10_000
    docs = spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog today").alias("text"),
    )
    out = dedup.simhash_near_pairs(docs)
    assert out.count() == n - 1
    assert out.agg(F.max("hamming"), F.max("doc_a")).first() == (0, 1)


def _tailed_corpus(spark, n=50):
    # long common body (band hashes collide) + unique tail (signatures
    # diverge for most docs) -> one large bucket of DISTINCT signatures
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
        "omega one two three four five six seven"
    )
    return spark.createDataFrame(
        [(i, f"{base} tail{i}") for i in range(1, n + 1)],
        "doc_id long, text string",
    )


def test_bucket_cap_bounds_distinct_sig_pairs(spark):
    docs = _tailed_corpus(spark)
    capped = rows(dedup.lsh_candidate_pairs(docs, max_bucket=4))
    uncapped = rows(dedup.lsh_candidate_pairs(docs, max_bucket=10_000))
    # star edges (identical sigs, est 1.0) are unaffected by the cap
    stars_c = [r for r in capped if r["est_jaccard"] == 1.0]
    stars_u = [r for r in uncapped if r["est_jaccard"] == 1.0]
    assert sorted((r["doc_a"], r["doc_b"]) for r in stars_c) == sorted(
        (r["doc_a"], r["doc_b"]) for r in stars_u
    )
    # the cap engages: distinct-sig pair expansion is hard-bounded by
    # bands * C(max_bucket, 2), and strictly below the uncapped count
    n_band_pairs = len(capped) - len(stars_c)
    assert n_band_pairs <= 4 * 6
    assert len(capped) < len(uncapped)
    # capped candidates are a subset of the uncapped ones
    assert {(r["doc_a"], r["doc_b"]) for r in capped} <= {
        (r["doc_a"], r["doc_b"]) for r in uncapped
    }


def test_bucket_cap_simhash(spark):
    docs = _tailed_corpus(spark)
    capped = rows(dedup.simhash_near_pairs(docs, max_hamming=64, max_bucket=4))
    uncapped = rows(dedup.simhash_near_pairs(docs, max_hamming=64, max_bucket=10_000))
    # unlike the minhash corpus (a handful of shared band-hash
    # buckets), distinct fingerprints scatter over many segment-value
    # buckets — the bound is per-bucket, so assert the cap ENGAGES
    # (strictly fewer pairs) and stays a subset of the uncapped result
    assert len(capped) < len(uncapped)
    assert {(r["doc_a"], r["doc_b"]) for r in capped} <= {
        (r["doc_a"], r["doc_b"]) for r in uncapped
    }


def test_repetition_stats_match_python(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, "q")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in rows(text.with_repetition_stats(docs))}
    # "a a a b": 4 tokens, 2 distinct -> dup 0.5; 2-grams [a a, a a, a b]
    # -> top 2/3; run of 'a' = 3
    assert out[1]["dup_token_frac"] == 0.5
    assert out[1]["top_ngram_frac"] == 2 / 3
    assert out[1]["max_run_len"] == 3
    # all-distinct doc: no repetition signals
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_ngram_frac"] == 0.5  # [x y, y z] -> 1/2
    assert out[2]["max_run_len"] == 1
    # single-token doc: degenerate but defined
    assert out[3]["dup_token_frac"] == 0.0
    assert out[3]["top_ngram_frac"] == 1.0
    assert out[3]["max_run_len"] == 1


def test_repetition_stats_fuzz_python_reference(spark):
    import random

    rng = random.Random(5)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in rows(text.with_repetition_stats(df))}
    for i, t in docs:
        toks = t.split(" ")
        grams = (
            [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
            if len(toks) >= 2
            else [" ".join(toks)]
        )
        top = max(grams.count(g) for g in set(grams))
        best = run = 1
        for a, b in zip(toks, toks[1:]):
            run = run + 1 if b == a else 1
            best = max(best, run)
        assert got[i]["dup_token_frac"] == 1.0 - len(set(toks)) / len(toks)
        assert got[i]["top_ngram_frac"] == top / len(grams)
        assert got[i]["max_run_len"] == best, (i, t)


def test_chunk_documents_budget_and_overlap(spark):
    doc = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    plain = rows(text.chunk_documents(df, max_tokens=4), "chunk_idx")
    assert [r["n_tokens"] for r in plain] == [4, 4, 2]
    # chunks reassemble the document exactly (overlap 0)
    assert " ".join(r["chunk"] for r in plain) == doc
    assert all(r["n_tokens"] <= 4 for r in plain)

    lap = rows(text.chunk_documents(df, max_tokens=4, overlap=1), "chunk_idx")
    # starts 1,4,7,10 -> the trailing 1-token chunk re-covers only
    # overlap and is dropped
    assert [r["chunk"].split(" ")[0] for r in lap] == ["t0", "t3", "t6"]
    assert [r["n_tokens"] for r in lap] == [4, 4, 4]
    # consecutive chunks share exactly `overlap` boundary tokens
    for a, b in zip(lap, lap[1:]):
        assert a["chunk"].split(" ")[-1] == b["chunk"].split(" ")[0]
    # every source token appears in at least one chunk
    covered = {t for r in lap for t in r["chunk"].split(" ")}
    assert covered == set(doc.split(" "))

    with pytest.raises(ValueError):
        text.chunk_documents(df, max_tokens=4, overlap=4)


def test_pack_chunks_greedy_matches_python(spark):
    import random

    rng = random.Random(9)
    rows_in = []
    for d in range(12):
        for i in range(rng.randint(1, 9)):
            rows_in.append((d, i, rng.randint(1, 7)))
    df = spark.createDataFrame(rows_in, "doc_id long, chunk_idx long, n_tokens long")
    got = {
        (r["doc_id"], r["chunk_idx"]): r["pack_id"]
        for r in rows(text.pack_chunks_per_doc(df, budget=10))
    }
    by_doc: dict = {}
    for d, i, n in rows_in:
        by_doc.setdefault(d, []).append((i, n))
    for d, cs in by_doc.items():
        acc, pid = 0, 0
        for i, n in sorted(cs):
            if acc + n > 10 and acc > 0:
                pid, acc = pid + 1, n
            else:
                acc += n
            assert got[(d, i)] == pid, (d, i)
    # every pack respects the budget unless a single chunk exceeds it
    sums: dict = {}
    singles: dict = {}
    for (d, i), p in got.items():
        n = next(n for dd, ii, n in rows_in if (dd, ii) == (d, i))
        sums[(d, p)] = sums.get((d, p), 0) + n
        singles[(d, p)] = max(singles.get((d, p), 0), n)
    for k, s in sums.items():
        assert s <= 10 or singles[k] == s


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "the cat sat on the mat")], "doc_id long, text string")
    out = rows(text.with_token_stats(df))[0]
    assert out["n_tokens"] == 6
    assert out["n_chars"] == 22
    assert out["n_stopwords"] == 2  # 'the' twice
    assert out["avg_token_len"] == (22 - 5) / 6
    assert out["stopword_ratio"] == 2 / 6


def test_lang_id_deterministic_argmax(spark):
    df = spark.createDataFrame(
        [
            (1, "the fast fox and a slow dog"),        # en profile hits
            (2, "data table row column data table"),   # es profile hits
            (3, "zzz yyy xxx"),                        # no hits -> first lang wins
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["predicted_lang"] for r in rows(text.with_lang_id(df))}
    assert out[1] == "en" and out[2] == "es" and out[3] == "en"


def test_fingerprint_stable_under_identity(spark):
    out = {r["doc_id"]: r for r in rows(text.with_fingerprint(_docs(spark)))}
    assert out[1]["content_md5"] == out[2]["content_md5"]
    assert out[1]["shingle_fp"] == out[2]["shingle_fp"]
    assert out[1]["content_md5"] != out[3]["content_md5"]


def test_lsh_bucket_cap_recall_cost(spark):
    """VERDICT r4 #4: measure what the MAX_BUCKET cap sacrifices on a
    boilerplate mega-bucket (the 100 TB skew shape the cap exists for:
    hundreds of near-identical docs sharing band hashes with DISTINCT
    signatures, so the tier-1 identical-sig collapse cannot absorb
    them).

    Ground truth = the uncapped candidate-pair set; recall(cap) = the
    fraction of it the capped run keeps.  The cap keeps each bucket's
    `cap` lowest ids, so a mega-bucket of m docs keeps ~C(cap,2)/C(m,2)
    of its pairs and drops the rest — the docs beyond the cap never
    become candidates AT ALL (their dedup is sacrificed, not deferred).
    That is the documented trade: bounded task memory and O(bands·cap²)
    pair cost per bucket, in exchange for recall loss INSIDE oversized
    boilerplate buckets only — pairs outside mega-buckets are untouched.
    """
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(500)]
    boiler = " ".join(f"b{i}" for i in range(24))
    corpus = [(d, f"{boiler} u{d}x u{d}y") for d in range(200)]
    corpus += [
        (200 + d, " ".join(rng.choice(vocab) for _ in range(26)))
        for d in range(100)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")

    def pair_set(cap):
        return {
            (r["doc_a"], r["doc_b"])
            for r in dedup.lsh_candidate_pairs(df, max_bucket=cap).collect()
        }

    truth = pair_set(10**9)
    # the fixture really is a mega-bucket: pairs ~ C(200, 2)
    assert len(truth) > 10_000

    recalls = {}
    for cap in (16, 64, 256):
        kept = pair_set(cap)
        assert kept <= truth  # the cap only ever drops pairs
        recalls[cap] = len(kept) / len(truth)

    # monotone in the cap, and a cap >= the largest bucket loses nothing
    assert recalls[16] <= recalls[64] <= recalls[256], recalls
    assert recalls[256] == 1.0, recalls
    # pinned cost of the shipped MAX_BUCKET=64 on a 200-doc
    # mega-bucket: ~half the in-bucket pairs survive (measured 0.495 —
    # md5-deterministic; the band allows for partition-count jitter),
    # and cap=16 keeps only ~3% — the cap/recall dial made concrete
    assert 0.45 <= recalls[64] <= 0.55, recalls
    assert recalls[16] <= 0.10, recalls


def test_cross_doc_packing_single_bucket_is_global_greedy(spark):
    """With ONE bucket the operator IS the sequential global greedy
    over (doc, idx) order — checked against a Python walk."""
    import random

    rng = random.Random(5)
    rows_in = []
    for d in range(15):
        for i in range(rng.randint(1, 4)):
            rows_in.append((d, i, rng.randint(1, 7)))
    df = spark.createDataFrame(
        rows_in, "doc_id long, chunk_idx long, n_tokens long"
    ).repartition(6)  # physical layout must not matter
    got = {
        (r["doc_id"], r["chunk_idx"]): r["pack_id"]
        for r in rows(text.pack_chunks_cross_doc(df, budget=10, num_buckets=1))
    }
    acc, cnt = 0, 0
    for d, i, n in sorted(rows_in):
        if acc > 0 and acc + n > 10:
            cnt, acc = cnt + 1, 0
        acc += n
        assert got[(d, i)] == cnt, (d, i)


def test_cross_doc_packing_bucketed_invariants(spark):
    """Multi-bucket mode: all of a doc's chunks share a bucket, packs
    never mix buckets, every pack respects the budget (single oversize
    chunks excepted), small docs DO share packs (the operator's reason
    to exist), and the assignment is deterministic under arbitrary
    input partitioning."""
    import random

    rng = random.Random(11)
    rows_in = [
        (d, i, rng.randint(1, 6))
        for d in range(40)
        for i in range(rng.randint(1, 3))
    ]
    df = spark.createDataFrame(
        rows_in, "doc_id long, chunk_idx long, n_tokens long"
    )
    budget, buckets = 12, 4

    def assign(src):
        return {
            (r["doc_id"], r["chunk_idx"]): r["pack_id"]
            for r in rows(
                text.pack_chunks_cross_doc(src, budget=budget, num_buckets=buckets)
            )
        }

    got = assign(df)
    assert got == assign(df.repartition(13))  # partitioning-invariant

    n_of = {(d, i): n for d, i, n in rows_in}
    doc_buckets: dict = {}
    pack_sums: dict = {}
    pack_docs: dict = {}
    for (d, i), p in got.items():
        doc_buckets.setdefault(d, set()).add(p >> 40)
        pack_sums[p] = pack_sums.get(p, 0) + n_of[(d, i)]
        pack_docs.setdefault(p, set()).add(d)
    assert all(len(b) == 1 for b in doc_buckets.values())
    oversize = {p for p, s in pack_sums.items() if len(
        [1 for (d, i), pp in got.items() if pp == p]) == 1 and s > budget}
    assert all(s <= budget for p, s in pack_sums.items() if p not in oversize)
    # cross-doc sharing actually happens
    assert any(len(ds) > 1 for ds in pack_docs.values())


def test_flag_contaminated_matching_path(spark):
    """The sf-table decontamination row is all-zeros (no dup straddles
    the benchmark modulus), so the MATCHING path is pinned here: a
    corpus doc that copies an 8-word benchmark span must flag with the
    right gram count; paraphrases and short docs must not."""
    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog every day")],
        "doc_id long, text string",
    )
    leaked = ("i copied this " +
              "the quick brown fox jumps over the lazy dog" +
              " into my training text")
    corpus = spark.createDataFrame(
        [
            (1, leaked),                                   # contains 2 bench 8-grams
            (2, "a fast brown fox leaps over one lazy dog every day here"),  # paraphrase
            (3, "too short to have grams"),                # < 8 tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in rows(text.flag_contaminated(corpus, bench, n=8))}
    # doc 3 is out of scope entirely (cannot 8-gram-collide)
    assert set(out) == {1, 2}
    # "the quick ... lazy dog" is 9 bench words -> 2 distinct 8-grams,
    # both present verbatim in doc 1
    assert out[1]["n_matched_grams"] == 2 and out[1]["contaminated"] == 1
    assert out[2]["n_matched_grams"] == 0 and out[2]["contaminated"] == 0


def test_image_phash_dedup_collapses_identical_payloads(spark):
    """VERDICT r6 #4: dHash image dedup — identical payloads must get
    identical 64-bit fingerprints and collapse to hamming-0 star edges
    via the shared hamming_band_pairs stage; distinct payloads get
    distinct (md5-seeded fake-grid) fingerprints."""
    from firewatch_spark.operators import dedup

    media = spark.createDataFrame(
        [(1, b"imgA"), (2, b"imgA"), (3, b"imgA"), (4, b"imgB"), (5, b"imgC")],
        "media_id long, payload binary",
    )
    ph = {r["media_id"]: r["phash"] for r in dedup.with_image_phash(media).collect()}
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in ph.values())
    assert ph[1] == ph[2] == ph[3]
    assert len({ph[1], ph[4], ph[5]}) == 3

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.image_phash_pairs(media).collect()
    }
    # star edges from the min-id rep; no cross-payload pair at hamming<=3
    assert pairs == {(1, 2): 0, (1, 3): 0}


def test_audio_fingerprint_dedup_collapses_identical_clips(spark):
    """The audio member of the multimodal dedup family: identical PCM
    payloads share a fingerprint and collapse to hamming-0 stars via
    the shared banding; clips shorter than two chunks have no contour
    and are EXCLUDED from pairing (ADVICE r7 #2: pairing them emitted
    every unrelated sub-second clip pair as a hamming-0 duplicate)."""
    from firewatch_spark.operators import dedup

    import struct

    def pcm(*amps_per_chunk):  # one 64-sample chunk per amplitude
        return b"".join(struct.pack("<64h", *([a] * 64)) for a in amps_per_chunk)

    rising = pcm(10, 100, 1000, 5000, 10000, 20000, 25000, 30000)
    # NOT a falling ramp: energy that never rises fingerprints as
    # all-zeros, same as the too-short clips — alternation gives a
    # genuinely distinct bit pattern
    alternating = pcm(10, 30000, 10, 30000, 10, 30000, 10, 30000)
    tiny1, tiny2 = b"\x01\x02", b"\x03\x04"  # 1 sample each: no contour
    media = spark.createDataFrame(
        [(1, rising), (2, rising), (3, alternating), (4, tiny1), (5, tiny2)],
        "media_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.audio_fingerprint_pairs(media).collect()
    }
    assert pairs[(1, 2)] == 0          # identical clips collapse
    # too-short clips never pair — with anything (ADVICE r7 #2)
    assert not any(4 in p or 5 in p for p in pairs)
    assert (1, 3) not in pairs or pairs[(1, 3)] > 0


def test_video_frame_dedup_jaccard_and_threshold(spark):
    """Frame-set semantics pinned: a video sharing 5 of 6 frames with
    another lands at jaccard 5/7; sharing 2 of 6 (jaccard 2/10) is cut
    by the 0.5 threshold; duplicate frames within one video collapse
    (set, not bag, semantics)."""
    from firewatch_spark.operators import dedup

    def frames(vid, payloads):
        return [(vid, p.encode()) for p in payloads]

    base = [f"f{i}" for i in range(6)]
    rows_in = (
        frames(1, base)
        + frames(2, base[:5] + ["ALTERED"])       # 5/7 with video 1
        + frames(3, base[:2] + [f"x{i}" for i in range(4)])  # 2/10 with 1
        + frames(4, [base[0]] * 3 + base[1:4])    # dup frames collapse -> 4 distinct
    )
    df = spark.createDataFrame(rows_in, "video_id long, payload binary")
    out = {
        (r["video_a"], r["video_b"]): r
        for r in dedup.video_frame_dedup(df).collect()
    }
    assert (1, 2) in out
    r12 = out[(1, 2)]
    assert (r12["n_shared"], r12["n_a"], r12["n_b"]) == (5, 6, 6)
    assert abs(r12["jaccard"] - 5 / 7) < 1e-12
    assert (1, 3) not in out  # 2/10 below threshold
    # video 4 has 4 DISTINCT frames, 4 shared with video 1 -> 4/(6+4-4)=2/3
    assert (1, 4) in out and out[(1, 4)]["n_b"] == 4
    assert abs(out[(1, 4)]["jaccard"] - 2 / 3) < 1e-12


def test_index_roll_cap_algebra_with_forced_eviction(spark):
    """cap(cap(A) ∪ B) == cap(A ∪ B) — the theorem that makes the
    incremental index roll exact.  Forced-eviction setup: identical
    texts share every band bucket; with max_bucket=2 the old index
    keeps ids {1,3} and EVICTS {5,7}; the batch brings id 0, which
    must displace 3 — and the rolled index must equal the full rebuild
    exactly, evicted ids staying evicted."""
    from firewatch_spark.operators import dedup

    text = "alpha beta gamma delta epsilon zeta eta theta"
    old = spark.createDataFrame([(i, text) for i in (1, 3, 5, 7)], ["doc_id", "text"])
    new = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    both = old.unionByName(new)

    idx_old = dedup.build_dedup_index(old, max_bucket=2)
    rolled = dedup.update_dedup_index(idx_old, new, max_bucket=2)
    rebuilt = dedup.build_dedup_index(both, max_bucket=2)

    key = lambda r: (r["doc_id"], r["band_idx"], r["band_hash"], r["content_md5"])
    assert sorted(map(key, rolled.collect())) == sorted(map(key, rebuilt.collect()))
    # the band buckets kept exactly {0, 1}: 0 displaced 3
    kept = {r["doc_id"] for r in rolled.collect() if r["band_idx"] >= 0}
    assert kept == {0, 1}
    # but every doc keeps its md5-carrier row (exact-dup coverage)
    carriers = {r["doc_id"] for r in rolled.collect() if r["band_idx"] < 0}
    assert carriers == {0, 1, 3, 5, 7}


def test_video_segment_dedup_distinguishes_reencode_from_stitch(spark):
    """The production distinction set overlap can't make: a re-encode
    (one altered frame) yields TWO aligned runs around the alteration;
    a stitched intro yields ONE run at the intro; a shifted clip
    (same frames, inserted lead-in) aligns at a NONZERO offset."""
    from firewatch_spark.operators import dedup

    def vid(vid_id, parts):
        return [(vid_id, i, p.encode()) for i, p in enumerate(parts)]

    base = [f"f{i}" for i in range(6)]
    reenc = base[:3] + ["ALTERED"] + base[4:]          # two runs: 3 + 2
    stitch = base[:3] + ["x3", "x4", "x5"]             # one run: 3
    shifted = ["lead"] + base[:5]                      # offset -1 run of 5
    frames = spark.createDataFrame(
        vid(1, base) + vid(2, reenc) + vid(3, stitch) + vid(4, shifted),
        "video_id long, frame_idx long, payload binary",
    )
    out = dedup.video_segment_dedup(frames)
    segs = {}
    for r in out.collect():
        segs.setdefault((r["video_a"], r["video_b"]), []).append(
            (r["align_offset"], r["start_a"], r["start_b"], r["run_len"])
        )
    assert sorted(segs[(1, 2)]) == [(0, 0, 0, 3), (0, 4, 4, 2)]
    assert segs[(1, 3)] == [(0, 0, 0, 3)]
    assert segs[(1, 4)] == [(-1, 0, 1, 5)]
    # re-encode vs stitch share the same intro run too (frames 0-2)
    assert segs[(2, 3)] == [(0, 0, 0, 3)]


def test_image_text_pair_dedup_two_round_policy(spark):
    """Sequential keeper rounds: dup_image drops caption variants of
    one image cluster, dup_caption drops repeated captions among the
    SURVIVORS — and a pair dropped in round 1 never suppresses a
    round-2 caption cluster (the sequential-vs-joint distinction)."""
    from firewatch_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [
            # image cluster A: pairs 1, 2 (same pixels, two captions)
            (1, "imgA", "cap1"),
            (2, "imgA", "cap2"),
            # caption cluster cap2: pair 3 has unique pixels but pair
            # 2's caption — pair 2 died in round 1, so pair 3 KEEPS
            # cap2 (sequential policy; a joint AND would drop both)
            (3, "imgB", "cap2"),
            # caption cluster cap3 among survivors: 4 keeps, 5 drops
            (4, "imgC", "cap3"),
            (5, "imgD", "cap3"),
            # both-fleet overlap: 6/7 same image, 7 also repeats cap1?
            (6, "imgE", "cap6"),
            (7, "imgE", "cap7"),
        ],
        "pair_id long, image_key string, caption_key string",
    )
    out = {r["pair_id"]: r["status"] for r in D.image_text_pair_dedup(pairs).collect()}
    assert out == {
        1: "kept",
        2: "dup_image",
        3: "kept",
        4: "kept",
        5: "dup_caption",
        6: "kept",
        7: "dup_image",
    }


def test_corpus_overlap_kmv_exact_when_k_covers_union(spark):
    # shingle_n=3: 'a b c d' -> shingles {'a b c', 'b c d'}
    docs = [
        ("A", 1, "a b c d"),        # {abc, bcd}
        ("A", 2, "a b c"),          # {abc}     (dup shingle, distinct-collapsed)
        ("B", 3, "b c d e"),        # {bcd, cde}
        ("C", 4, "x y z"),          # {xyz} — disjoint from A and B
    ]
    df = spark.createDataFrame(docs, "source string, doc_id long, text string")
    out = {
        (r["src_a"], r["src_b"]): r
        for r in rows(dedup.corpus_overlap_kmv(df, k=64), "src_a", "src_b")
    }
    ab = out[("A", "B")]
    # A = {abc, bcd}, B = {bcd, cde}: inter 1, union 3 -> 1/3
    assert ab["n_a"] == 2 and ab["n_b"] == 2 and ab["n_exact_inter"] == 1
    assert ab["k_eff"] == 3 and ab["n_common_sig"] == 1
    # k >= |union| -> the sketch IS the union: est == exact, err == 0
    assert ab["est_jaccard"] == ab["exact_jaccard"] == pytest.approx(1 / 3)
    assert ab["est_abs_err"] == 0.0
    ac = out[("A", "C")]
    assert ac["n_common_sig"] == 0 and ac["est_jaccard"] == 0.0
    assert ac["n_exact_inter"] == 0 and ac["exact_jaccard"] == 0.0


def test_corpus_overlap_kmv_two_phase_equals_global_bottom_k(spark):
    # many shingles, tiny k: the bucketed phase-1 window must not
    # change the global bottom-k result. Python-reference the whole
    # estimator at k=4.
    import hashlib

    docs = [
        ("A", i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(6)
    ] + [
        ("B", 100 + i, " ".join(f"w{i}x{j}" for j in range(6, 18)))
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "source string, doc_id long, text string")
    k = 4
    got = rows(dedup.corpus_overlap_kmv(df, k=k), "src_a", "src_b")[0]

    def shset(rows_):
        s = set()
        for _, _, t in rows_:
            ts = t.split(" ")
            for i in range(len(ts) - 2):
                s.add(hashlib.md5(" ".join(ts[i : i + 3]).encode()).hexdigest())
        return s

    a = shset(d for d in docs if d[0] == "A")
    b = shset(d for d in docs if d[0] == "B")
    union_bottom = sorted(a | b)[:k]
    want_common = sum(1 for h in union_bottom if h in a and h in b)
    assert got["k_eff"] == k
    assert got["n_common_sig"] == want_common
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["n_exact_inter"] == len(a & b)


def test_lsh_band_plan_matches_python_reference(spark):
    import math

    sims = [0.1] * 50 + [0.3] * 20 + [0.85] * 10 + [0.95] * 5
    df = spark.createDataFrame([(s,) for s in sims], "jaccard double")
    out = rows(dedup.lsh_band_plan(df, n_hashes=16), "rank")

    # python reference (same fold-multiply + floor-scale arithmetic)
    bins = {}
    for s in sims:
        b = min(int(s * 20), 19)
        bins[b] = bins.get(b, 0) + 1
    grid = [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]
    expect = []
    for nb, r in grid:
        fp = fn = 0
        for b, w in bins.items():
            s_mid = (2 * b + 1) / 40.0
            sr = 1.0
            for _ in range(r):
                sr *= s_mid
            miss = 1.0
            for _ in range(nb):
                miss *= 1.0 - sr
            p_scaled = math.floor((1.0 - miss) * 1_000_000_000)
            if s_mid < 0.8:
                fp += w * p_scaled
            else:
                fn += w * (1_000_000_000 - p_scaled)
        expect.append((nb, r, fp, fn))
    expect.sort(key=lambda x: (x[2] + x[3], x[0]))
    got = [
        (r["n_bands"], r["rows_per_band"], r["fp_mass_scaled"], r["fn_mass_scaled"])
        for r in out
    ]
    assert got == expect
    assert out[0]["chosen"] and not out[1]["chosen"]
    assert all(r["n_pairs"] == len(sims) for r in out)
    # sanity: 1 row/band merges everything (max fp), 16 rows/band
    # merges nothing (max fn)
    by_r = {r["rows_per_band"]: r for r in out}
    assert by_r[1]["fp_mass_scaled"] == max(r["fp_mass_scaled"] for r in out)
    assert by_r[16]["fn_mass_scaled"] == max(r["fn_mass_scaled"] for r in out)


def test_line_dedup_keeps_global_first_and_reassembles(spark):
    docs = [
        (1, "alpha one.\nshared boilerplate line.\nbeta two."),
        (2, "shared boilerplate line.\ngamma three.\nshared boilerplate line."),
        (3, "shared boilerplate line."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in rows(dedup.line_dedup(df), "doc_id")}

    # doc 1 owns the first occurrence of the shared line
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == docs[0][1]
    # doc 2 loses BOTH copies (cross-doc and its own in-doc repeat)
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "gamma three."
    # doc 3 loses its only line -> empty reassembly
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""


def test_line_dedup_null_text_keeps_doc_row(spark):
    # ADVICE r10: a NULL-text doc must not vanish from the output
    df = spark.createDataFrame(
        [(1, "alpha one."), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in rows(dedup.line_dedup(df), "doc_id")}
    assert set(out) == {1, 2}
    # NULL coalesces to one empty line (kept: first occurrence of '')
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == ""
    assert out[1]["clean_text"] == "alpha one."
