"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram Jaccard.

Parity-plus surface for a large-scale training-data pipeline (the
reference has no dedup; this is the north-star pack from SURVEY.md §7).

Portability note: every hash used here is **md5-hex-string based** so the
DuckDB oracle can replay the exact same values — Spark's `hash()`/`xxhash64`
and DuckDB's `hash()` are different functions, but `md5` is identical
everywhere.  MinHash therefore takes the *lexicographic minimum of salted
md5 strings* rather than a numeric min: same uniformity argument, zero
engine skew.

Scale design (100 TB):
* exact dedup groups by a 128-bit content hash, never by the full text —
  the shuffle carries 32-byte keys, not documents.
* MinHash-LSH is strictly bucketed: candidate pairs come from an
  equi-join on (band_idx, band_hash), which Spark executes as a plain
  shuffle join on a compact key.  **No all-pairs product ever happens**;
  cost is O(sum of bucket_size²) with bucket_size hard-bounded by the
  two-tier mega-bucket defense (identical-signature star collapse +
  MAX_BUCKET cap — see below).
* SimHash bucketing splits the 64-bit fingerprint into 4×16-bit bands
  (pigeonhole: hamming distance ≤3 ⇒ at least one band equal), same
  equi-join shape and same mega-bucket defense.
* n-gram Jaccard is the *verification* stage applied to candidate pairs
  only — at scale its input is the LSH output (`verify_candidates`),
  never a cross join; `near_dup_clusters` then turns verified pairs
  into one canonical doc per cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

# Hard bound on candidate-bucket membership (LSH bands / SimHash
# segments).  At 100 TB a boilerplate-heavy corpus produces mega-buckets
# — millions of docs sharing one band hash — and the naive
# collect_list-then-pair plan turns that into one OOM-ing task emitting
# O(bucket²) pairs.  Two-tier defense (VERDICT r2 "What's wrong" #1):
# 1. docs with IDENTICAL signatures collapse to their min-id
#    representative first — a duplicate cluster of m docs costs m-1
#    star edges, never m(m-1)/2 clique edges, and only the rep enters
#    banding (a window min over the signature key: one shuffle of
#    (id, sig) rows, spills to disk, no driver state);
# 2. surviving buckets of *distinct* signatures are capped at
#    MAX_BUCKET members (deterministic: the MAX_BUCKET lowest ids,
#    via row_number before any collect_list) so the per-task array and
#    the pair expansion are both hard-bounded.
#
# Measured recall cost of the cap (tests/test_dedup_text.py::
# test_lsh_bucket_cap_recall_cost, VERDICT r4 #4): on a 200-doc
# boilerplate mega-bucket of DISTINCT signatures, cap=64 keeps ~50% of
# the uncapped candidate pairs, cap=16 ~3%, cap≥bucket 100%.  Docs
# beyond a bucket's cap never become candidates at all — the sacrifice
# is confined to oversized boilerplate buckets; pairs in normal-sized
# buckets are untouched.
MAX_BUCKET = 64


from .util import ensure_parallelism, make_checkpointer  # noqa: E402  (shared fan-out guard)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the testdata is single-space separated)."""
    return F.split(text, " ")


def word_shingles(toks_col: str, n: int = 3) -> Column:
    """n-word shingles over an existing array column, 1-based element_at
    so the DuckDB mirror (list_extract is also 1-based) is verbatim.
    Documents shorter than n words fall back to one whole-text shingle."""
    idx_parts = [f"element_at({toks_col}, i + {k})" for k in range(n)]
    joined = f"concat_ws(' ', {', '.join(idx_parts)})"
    return F.expr(
        f"CASE WHEN size({toks_col}) >= {n} "
        f"THEN transform(sequence(1, size({toks_col}) - {n - 1}), i -> {joined}) "
        f"ELSE array(concat_ws(' ', {toks_col})) END"
    )


# ---------------------------------------------------------------------------
# Exact dedup


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content hash; keep the lowest id as the canonical copy.

    At 100 TB: the only wide exchange is on the 32-char md5 — documents
    themselves are reduced map-side (partial min/count) before shuffling.
    """
    return (
        docs.select(
            F.md5(F.col(text_col).cast("binary")).alias("content_md5"),
            F.col(id_col),
        )
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def span_dedup(
    docs: DataFrame,
    span_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style sub-document exact dedup: split every document into
    fixed ``span_tokens``-token spans, keep only the globally FIRST
    occurrence of each distinct span (lowest (doc_id, span_idx)), and
    reassemble what survives — the pass that strips boilerplate
    paragraphs repeated across a crawl without dropping whole
    documents.

    Output: one row per input doc — (doc_id, n_spans, n_kept,
    clean_text) with clean_text the kept spans re-joined in order
    ('' when everything was a repeat).

    Scale shape (mega-bucket-proof): the first occurrence of each
    distinct span is a ``groupBy(md5(span)).agg(min(coords))`` — a
    boilerplate span repeated across millions of docs reduces to
    map-side partials per task, never one window task sorting the
    whole hot key (the skew shape MAX_BUCKET defends against in the
    LSH family; the earlier row_number-over-md5 form had it).  That
    agg's exchange carries (32-byte hash, coords) only; span TEXT
    travels exactly twice, both times on well-distributed keys — the
    keep-flag join on (doc_id, span_idx) and the reassembly
    groupBy(doc_id)."""
    from .text import chunk_documents  # local import: text.py imports us

    spans = chunk_documents(
        docs, max_tokens=span_tokens, text_col=text_col, id_col=id_col
    ).select(id_col, F.col("chunk_idx").alias("span_idx"), F.col("chunk").alias("span"))
    spans = spans.withColumn("_h", F.md5(F.col("span").cast("binary")))
    # textless meta for every hash-keyed hop: the dedup decision needs
    # (hash, coords) only
    meta = spans.select(id_col, "span_idx", "_h")
    firsts = meta.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("span_idx").alias("i"))).alias(
            "_first"
        )
    )
    kept_meta = meta.join(firsts, "_h").select(
        id_col,
        "span_idx",
        (
            (F.col("_first.d") == F.col(id_col))
            & (F.col("_first.i") == F.col("span_idx"))
        ).alias("_keep"),
    )
    flagged = spans.drop("_h").join(kept_meta, [id_col, "span_idx"])
    kept_struct = F.when(
        F.col("_keep"), F.struct(F.col("span_idx").alias("i"), F.col("span").alias("s"))
    )  # collect_list drops the NULLs for non-kept spans
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .select(
            id_col,
            "n_spans",
            "n_kept",
            F.concat_ws(" ", F.expr("transform(_kept, k -> k.s)")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def with_minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_n: int = 3,
    sig_col: str = "sig",
) -> DataFrame:
    """MinHash signature: for salt j, m_j = min over shingles of
    md5(j ‖ '|' ‖ shingle) as a hex string.  min-of-uniform-hash is the
    classic MinHash estimator; string min keeps it oracle-portable.

    The token and shingle arrays are LET-BOUND (nested
    transform-over-1-element-array binders) so tokenization and
    shingle construction evaluate once per row, not once per salt —
    projected columns get substituted into each of the `num_hashes`
    fold references by Catalyst (measured 1.7 s vs 0.5 s at sf0.1;
    the substitution-duplication family SCALE.md records)."""
    n = shingle_n
    idx = ", ".join(f"element_at(TK, i + {k})" for k in range(n))
    mins = ", ".join(
        f"array_min(transform(SH, s -> md5(concat('{j}|', s))))"
        for j in range(num_hashes)
    )
    sig_expr = (
        f"transform(array(split({text_col}, ' ')), TK -> "
        f"transform(array(CASE WHEN size(TK) >= {n} "
        f"THEN transform(sequence(1, size(TK) - {n - 1}), "
        f"i -> concat_ws(' ', {idx})) "
        f"ELSE array(concat_ws(' ', TK)) END), "
        f"SH -> array({mins}))[0])[0]"
    )
    return ensure_parallelism(docs).withColumn(sig_col, F.expr(sig_expr))


def banded_capped(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    max_bucket: int | None,
    keep_sig: bool = True,
) -> DataFrame:
    """The shared banding stage of the self-join
    (`lsh_candidate_pairs`) and cross-side (`incremental_dedup`) LSH
    families: explode a signature DataFrame into per-band bucket rows
    (band_hash = md5 of the band's minhashes) and cap every
    (band_idx, band_hash) bucket at its `max_bucket` lowest ids —
    row_number BEFORE any collect, so per-task state is hard-bounded.
    Output columns: (id_col, [sig,] band_idx, band_hash).

    ``max_bucket=None`` skips the cap window entirely (no bucket-keyed
    exchange at all) — for callers whose pair count is already bounded
    per row by the OTHER side's cap (the streaming new-vs-index form).

    ``keep_sig=False`` projects the signature array out BEFORE the cap
    window — callers that only need bucket membership (the cross-side
    join) must not pay ~sig-size × bands extra shuffle bytes per doc
    through the window exchange."""
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col("sig")[b * rows + r] for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *parts).cast("binary")).alias("band_hash"),
            )
        )
    carried = ["sig"] if keep_sig else []
    exploded = sig_df.select(
        F.col(id_col), *carried, F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, *carried, "band.band_idx", "band.band_hash")
    if max_bucket is None:
        return exploded
    cap_w = Window.partitionBy("band_idx", "band_hash").orderBy(id_col)
    return (
        exploded.withColumn("_rn", F.row_number().over(cap_w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Banded LSH: signature → identical-signature collapse → `bands`
    band-hashes over the representatives → capped buckets → in-bucket
    pair expansion → distinct candidate pairs with the
    signature-estimated Jaccard (matching minhashes / num_hashes).

    Plan shape: the signature stage is computed ONCE (a self-join would
    re-evaluate the whole shingle→minhash lineage on both sides —
    measured 2× the runtime).  Mega-bucket defense (see MAX_BUCKET):
    docs with identical signatures emit star edges to their min-id
    representative (est_jaccard 1.0, linear in cluster size) and only
    representatives enter banding; surviving buckets keep their
    `max_bucket` lowest ids before any collect_list, so per-task array
    size and pair count are hard-bounded at max_bucket and
    max_bucket², whatever the data.  A duplicate *cluster* is thus a
    star, not a clique — connected components are preserved for dedup
    while output stays linear in cluster size.
    """
    sig = with_minhash_signature(docs, text_col, num_hashes, shingle_n)
    # tier 1 — identical-signature collapse: window min over a 32-char
    # signature digest (one shuffle of (id, sig) rows, spill-friendly)
    sig = sig.withColumn("_sig_key", F.md5(F.concat_ws("|", "sig").cast("binary")))
    sig = sig.withColumn(
        "_rep_id", F.min(id_col).over(Window.partitionBy("_sig_key"))
    )
    # r13 NEGATIVE result (guide §1.3), tried and reverted on evidence:
    # sig feeds both the star-edge and representative branches, so a
    # localCheckpoint here looked like the §2.4 cut — but it measured
    # 0.80 → 1.84 s on dedup_minhash_lsh (the checkpoint materializes
    # in-build, blocks AQE coalescing downstream, and the persist costs
    # more than the second minhash pass), while every heavyweight
    # consumer (near_dup_clusters*, llm_pipeline, lsh_verify,
    # split_leakage_*) already truncates the pairs lineage via its own
    # per-round propagation checkpoints (measured neutral there).
    dup_pairs = sig.filter(F.col(id_col) != F.col("_rep_id")).select(
        F.col("_rep_id").alias("doc_a"),
        F.col(id_col).alias("doc_b"),
        F.col("sig").alias("sig_a"),
        F.col("sig").alias("sig_b"),
    )
    reps = sig.filter(F.col(id_col) == F.col("_rep_id"))

    # tier 2 — band + bucket cap BEFORE the collect (shared helper):
    # the later collect_list sees ≤ max_bucket rows per bucket.
    capped = banded_capped(reps, id_col, num_hashes, bands, max_bucket)

    buckets = capped.groupBy("band_idx", "band_hash").agg(
        F.array_sort(F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("sig")))).alias(
            "members"
        )
    )
    # all ordered pairs within the bucket: member i × members after i
    pair_expr = F.explode(
        F.flatten(
            F.transform(
                "members",
                lambda x, i: F.transform(
                    F.slice(F.col("members"), i + 2, F.size("members")),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    band_pairs = (
        buckets.filter(F.size("members") > 1)
        .select(pair_expr.alias("p"))
        .select(
            F.col("p.a.id").alias("doc_a"),
            F.col("p.b.id").alias("doc_b"),
            F.col("p.a.sig").alias("sig_a"),
            F.col("p.b.sig").alias("sig_b"),
        )
    )
    pairs = (
        band_pairs.unionByName(dup_pairs)
        .groupBy("doc_a", "doc_b")
        .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
    )
    n_match = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        n_match.cast("long").alias("n_common_minhash"),
        (n_match / F.lit(float(num_hashes))).alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification of candidate pairs)


def ngram_jaccard(
    left: DataFrame,
    right: DataFrame,
    join_cond: Column,
    text_a: str = "a.text",
    text_b: str = "b.text",
    id_a: str = "a.doc_id",
    id_b: str = "b.doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for joined pairs.

    |A∪B| is computed as |A|+|B|−|A∩B| (list_union is not portable).
    At scale `join_cond` must be an LSH candidate equi-join — this
    function does not constrain it so tests can use small samples.

    The shingle sets are computed per DOC on each join side before the
    join, not per pair row after it: a doc appearing in k candidate
    pairs shingles once instead of k times (the join then carries the
    shingle arrays — ~shingle_n× the text bytes, the standard
    precompute-vs-recompute trade, and the right one whenever
    candidate multiplicity exceeds 1).
    """
    def _shingled(side: DataFrame, tag: str, text_col: str) -> DataFrame:
        return side.withColumn(
            f"__T_{tag}__", tokens(F.col(text_col.split(".")[-1]))
        ).withColumn(
            f"_s{tag}",
            F.array_distinct(word_shingles(f"__T_{tag}__", shingle_n)),
        ).drop(f"__T_{tag}__")

    la = _shingled(left, "a", text_a).alias("a")
    rb = _shingled(right, "b", text_b).alias("b")
    joined = la.join(rb, join_cond).select(
        F.col(id_a).alias("doc_a"),
        F.col(id_b).alias("doc_b"),
        F.col("a._sa").alias("_sa"),
        F.col("b._sb").alias("_sb"),
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    joined = joined.withColumn("n_inter", inter).withColumn(
        "n_union", (F.size("_sa") + F.size("_sb")).cast("long") - inter
    )
    return joined.select(
        "doc_a",
        "doc_b",
        "n_inter",
        "n_union",
        (F.col("n_inter") / F.col("n_union").cast("double")).alias("jaccard"),
    )


def verify_candidates(
    cand: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """THE production dedup composition: exact shingle-Jaccard
    verification of LSH candidate pairs (cand carries doc_a/doc_b).

    Plan: two equi-joins attach the pair's SHINGLE SETS (each a
    shuffle/broadcast hash join on the id — candidates are tiny next
    to the corpus), then the same exact-Jaccard algebra as
    `ngram_jaccard`.  Shingles are computed once per CANDIDATE doc —
    a semi-join keeps only docs that appear in some pair first (most
    of the corpus has no candidates and must not pay the fold), and a
    doc in k pairs still shingles once.  Work is
    O(candidate docs + candidates), never O(n²) — this is the function
    the docstrings mean by "at scale the verify stage's input is the
    LSH output"."""
    # cand is referenced three times (both id projections + the final
    # join); materialize the small capped pair set once instead of
    # re-running its LSH lineage per reference (same pattern as
    # near_dup_clusters' edge checkpoint)
    cand = cand.select("doc_a", "doc_b").localCheckpoint()
    ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh = docs.join(ids, id_col, "semi").withColumn(
        "__T__", tokens(F.col(text_col))
    ).select(
        F.col(id_col).alias("_sid"),
        F.array_distinct(word_shingles("__T__", shingle_n)).alias("_sh"),
    )
    a = sh.select(F.col("_sid").alias("doc_a"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col("_sid").alias("doc_b"), F.col("_sh").alias("_sb"))
    joined = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    joined = joined.withColumn("n_inter", inter).withColumn(
        "n_union", (F.size("_sa") + F.size("_sb")).cast("long") - inter
    )
    return joined.select(
        "doc_a",
        "doc_b",
        "n_inter",
        "n_union",
        (F.col("n_inter") / F.col("n_union").cast("double")).alias("jaccard"),
    )


def near_dup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over near-dup edges: every doc gets
    ``cluster_id`` = the smallest doc id reachable through the pair
    graph — the step that turns pair lists (LSH/SimHash/verified) into
    the dedup deliverable (keep one doc per cluster: ``doc_id ==
    cluster_id``).

    Algorithm: min-label propagation.  Each round every node takes the
    min of its own label and its neighbors' labels; a per-row change
    flag is carried through the round and ``sum(flag) == 0`` detects
    the fixpoint — one cheap agg action per round, and (unlike a
    ``sum(label)`` probe) it is type-agnostic: string ids compare fine
    and there is no int64-sum overflow exposure (ADVICE r3).
    Rounds needed = graph diameter, which for near-dup graphs (stars
    from the identical-sig collapse + short chains) is small; max_iter
    bounds pathological chains.

    Scale: each round is one equi-join edges⋈labels + one groupBy —
    both shuffle on ids, never materialize components in one task.
    Per-round lineage truncation (the classic iterative-algorithm
    necessity; without it round k replays rounds 1..k-1) comes from
    ``make_checkpointer``: default ``localCheckpoint`` for local runs,
    or pass ``checkpoint_dir`` for reliable ``checkpoint()`` — local
    blocks die with their executor, which a 1000-node run WILL see;
    the swap changes no logic (both paths are label-identity-tested).
    Iterative ⇒ not single-query SQL-expressible; correctness is
    pinned against a Python union-find in tests (sf0.01 edges + seeded
    random graphs)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    ckpt = make_checkpointer(docs.sparkSession, checkpoint_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = ckpt(edges)

    labels = docs.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))

    def one_round(labels):
        neigh = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neigh, labels["id"] == neigh["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                # labels only decrease, so "my neighbour min beats my
                # current label" IS the change flag for this round
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label"))
                .cast("long")
                .alias("_chg"),
            )
        )
        labels = ckpt(labels)
        n_changed = labels.agg(F.sum("_chg")).first()[0]
        return labels.drop("_chg"), n_changed

    for _ in range(max_iter):
        labels, n_changed = one_round(labels)
        if not n_changed:
            break
    else:
        # the loop used its whole change budget.  That is NOT yet proof
        # of non-convergence: a propagation needing exactly max_iter
        # changing rounds ends the loop with n_changed > 0 AND a
        # correct fixpoint.  One confirming probe round decides; raise
        # only if labels are genuinely still moving (a chain deeper
        # than max_iter hops would otherwise silently under-merge and
        # fail any exact transitive-closure oracle — ADVICE r4).
        labels, n_changed = one_round(labels)
        if n_changed:
            raise RuntimeError(
                f"near_dup_clusters did not converge in {max_iter} rounds "
                f"({n_changed} labels still changing); raise max_iter — "
                "rounds needed equals the pair graph's diameter"
            )
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def near_dup_clusters_star(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — same output contract as
    :func:`near_dup_clusters` (every doc labelled with the smallest
    reachable id), but rounds needed are O(log n) INDEPENDENT of the
    graph's diameter.  Min-label propagation pays one round per hop, so
    a 10,000-hop chain (entirely possible in web-crawl near-dup graphs
    where page A ~ A' ~ A'' ~ ...) costs 10,000 shuffles; star
    contraction collapses such chains in ~log2(n) rounds.  This is the
    100 TB path; the propagation twin stays registered because its
    per-round plan is cheaper on the shallow star-shaped graphs LSH
    candidate capping produces.

    Each round rewires edges toward local minima and never disconnects
    a component:

    * large-star (per node u over its FULL neighborhood Γ(u)):
      m = min(Γ(u) ∪ {u}); emit (w, m) for every w ∈ Γ(u) with w > u.
    * small-star (per node u over Γ⁻(u) = neighbors < u):
      m = min(Γ⁻(u) ∪ {u}); emit (u, m) and (w, m) for w ∈ Γ⁻(u)\\{m}.

    The fixpoint is a star forest whose centers are the component
    minima; labels read directly off the final edges.  Edges are kept
    canonically oriented (hi, lo) with hi > lo; the symmetric view
    large-star needs is a cheap union, and every emitted edge is
    canonical by construction (m ≤ u < w in large-star, m ≤ lo < hi in
    small-star), so no per-round re-orientation pass is needed.

    Scale: each round is two groupBy-min + two equi-joins shuffling
    only (id, id) pairs; per-round lineage truncation via
    ``make_checkpointer`` (reliable ``checkpoint_dir`` for clusters,
    as near_dup_clusters).  Convergence = edge-set fixpoint, detected
    with one symmetric-difference count per round.  Iterative ⇒ not
    single-query SQL-expressible; pinned against the same union-find
    and transitive-closure oracles as the propagation twin."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    ckpt = make_checkpointer(docs.sparkSession, checkpoint_dir)
    e0 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    edges = (
        e0.select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )
    edges = ckpt(edges)

    def one_round(edges):
        # large-star over the symmetric view
        sym = edges.select(F.col("hi").alias("src"), F.col("lo").alias("dst")).union(
            edges.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        )
        mins = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
        mins = mins.select(
            "src", F.least(F.col("src"), F.col("_mn")).alias("m")
        )
        large = (
            sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
        )
        large = ckpt(large)
        # small-star directly on the canonical orientation
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        rewired = (
            large.join(smins, "hi")
            .where(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        )
        center = smins.select(F.col("hi"), F.col("m").alias("lo"))
        new_edges = ckpt(rewired.union(center).distinct())
        n_changed = (
            new_edges.exceptAll(edges).union(edges.exceptAll(new_edges)).count()
        )
        return new_edges, n_changed

    for _ in range(max_iter):
        edges, n_changed = one_round(edges)
        if not n_changed:
            break
    else:
        # same exactly-max_iter subtlety as near_dup_clusters: the last
        # budgeted round may have REACHED the fixpoint while still
        # reporting a change; one confirming probe round decides.
        edges, n_changed = one_round(edges)
        if n_changed:
            raise RuntimeError(
                f"near_dup_clusters_star did not converge in {max_iter} "
                f"rounds ({n_changed} edges still rewiring); raise "
                "max_iter — rounds needed is O(log n), so this signals "
                "a pathological input, not a deep graph"
            )
    # fixpoint: a star forest (hi → component-min lo).  min() guards
    # the theoretical case of a node still holding two star edges.
    lab = edges.groupBy("hi").agg(F.min("lo").alias("_lab"))
    return docs.select(F.col(id_col).alias("id")).join(
        lab, F.col("id") == F.col("hi"), "left"
    ).select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("_lab"), F.col("id")).alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# SimHash


def with_simhash(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 64,
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash as a bit-string, from md5 nibbles.

    Classic Charikar sketch: each token votes ±1 on every bit of its
    md5; the fingerprint bit is 1 iff the vote sum is positive.  Bit p
    lives in hex nibble p div 4 at weight 2^(p mod 4); the nibble is
    decoded with an instr() lookup so the arithmetic is pure-portable
    (no engine-specific bit ops).

    Plan shape (benchmarked ~2× over the naive form at sf0.1): decode
    each token's md5 into nibble ints once, then ONE aggregate fold
    accumulates all 64 bit-counts with 4 counters PACKED per bigint
    (counter for bit w of nibble i lives at bits [16w, 16w+16) of pack
    i) — integer shifts only, a 16-element accumulator, no per-token
    64-element allocations, and no re-scan of the token array per bit.
    The naive alternative — 64 independent folds with string ops —
    re-scans the tokens 64× and overflows whole-stage-codegen method
    limits into interpreted mode.  The vote `sum(±1) > 0` is computed
    as the equivalent `2·count_ones > n_tokens`.  16-bit packed
    counters cap documents at 65 535 tokens per doc — chunk longer
    docs upstream.  No shuffle, no UDF.

    The token array and the packed-counter array are LET-BOUND
    (nested transform-over-1-element-array binders): the fold runs
    once per row and the 64 bit cases read the bound struct — as
    projected columns, Catalyst substituted the split/fold into the
    64 references (measured 1.6 s vs 0.6 s at sf0.1; the
    substitution-duplication family SCALE.md records).
    """
    n_nibs = bits // 4
    nibs = (
        f"transform(transform(TK, t -> md5(t)), "
        f"h -> transform(sequence(1, {n_nibs}), i -> instr('{HEX}', substring(h, i, 1)) - 1))"
    )
    packv = (
        "(v % 2) + shiftleft(CAST(shiftright(v, 1) % 2 AS BIGINT), 16)"
        " + shiftleft(CAST(shiftright(v, 2) % 2 AS BIGINT), 32)"
        " + shiftleft(CAST(shiftright(v, 3) % 2 AS BIGINT), 48)"
    )
    counts = (
        f"aggregate({nibs}, array_repeat(CAST(0 AS BIGINT), {n_nibs}), "
        f"(acc, ns) -> zip_with(acc, transform(ns, v -> {packv}), (a, b) -> a + b))"
    )
    bit_cases = []
    for p in range(bits):
        i, w = p // 4, p % 4
        cnt = f"(shiftright(element_at(Z.p, {i + 1}), {16 * w}) % 65536)"
        bit_cases.append(f"CASE WHEN 2 * {cnt} > Z.n THEN '1' ELSE '0' END")
    sig_expr = (
        f"transform(array(split({text_col}, ' ')), TK -> "
        f"transform(array(named_struct('p', {counts}, 'n', size(TK))), "
        f"Z -> concat({', '.join(bit_cases)}))[0])[0]"
    )
    return ensure_parallelism(docs).withColumn(out_col, F.expr(sig_expr))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    16-bit segments (hamming ≤ 3 guarantees one equal band), group by
    (segment_idx, segment), expand pairs within the bucket, then verify
    the exact hamming distance.  Same no-cross-join, compute-once shape
    as MinHash-LSH: a self-join would re-evaluate the whole fingerprint
    fold on both sides (measured >2× slower).

    Mega-bucket defense mirrors lsh_candidate_pairs (see MAX_BUCKET):
    identical fingerprints collapse to min-id star edges (hamming 0),
    only representatives enter segment banding, and each segment
    bucket keeps its max_bucket lowest ids before the collect — so a
    million-doc duplicate cluster costs m-1 rows, never m²."""
    return hamming_band_pairs(
        with_simhash(docs, text_col), "simhash", id_col, max_hamming, max_bucket
    )


def hamming_band_pairs(
    fingerprinted: DataFrame,
    sig_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """The hamming-banded near-pair stage shared by every 64-bit
    fingerprint dedup (SimHash over text, dHash over images): band the
    bit-string into 4 16-bit segments (pigeonhole: hamming ≤ 3
    guarantees ≥ 1 equal segment), bucket-join, verify exact hamming.
    Input is any (id, 64-char '0'/'1' string) frame — the fingerprint
    KERNEL is the only thing that differs per modality.  Mega-bucket
    defense as in simhash_near_pairs' docstring."""
    sh = fingerprinted.select(
        F.col(id_col), F.col(sig_col).alias("simhash")
    )
    # tier 1 — identical-fingerprint collapse to the min-id rep
    sh = sh.withColumn(
        "_rep_id", F.min(id_col).over(Window.partitionBy("simhash"))
    )
    # r13 NEGATIVE result, measured and reverted (guide §1/§2.4): sh
    # feeds BOTH the dup-pair leg and the representative banding leg,
    # so a localCheckpoint here looked like the standard replay cut —
    # but the same-VM A/B read simhash_pairs 2.33→2.93 s,
    # image_phash_dedup 0.78→1.27 s, audio_fingerprint_dedup
    # 1.27→1.75 s: the fingerprint kernel is scan-side column algebra
    # (cheap to replay) while the checkpoint pays a full
    # materialization barrier and drops AQE fusion below it.  Same
    # arithmetic as the lsh_candidate_pairs revert.
    dup_pairs = sh.filter(F.col(id_col) != F.col("_rep_id")).select(
        F.col("_rep_id").alias("doc_a"),
        F.col(id_col).alias("doc_b"),
        F.lit(0).cast("long").alias("hamming"),
    )
    reps = sh.filter(F.col(id_col) == F.col("_rep_id"))
    segs = reps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg_idx"),
                        F.substring("simhash", i * 16 + 1, 16).alias("seg"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("s"),
    ).select(id_col, "simhash", "s.seg_idx", "s.seg")
    # tier 2 — bucket cap before the collect
    cap_w = Window.partitionBy("seg_idx", "seg").orderBy(id_col)
    segs = segs.withColumn("_rn", F.row_number().over(cap_w)).filter(
        F.col("_rn") <= max_bucket
    )
    buckets = segs.groupBy("seg_idx", "seg").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash")))
        ).alias("members")
    )
    pair_expr = F.explode(
        F.flatten(
            F.transform(
                "members",
                lambda x, i: F.transform(
                    F.slice(F.col("members"), i + 2, F.size("members")),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    pairs = (
        buckets.filter(F.size("members") > 1)
        .select(pair_expr.alias("p"))
        .select(
            F.col("p.a.id").alias("doc_a"),
            F.col("p.b.id").alias("doc_b"),
            F.col("p.a.simhash").alias("sh_a"),
            F.col("p.b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(F.split("sh_a", ""), F.split("sh_b", ""), lambda x, y: x != y),
            lambda m: m,
        )
    )
    verified = pairs.withColumn("hamming", hamming.cast("long")).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
    return verified.unionByName(dup_pairs)


# dHash grid: 8 rows × 9 columns of cells; bit (r, c) compares cell
# (r, c) with its right neighbor → 8×8 = 64 bits, the standard layout
PHASH_ROWS, PHASH_COLS = 8, 9


def with_image_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    out_col: str = "phash",
) -> DataFrame:
    """64-bit dHash perceptual fingerprint of an image payload — the
    IMAGE member of the multimodal dedup family (VERDICT r6 #4; audio
    joined in round 6 via sources/multimodal.audio_chunks).

    dHash proper: grayscale-resize the image to a 9×8 cell grid, set
    bit (r, c) iff cell (r, c) < cell (r, c+1) — difference-of-adjacent
    -cells is what makes the hash robust to brightness/scale, and near-
    identical images land within a few bits of hamming distance.

    The GRID here is the container's deterministic fake decode (cv2 is
    absent — same policy as sources/multimodal.decode_media): cell
    (r, c) = first byte of md5(payload_md5 | r | c), decoded from hex
    nibbles with the engine-portable instr() lookup, so the whole
    fingerprint replays in DuckDB and the registered query is
    hash-gated end to end.  A real deployment swaps ONLY the cell
    source (a Pandas-UDF grayscale-resize over real pixels — same
    9×8 → 64-bit comparison, same output column); everything
    downstream — identical-hash collapse, 4×16-bit hamming banding,
    bucket caps, exact verify — is `hamming_band_pairs`, shared with
    SimHash and unchanged.

    Pure per-row Column algebra, payload read once (the md5 feeding
    every cell is let-bound), no shuffle, no UDF."""
    # ONE md5 per cell: the first byte decodes via conv() on the
    # leading two hex chars — numerically identical to the two-nibble
    # instr() decode but without evaluating md5 twice (higher-order
    # functions never enter whole-stage codegen, so the two textual
    # md5() copies of the original form were NOT fused by CSE)
    cell = (
        "CAST(conv(substring(md5(concat(PM, '|', "
        "CAST(i div 9 AS STRING), '|', CAST(i % 9 AS STRING))), 1, 2), 16, 10) "
        "AS INT)"
    )
    # bit b in 1..64 compares cell (r, c) = ((b-1) div 8, (b-1) % 8)
    # with its right neighbor — computed as ONE dynamic lambda instead
    # of 64 concatenated literal CASE blocks, which exceeded janino's
    # method-size limit and dropped the projection out of whole-stage
    # codegen (found by the 25× probe on the audio twin)
    left = "CAST(((b - 1) div 8) * 9 + ((b - 1) % 8) + 1 AS INT)"
    expr = (
        f"transform(array(md5({payload_col})), PM -> "
        f"transform(array(transform(sequence(0, {PHASH_ROWS * PHASH_COLS - 1}), "
        f"i -> {cell})), CS -> "
        f"concat_ws('', transform(sequence(1, {PHASH_ROWS * (PHASH_COLS - 1)}), b -> "
        f"CASE WHEN element_at(CS, {left}) < element_at(CS, {left} + 1) "
        "THEN '1' ELSE '0' END)))[0])[0]"
    )
    return ensure_parallelism(df).withColumn(out_col, F.expr(expr))


def image_phash_pairs(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Image near-duplicate pairs by dHash: `with_image_phash` kernel →
    the shared `hamming_band_pairs` stage.  Identical payloads collapse
    to hamming-0 star edges; near-identical real pixels (with the cv2
    kernel) land in the banded hamming ≤ 3 verify, exactly like
    SimHash text pairs — one pair machinery, per-modality kernels."""
    return hamming_band_pairs(
        with_image_phash(media, payload_col, id_col),
        "phash",
        id_col,
        max_hamming,
        max_bucket,
    )


def video_frame_dedup(
    frames: DataFrame,
    payload_col: str = "payload",
    video_col: str = "video_id",
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """VIDEO near-duplicate pairs by frame-fingerprint SET overlap —
    the video member of the multimodal dedup family (text: minhash /
    simhash; image: dHash; audio: energy contour), and the scheme
    production video dedup actually uses (shot/frame-level fingerprint
    matching): two videos are near-dups when they SHARE frames, robust
    to re-encodes that drop/insert/alter a few frames — where a
    majority-vote or sequence hash would drift.

    Stages, all shared machinery: per-frame 64-bit dHash
    (`with_image_phash` — the fake-decode grid here; a real cv2 kernel
    swaps only the cell source), distinct (video, phash) sets, a
    CAPPED bucket self-join on the frame hash (identical frames —
    intros, black frames — are the hot buckets; the cap bounds any
    bucket's pair quota exactly like LSH banding), then exact set
    arithmetic: jaccard = shared / (n_a + n_b − shared) from three
    exact counts, one IEEE division — bit-portable.

    Output (video_a, video_b, n_shared, n_a, n_b, jaccard) for pairs
    with jaccard ≥ threshold.  Scale: the only corpus-keyed shuffles
    are the (video, phash) distinct and the phash bucket join — both
    carry 64-bit fingerprints, never frames."""
    ph = (
        with_image_phash(frames, payload_col, video_col, out_col="phash")
        .select(video_col, "phash")
        .distinct()
        # r13 (guide §2.4): ph feeds the per-video size table AND the
        # capped bucket join's two sides — uncut, the 72-md5-per-frame
        # fake-decode kernel replayed up to 4x (once per branch; the
        # branches' exchanges differ by aliases, so nothing is reused).
        # Lazy: the narrow (video, hash) table materializes at first
        # use inside the timed action.
        .localCheckpoint(eager=False)
    )
    sizes = ph.groupBy(video_col).agg(F.count(F.lit(1)).alias("n"))
    cap_w = Window.partitionBy("phash").orderBy(video_col)
    capped = (
        ph.withColumn("_rn", F.row_number().over(cap_w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
        .localCheckpoint(eager=False)  # both sides of the bucket join
    )
    shared = (
        capped.select(F.col(video_col).alias("video_a"), "phash")
        .join(capped.select(F.col(video_col).alias("video_b"), "phash"), "phash")
        .filter(F.col("video_a") < F.col("video_b"))
        .groupBy("video_a", "video_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = shared.join(
        sizes.select(F.col(video_col).alias("video_a"), F.col("n").alias("n_a")),
        "video_a",
    ).join(
        sizes.select(F.col(video_col).alias("video_b"), F.col("n").alias("n_b")),
        "video_b",
    )
    jac = F.col("n_shared") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        out.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            "video_a",
            "video_b",
            F.col("n_shared").cast("long"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            "jaccard",
        )
    )


def video_segment_dedup(
    frames: DataFrame,
    payload_col: str = "payload",
    video_col: str = "video_id",
    frame_col: str = "frame_idx",
    min_run: int = 2,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Sequence-ALIGNED shared-frame segments between video pairs — the
    session-window twin of `video_frame_dedup` (VERDICT r7 ask #8):
    frame-SET overlap is order-blind, so it cannot tell "same clip
    re-encoded" (one long aligned run covering most of both videos)
    from "same intro stitched onto different content" (one short run
    at a fixed position) — the production distinction that decides
    whether to drop a video or just trim its intro.

    Mechanics: matched frames (equal dHash, the capped bucket join
    shared with `video_frame_dedup`) carry their frame indices
    ``(ia, ib)``; a shared SEGMENT is a maximal diagonal run —
    consecutive in BOTH videos, i.e. consecutive ``ia`` within one
    alignment offset ``ia − ib``.  Runs fall out of the gaps-and-
    islands trick the session operators use (`operators/sessions.py`):
    within (pair, offset), ``island = ia − row_number(order by ia)``
    is constant exactly along a run.  One row per segment of length ≥
    ``min_run``: (video_a, video_b, offset, start_a, start_b,
    run_len) — the segment table a trim/drop policy consumes.

    Scale shape: fingerprints shuffle, frames don't (the
    video_frame_dedup posture); the islands window partitions by
    (pair, offset) whose size is bounded by min(n_a, n_b) frames —
    per-pair work, never corpus-keyed."""
    ph = (
        with_image_phash(frames, payload_col, video_col, out_col="phash")
        .select(video_col, F.col(frame_col).cast("long").alias("fi"), "phash")
        .distinct()
    )
    cap_w = Window.partitionBy("phash").orderBy(video_col, "fi")
    capped = (
        ph.withColumn("_rn", F.row_number().over(cap_w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
        # r13 (guide §2.4): both sides of the alignment self-join below
        # replayed the whole fake-decode kernel + distinct + cap window
        # (the before-plan duplicates the chain; aliases block exchange
        # reuse).  Lazy: the narrow (video, fi, hash) table materializes
        # at first use inside the timed action.
        .localCheckpoint(eager=False)
    )
    a = capped.select(
        F.col(video_col).alias("video_a"), F.col("fi").alias("ia"), "phash"
    )
    b = capped.select(
        F.col(video_col).alias("video_b"), F.col("fi").alias("ib"), "phash"
    )
    matches = (
        a.join(b, "phash")
        .filter(F.col("video_a") < F.col("video_b"))
        .select("video_a", "video_b", "ia", "ib")
        .distinct()
        .withColumn("offset", F.col("ia") - F.col("ib"))
    )
    isl_w = Window.partitionBy("video_a", "video_b", "offset").orderBy("ia")
    runs = (
        matches.withColumn("_isl", F.col("ia") - F.row_number().over(isl_w))
        .groupBy("video_a", "video_b", "offset", "_isl")
        .agg(
            F.min("ia").alias("start_a"),
            F.min("ib").alias("start_b"),
            F.count(F.lit(1)).alias("run_len"),
        )
    )
    # `align_offset`, not `offset`: OFFSET is a clause keyword in both
    # engines' SQL and the oracle must name the same column
    return runs.filter(F.col("run_len") >= min_run).select(
        "video_a",
        "video_b",
        F.col("offset").cast("long").alias("align_offset"),
        F.col("start_a").cast("long"),
        F.col("start_b").cast("long"),
        F.col("run_len").cast("long"),
    )


AUDIO_FP_BITS = 64


def audio_fingerprint_pairs(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    chunk_samples: int = 64,
    max_hamming: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Audio near-duplicate pairs by energy-contour fingerprint — the
    AUDIO member of the multimodal dedup family (text → SimHash,
    image → dHash, audio → this): chunk the PCM stream
    (`sources.multimodal.audio_chunks` — REAL int16 decode), resample
    the per-chunk energy contour to a FIXED 64 comparison points
    (position i compares chunk 1 + ((i−1)(n−1)) div 64 with its
    successor — the chromaprint-style duration-invariant trick: no
    padding artifacts, every clip yields exactly 64 bits), set bit i
    iff energy rises, then the SAME `hamming_band_pairs` stage as
    SimHash/dHash.

    Exactness: the rise test cross-multiplies exact int64 energies
    (ssq_a · n_b < ssq_b · n_a — never a float rms division), so the
    fingerprint replays bit-for-bit in DuckDB over the byte-decoded
    oracle.  Clips shorter than 2 chunks have no contour to compare —
    they are FILTERED OUT before pairing (ADVICE r7 #2: they used to
    fingerprint as identical all-zeros, so every pair of unrelated
    sub-second clips surfaced as a hamming-0 "duplicate" a downstream
    dedup would delete on).

    Scale shape: the payload is consumed inside the audio_chunks
    mapInPandas stage (never shuffled); what shuffles is (media_id,
    chunk stats) rows into one media-keyed groupBy, then 64-char
    fingerprints through the banded pair join."""
    from ..sources.multimodal import audio_chunks

    chunks = audio_chunks(
        media.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")),
        chunk_samples,
    )
    prof = chunks.groupBy("media_id").agg(
        F.array_sort(
            F.collect_list(F.struct("chunk_idx", "sum_sq", "n_samples"))
        ).alias("ch")
    )
    # ONE dynamic lambda over the bit index, not 64 literal CASE blocks
    # concatenated: the literal form exceeded janino's method-size
    # limit and dropped the whole projection out of whole-stage codegen
    # (measured in the 25× probe as a compile-fallback ERROR + slower
    # x1 run).  CAST: `div` yields BIGINT and ANSI element_at wants
    # INT; nested CASE (not AND) because ANSI element_at throws
    # out-of-bounds and AND operands may not short-circuit in codegen.
    a = f"CAST(1 + ((i - 1) * (size(ch) - 1)) div {AUDIO_FP_BITS} AS INT)"
    fp_expr = (
        f"concat_ws('', transform(sequence(1, {AUDIO_FP_BITS}), i -> "
        f"CASE WHEN element_at(ch, {a}).sum_sq * element_at(ch, {a} + 1).n_samples < "
        f"element_at(ch, {a} + 1).sum_sq * element_at(ch, {a}).n_samples "
        "THEN '1' ELSE '0' END))"
    )
    # < 2 chunks → no contour to fingerprint; pairing them would emit
    # systematic hamming-0 false positives (ADVICE r7 #2).  The filter
    # also lets the bit lambda drop its per-bit size guard (element_at
    # is now always in bounds).
    fp = prof.filter(F.size("ch") >= 2).withColumn("afp", F.expr(fp_expr))
    return hamming_band_pairs(fp, "afp", "media_id", max_hamming, max_bucket)


# ---------------------------------------------------------------------------
# Incremental dedup (new corpus vs existing index)


def incremental_dedup(
    new_docs: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Dedup a NEW batch of documents against an already-ingested
    index — the shape every continuously-crawled training corpus needs
    (the self-join family above rebuilds the whole pair graph; a daily
    ingest must only compare new docs against the index, never index
    against itself).

    Per new doc: ``is_exact_dup`` (content md5 already in the index),
    ``n_candidates`` (index docs sharing an LSH band bucket),
    ``n_dups`` (candidates whose exact shingle Jaccard ≥ threshold),
    and ``kept`` = not exact and no verified near-dup.

    Scale shape: both sides band independently (the shared
    `banded_capped` stage; caps per (band_idx, band_hash) bound each
    side's bucket at `max_bucket`, so the band equi-join emits ≤
    max_bucket² pairs per bucket — never |new|×|index|).  Verification
    attaches each pair's shingle sets SIDE-AWARE (new ids resolve
    against new_docs, index ids against index_docs), so the two inputs
    may safely use overlapping id spaces — each crawl batch numbering
    its own ids from 1 is the normal case.  The exact check joins
    32-char md5 keys.  In production the index side's signatures and
    band hashes are computed ONCE at ingest and stored (this function
    recomputes them so the oracle can replay it stateless); the
    per-batch cost is then O(new + candidates).
    """

    def banded(side: DataFrame, out_id: str) -> DataFrame:
        sig = with_minhash_signature(side, text_col, num_hashes, shingle_n)
        return banded_capped(
            sig, id_col, num_hashes, bands, max_bucket, keep_sig=False
        ).select(F.col(id_col).alias(out_id), "band_idx", "band_hash")

    # referenced three times below (two shingle semi-joins + the final
    # join) — materialize the small capped pair set once instead of
    # re-running both LSH lineages per reference
    cand = (
        banded(new_docs, "doc_a")
        .join(banded(index_docs, "doc_b"), ["band_idx", "band_hash"])
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint()
    )
    idx_md5 = index_docs.select(
        F.md5(F.col(text_col).cast("binary")).alias("content_md5")
    ).distinct()
    return _verify_and_assemble(
        cand, new_docs, index_docs, idx_md5, text_col, id_col, shingle_n, threshold
    )


def _verify_and_assemble(
    cand: DataFrame,
    new_docs: DataFrame,
    index_docs: DataFrame,
    idx_md5: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    threshold: float,
) -> DataFrame:
    """Shared back half of the incremental-dedup family (stateless,
    indexed, streamed): side-aware shingle resolution for the candidate
    pairs, exact-Jaccard verification, per-new-doc aggregation, and the
    exact-dup/kept assembly.  Factored so the md5 SOURCE (recomputed
    from index text vs read from the stored index) is the caller's ONE
    explicit decision — the round-6 review found the only divergence
    between the previously copy-pasted variants hiding exactly there."""

    def side_shingles(side: DataFrame, pair_col: str) -> DataFrame:
        ids = cand.select(F.col(pair_col).alias(id_col)).distinct()
        return (
            side.join(ids, id_col, "semi")
            .withColumn("__T__", tokens(F.col(text_col)))
            .select(
                F.col(id_col).alias(pair_col),
                F.array_distinct(word_shingles("__T__", shingle_n)).alias(
                    f"_s_{pair_col}"
                ),
            )
        )

    joined = cand.join(side_shingles(new_docs, "doc_a"), "doc_a").join(
        side_shingles(index_docs, "doc_b"), "doc_b"
    )
    inter = F.size(F.array_intersect("_s_doc_a", "_s_doc_b")).cast("long")
    union = (F.size("_s_doc_a") + F.size("_s_doc_b")).cast("long") - inter
    verified = joined.select(
        "doc_a", (inter / union.cast("double")).alias("jaccard")
    )
    per_new = verified.groupBy("doc_a").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum((F.col("jaccard") >= threshold).cast("long")).alias("n_dups"),
    )
    exact = new_docs.select(
        id_col, F.md5(F.col(text_col).cast("binary")).alias("content_md5")
    ).join(idx_md5.withColumn("_hit", F.lit(1)), "content_md5", "left")
    zero = F.lit(0).cast("long")
    return (
        exact.join(per_new.withColumnRenamed("doc_a", id_col), id_col, "left")
        .select(
            id_col,
            F.col("_hit").isNotNull().alias("is_exact_dup"),
            F.coalesce(F.col("n_candidates"), zero).alias("n_candidates"),
            F.coalesce(F.col("n_dups"), zero).alias("n_dups"),
            (
                F.col("_hit").isNull() & (F.coalesce(F.col("n_dups"), zero) == 0)
            ).alias("kept"),
        )
    )


def build_dedup_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """The STORED dedup index a daily-ingest pipeline writes at ingest
    time (the shape `incremental_dedup`'s docstring promises):

    * one row per (doc_id, band_idx, band_hash) from the capped banded
      minhash, with the doc's content_md5 denormalized on;
    * PLUS one md5-carrier row per doc (band_idx = -1, band_hash NULL).
      The carrier is load-bearing, not redundancy: the per-bucket cap
      can evict a doc from EVERY band bucket (a hot bucket of other
      docs out-ranks it), and an index built from band rows alone would
      then lose that doc's md5 — flipping is_exact_dup vs the stateless
      form, which md5-scans ALL index docs (round-6 review, confirmed
      by live repro).  Carrier rows never join candidates: the band
      equi-join is on (band_idx, band_hash) and their NULL band_hash
      matches nothing.

    Write this partitioned by band_idx (carriers land in one slim
    partition) and each night's batch joins against it directly — the
    index side is never re-hashed.

    Cap note: the per-bucket cap is applied AT BUILD TIME with the
    same (band_idx, band_hash → first max_bucket doc_ids) rule the
    stateless `incremental_dedup` applies, so the two forms return
    identical answers (tested, including the cap-eviction case)."""
    sig = with_minhash_signature(docs, text_col, num_hashes, shingle_n)
    banded = banded_capped(
        sig, id_col, num_hashes, bands, max_bucket, keep_sig=False
    ).select(id_col, "band_idx", "band_hash")
    carriers = docs.select(
        F.col(id_col),
        F.lit(-1).alias("band_idx"),
        F.lit(None).cast("string").alias("band_hash"),
    )
    md5s = docs.select(
        F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("content_md5")
    )
    return banded.unionByName(carriers).join(md5s, id_col)


def update_dedup_index(
    index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Nightly index ROLL — merge a new batch into the stored dedup
    index and re-apply the bucket cap, WITHOUT re-hashing the index
    side.  Bit-identical to rebuilding from the union corpus (the
    registered query's gate is literally the full-rebuild oracle).

    Why the incremental form is exact: the build cap keeps each
    bucket's `max_bucket` LOWEST ids, so every id the old cap evicted
    is ≥ all ids it kept — the union's lowest `max_bucket` can never
    include an evicted id, hence
    ``cap(cap(A) ∪ B) == cap(A ∪ B)``
    (pinned by test with a forced-eviction bucket).  Per-roll cost is
    O(new) hashing + a re-cap shuffle that carries 32-byte band keys;
    carriers and md5s union through untouched.  At 100 TB this is the
    difference between a nightly job over the batch and one over the
    corpus."""
    new_index = build_dedup_index(
        new_docs, text_col, id_col, num_hashes, bands, shingle_n, max_bucket
    )
    merged = index.unionByName(new_index)
    band_rows = merged.filter(F.col("band_idx") >= 0)
    carriers = merged.filter(F.col("band_idx") < 0)
    cap_w = Window.partitionBy("band_idx", "band_hash").orderBy(id_col)
    capped = (
        band_rows.withColumn("_rn", F.row_number().over(cap_w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    return capped.unionByName(carriers)


def band_bloom_bits(
    index: DataFrame, m_bits: int = 1 << 18, k_hashes: int = 2
) -> DataFrame:
    """The SET-BIT table of a partitioned Bloom filter over the stored
    index's (band_idx, band_hash) keys — the prefilter side artifact a
    daily-ingest pipeline builds once per index version (VERDICT r6 #3).

    Partitioned-Bloom layout: hash ``s`` of ``k_hashes`` owns its own
    m-bit array; key → bit ``xxhash64(s, band_idx, band_hash) mod m``.
    Realized relationally as (salt, pos) rows — the idiomatic Spark
    form: the table is bounded by ``k_hashes × min(index bands, m)``
    rows ≤ k·m rows REGARDLESS of index size (set bits saturate, they
    don't grow), so it broadcasts at any corpus scale; membership
    checks become broadcast semi-joins, never a UDF or a driver-side
    bitmap.  (`bloom_filter_agg` exists in Spark's runtime-filter
    engine but is not SQL-registered in this build — this table form
    additionally keeps the filter storable/versionable next to the
    index, which the opaque binary sketch is not.)"""
    bands_df = index.filter(F.col("band_idx") >= 0).select(
        "band_idx", "band_hash"
    )
    parts = [
        bands_df.select(
            F.lit(s).alias("salt"),
            F.pmod(
                F.xxhash64(F.lit(s), "band_idx", "band_hash"), F.lit(m_bits)
            ).alias("pos"),
        )
        for s in range(k_hashes)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_prefilter_bands(
    banded: DataFrame,
    bloom_bits: DataFrame,
    m_bits: int = 1 << 18,
    k_hashes: int = 2,
) -> DataFrame:
    """Drop banded rows whose (band_idx, band_hash) CANNOT be in the
    index, per the partitioned Bloom filter `band_bloom_bits` built —
    the new-batch prefilter: most daily-crawl docs share no band with
    the index, and without this every one of them enters the band
    equi-join anyway (VERDICT r6 #3).

    One broadcast SEMI-join per hash, chained (survive = bit set in
    EVERY partition): all-JVM, no shuffle of the new side, and —
    because Bloom filters have no false negatives — bit-for-bit
    identical downstream verdicts whatever ``m_bits`` is (tested,
    including a saturated 2-bit filter where everything passes).
    False positives only waste a candidate-join probe that the exact
    verification stage rejects anyway.  Expected row reduction is
    1 − (set_bits/m)^k for absent keys; the measured sf0.01 number
    lives in SCALE.md."""
    for s in range(k_hashes):
        pos_s = F.pmod(
            F.xxhash64(F.lit(s), "band_idx", "band_hash"), F.lit(m_bits)
        )
        banded = banded.join(
            F.broadcast(
                bloom_bits.filter(F.col("salt") == s).select("pos")
            ),
            pos_s == F.col("pos"),
            "semi",
        )
    return banded


def incremental_dedup_indexed(
    new_docs: DataFrame,
    index: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
    cap_new: bool = True,
    bloom_m: int | None = None,
    bloom_k: int = 2,
) -> DataFrame:
    """`incremental_dedup` against a PRECOMPUTED index table — the form
    a daily-ingest pipeline actually runs (VERDICT r5 #4).

    `index` carries (doc_id, band_idx, band_hash, content_md5) as
    written by `build_dedup_index` (band rows + md5-carrier rows); only
    the NEW side is shingled, minhashed and banded here.  Per-batch
    cost is O(new) signature work + the capped band equi-join +
    O(candidates) verification: `index_docs` supplies candidate TEXT
    for the exact-Jaccard check via a semi-join on the candidate ids,
    so at 100 TB the index corpus is touched only for docs that
    actually collide.  The exact-dup check reads the index's stored
    content_md5 — no index text scan at all on that path.  Same output
    schema and (given `index = build_dedup_index(index_docs)` with
    matching parameters) bit-identical results to the stateless form.

    ``cap_new=False`` skips the NEW side's per-bucket cap (the index
    side keeps its build-time cap).  Two reasons to use it: (1) pair
    count stays bounded anyway — each new doc emits ≤ bands ×
    max_bucket candidate rows against the capped index, linear in the
    batch however hot the bucket; (2) it makes every new doc's verdict
    a pure function of (its own text, the static index) with NO
    cross-new-doc coupling, which is what lets the STREAMED
    micro-batched form equal the whole-batch form bit-for-bit (the
    per-batch cap would keep different survivors than a whole-set cap
    once a new-side bucket exceeds max_bucket — round-6 review)."""
    new_banded = banded_capped(
        with_minhash_signature(new_docs, text_col, num_hashes, shingle_n),
        id_col,
        num_hashes,
        bands,
        max_bucket if cap_new else None,
        keep_sig=False,
    ).select(F.col(id_col).alias("doc_a"), "band_idx", "band_hash")
    if bloom_m is not None:
        # ``bloom_m`` bits/partition enables the `bloom_prefilter_bands`
        # stage: new-side banded rows whose band key provably isn't in
        # the index skip the candidate join entirely.  Semantics-
        # preserving at ANY value (no false negatives), so the same
        # oracle gates both paths (VERDICT r6 #3).
        #
        # The bits table is MATERIALIZED before the per-salt broadcasts:
        # each of the k broadcast builds would otherwise re-execute the
        # whole index lineage (full minhash signatures when `index` is
        # an unmaterialized build_dedup_index plan) — the 25× probe
        # measured exactly that as a 1.24× superlinear slope, restored
        # to sublinear by this one checkpoint.  Output is bounded by
        # k × min(index bands, m) rows, so the materialization is
        # always cheap; in production the bits table is a STORED
        # artifact beside the index and this is a plain read.
        new_banded = bloom_prefilter_bands(
            new_banded,
            band_bloom_bits(index, bloom_m, bloom_k).localCheckpoint(),
            bloom_m,
            bloom_k,
        )

    cand = (
        new_banded.join(
            # band rows only; md5-carrier rows (NULL band_hash) cannot
            # match an equi-join key, the filter just keeps the plan
            # honest about it
            index.filter(F.col("band_idx") >= 0).select(
                F.col(id_col).alias("doc_b"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint()
    )
    # every doc's md5 is present thanks to the carrier rows — including
    # docs the build-time cap evicted from all band buckets
    idx_md5 = index.select("content_md5").distinct()
    return _verify_and_assemble(
        cand, new_docs, index_docs, idx_md5, text_col, id_col, shingle_n, threshold
    )


# ---------------------------------------------------------------------------
# Sliding duplicate-substring coverage (and its removal transform)


def _dup_islands(
    docs: DataFrame,
    gram_n: int,
    text_col: str,
    id_col: str,
    cross_doc_keep_first: bool = False,
) -> DataFrame:
    """Shared front half of the sliding-duplicate-substring family
    (coverage MEASUREMENT and span REMOVAL): every ``gram_n``-token
    window whose content occurs >1× in the corpus, merged per doc into
    numbered overlap islands.  Returns (id_col, _start, _end, _island)
    rows — one per duplicated window, island = gaps-and-islands group
    id over the doc's position axis.

    ``cross_doc_keep_first=False`` (the dup_span_removal /
    dup_ngram_coverage semantics): EVERY occurrence of a >1×-seen gram
    is an island member — within-doc self-repeats count, and all
    copies of a cross-doc repeat are marked.

    ``cross_doc_keep_first=True`` (the cross_doc_span_dedup / Lee et
    al. first-occurrence-keep semantics): each gram content elects a
    keeper document (min id); only occurrences in OTHER documents are
    island members, so exactly one document retains each repeated
    span (including all its own internal repeats of it) and grams
    repeated only within a single doc are untouched.

    Plan shape (all linear in corpus tokens — see
    with_dup_ngram_coverage's docstring for the full rationale):
    explode window starts → md5 each gram → map-side-combinable
    groupBy(gram md5) duplication count (keep-first mode: min/max doc
    id, same one-row-per-gram partial) + semi-join back (never a
    window over the hot hash; keep-first joins the (hash, keeper)
    table — only hashes actually spanning >= 2 docs survive the
    filter, so the join side stays the duplicated subset) →
    per-doc-keyed running-max-end island numbering."""
    end_off = gram_n - 1
    piece = f"concat_ws(' ', slice(__T__, _start, {gram_n}))"
    grams = (
        ensure_parallelism(docs)
        .withColumn("__T__", tokens(F.col(text_col)))
        .withColumn(
            "_starts",
            F.expr(
                f"CASE WHEN size(__T__) >= {gram_n} "
                f"THEN sequence(1, size(__T__) - {end_off}) "
                f"ELSE array() END"
            ),
        )
        .select(
            F.col(id_col),
            F.explode("_starts").alias("_start"),
            F.col("__T__"),
        )
        .select(
            id_col,
            "_start",
            F.md5(F.expr(piece).cast("binary")).alias("_h"),
        )
    )
    return _mark_and_islands(grams, id_col, end_off, cross_doc_keep_first)


def _mark_and_islands(
    grams: DataFrame,
    id_col: str,
    end_off: int,
    cross_doc_keep_first: bool,
) -> DataFrame:
    """Shared mark + island-numbering tail of the sliding-duplicate
    family, gram-source-agnostic (``grams`` = (id, _start, _h) rows
    from either the direct string builder in `_dup_islands` or the
    hash-doubling builder in `_doubling_grams` — the hash only ever
    feeds groupBy/join keys, so any content-injective construction
    works).  See `_dup_islands` for the mark-predicate semantics and
    the plan rationale."""
    if cross_doc_keep_first:
        keepers = (
            grams.groupBy("_h")
            .agg(
                F.min(id_col).alias("_keep_doc"),
                F.max(id_col).alias("_max_doc"),
            )
            .filter(F.col("_max_doc") > F.col("_keep_doc"))
            .select("_h", "_keep_doc")
        )
        dup = (
            grams.join(keepers, "_h")
            .filter(F.col(id_col) > F.col("_keep_doc"))
            .drop("_keep_doc")
        )
    else:
        dup_hashes = (
            grams.groupBy("_h")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .filter(F.col("_cnt") > 1)
            .select("_h")
        )
        dup = grams.join(dup_hashes, "_h", "semi")
    w = Window.partitionBy(id_col).orderBy("_start")
    return (
        dup.withColumn("_end", F.col("_start") + end_off)
        .withColumn(
            "_prev_max_end",
            F.max("_end").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "_new",
            (
                F.col("_prev_max_end").isNull()
                | (F.col("_start") > F.col("_prev_max_end"))
            ).cast("long"),
        )
        .withColumn("_island", F.sum("_new").over(w))
    )


def with_dup_ngram_coverage(
    docs: DataFrame,
    gram_n: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-substring coverage — the sliding-window
    strong form of exact substring dedup (the fixed-span `span_dedup`
    removes repeats; this MEASURES them at every offset, the signal
    substring-dedup pipelines threshold on): the fraction of a doc's
    token positions lying inside some ``gram_n``-token window whose
    content occurs more than once in the corpus (self-repeats inside
    one doc count — "duplicated anywhere" semantics).

    Output per doc: ``n_tokens``, ``n_dup_positions`` (exact union
    length of all duplicated windows), ``dup_frac``.  Docs shorter
    than ``gram_n`` tokens carry no window and report 0.

    Plan shape, all linear in corpus tokens:
    1. every window start explodes to one (doc, start, md5(gram)) row;
    2. duplication = ``groupBy(gram md5).count()`` filtered to cnt>1,
       semi-joined back on the md5 — the partial count combines
       map-side, so a boilerplate gram repeated across millions of
       docs reaches the exchange as one partial row per map task
       (a window over the gram hash would funnel every occurrence of
       the hot key through ONE task — the shape span_dedup's
       first-occurrence rule also avoids), and AQE's skew-join can
       split the hot key in the join back;
    3. the union length of overlapping windows is gaps-and-islands
       over (doc, start): an island starts where the window begins
       past the running max end; island length = max end − min start
       + 1; islands are per-doc-keyed windows, key-parallel.
    No pair expansion anywhere — cost is O(corpus positions), the same
    order as tokenizing the corpus."""
    islands = _dup_islands(docs, gram_n, text_col, id_col)
    per_doc = (
        islands.groupBy(id_col, "_island")
        .agg((F.max("_end") - F.min("_start") + 1).alias("_len"))
        .groupBy(id_col)
        .agg(F.sum("_len").alias("n_dup_positions"))
    )
    base = docs.select(
        id_col, F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    zero = F.lit(0).cast("long")
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("n_dup_positions"), zero).alias("n_dup_positions"),
        (
            F.coalesce(F.col("n_dup_positions"), zero)
            / F.col("n_tokens").cast("double")
        ).alias("dup_frac"),
    )


def dup_span_removal(
    docs: DataFrame,
    gram_n: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring REMOVAL — the Lee-et-al.
    ("Deduplicating Training Data Makes Language Models Better")
    transform `with_dup_ngram_coverage` only measures: cut every token
    position lying inside some ``gram_n``-token window whose content
    occurs more than once in the corpus, reassemble the survivors in
    order (VERDICT r6 #2 — the production substring-dedup deliverable).

    Output per doc: ``n_tokens``, ``n_removed_tokens`` (exact union
    length of all duplicated windows — 0 for untouched docs),
    ``cleaned_md5`` = md5 of the space-joined surviving tokens (the
    empty string's md5 when the whole doc is duplicated).  The hash —
    not the cleaned text itself — keeps the gate row narrow; callers
    wanting the text take the same plan minus the md5.

    Plan shape: the shared `_dup_islands` stage (linear, no hot-key
    window, no pairs) → per-doc interval list via one (doc, island)
    groupBy then one doc groupBy collecting (lo, hi) structs — islands
    per doc is small by construction (merged overlaps), so the
    collected array is bounded by the doc's own length, never the
    corpus — → one broadcast-free equi-join back to the docs scan →
    scan-side array rebuild (`filter(transform(...))`, the
    bpe_merge_round idiom): keep token i iff no island covers it.
    Everything after the island stage is key-parallel or per-row;
    O(corpus tokens × islands-per-doc) worst case, and islands-per-doc
    is ≤ tokens/gram_n."""
    islands = _dup_islands(docs, gram_n, text_col, id_col)
    return _remove_islands(docs, islands, text_col, id_col)


def cross_doc_span_dedup(
    docs: DataFrame,
    gram_n: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CROSS-DOCUMENT repeated-substring removal with first-occurrence
    keep — the Lee-et-al. "Deduplicating Training Data Makes Language
    Models Better" ExactSubstr pass in the form C4/Pile-style cleanups
    run it (VERDICT r10 #3): any ``gram_n``-token span whose content
    also occurs in ANOTHER document is cut from every document except
    one elected keeper (min doc id), so the corpus retains exactly one
    copy of each repeated span instead of zero.  Contrast
    `dup_span_removal`, which cuts ALL copies (and within-doc
    self-repeats): here the keeper doc keeps the span — including its
    own internal repeats of it — and a span repeated only inside one
    document is untouched; this is the variant whose output is still a
    complete training corpus rather than a repeat-free residue.

    Output per doc (same contract as dup_span_removal): ``n_tokens``,
    ``n_removed_tokens``, ``cleaned_md5``.

    Plan shape: the `_dup_islands` keep-first stage — gram-hash
    postings reduced to ONE (hash, keeper-doc) row each via
    map-side-combinable min/max, filtered to hashes spanning >= 2
    docs, equi-joined back (never a window over the hot hash; a
    boilerplate gram repeated across millions of docs reaches the
    exchange as one partial row per map task) — then the shared
    island-merge + scan-side token rebuild.  O(corpus tokens), no pair
    expansion; AQE's skew-join splits any hot gram hash in the join
    back."""
    islands = _dup_islands(
        docs, gram_n, text_col, id_col, cross_doc_keep_first=True
    )
    return _remove_islands(docs, islands, text_col, id_col)


def _doubling_grams(
    docs: DataFrame,
    span_len: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, _start, _h) rows for every ``span_len``-token window —
    the LONG-gram replacement for `_dup_islands`' direct string
    builder, via per-row HASH DOUBLING (the sparse-table / prefix-
    doubling idea suffix-array construction uses):

      level 0:   L0[i] = md5(token_i)                 (window 1)
      level k+1: L(k+1)[i] = md5(L_k[i] ++ L_k[i+2^k]) (window 2^(k+1))
      span hash: with 2^a <= span_len, the window [i, i+span_len) is
                 md5(L_a[i] ++ L_a[i + span_len - 2^a]) — two
                 OVERLAPPING 2^a-windows whose union is exactly the
                 span, so equal span content <=> equal hash (modulo
                 md5 collisions, the repo-wide equality convention).

    Cost model (MEASURED, see long_span_dedup's docstring): doubling
    does O(tokens x log2 span) fixed-width md5s per doc, the direct
    builder O(windows x span) token copies + one md5 per window where
    windows = n - span + 1.  On short web docs (n ~ span) the direct
    builder wins decisively — few windows survive, while doubling
    still pays every level at every position (measured 10x slower at
    span 50 on the 54-token-median corpus).  Doubling pays off only
    for long documents with large spans (windows ~ positions AND
    md5-of-span-tokens >> log2(span) fixed-width md5s).  Every level
    is a per-row array transform inside one projection (whole-stage
    codegen, NO shuffle); the only exchange remains the downstream
    gram-hash groupBy.  Hash values only ever feed groupBy/join keys,
    never output, so swapping the construction is output-invariant
    (parity-tested against the direct builder in
    tests/test_fuzz_parity.py)."""
    a = span_len.bit_length() - 1  # floor(log2(span_len))
    off = span_len - (1 << a)
    df = (
        ensure_parallelism(docs)
        .withColumn("__T__", tokens(F.col(text_col)))
        .withColumn(
            "_L0", F.expr("transform(__T__, t -> md5(CAST(t AS binary)))")
        )
    )
    for k in range(a):
        w = 1 << k
        # L(k+1) has size(Lk) - w entries; guard keeps sequence() from
        # descending when the doc is shorter than the window (ANSI)
        df = df.withColumn(
            f"_L{k + 1}",
            F.expr(
                f"CASE WHEN size(_L{k}) > {w} THEN "
                f"transform(sequence(1, size(_L{k}) - {w}), i -> "
                f"md5(CAST(concat(element_at(_L{k}, i), "
                f"element_at(_L{k}, i + {w})) AS binary))) "
                "ELSE CAST(array() AS array<string>) END"
            ),
        )
    top = f"_L{a}"
    gram = (
        f"CASE WHEN size(__T__) >= {span_len} THEN "
        f"transform(sequence(1, size(__T__) - {span_len - 1}), i -> "
        f"struct(i AS _start, "
        f"md5(CAST(concat(element_at({top}, i), "
        f"element_at({top}, i + {off})) AS binary)) AS _h)) "
        "ELSE CAST(array() AS array<struct<_start:int,_h:string>>) END"
    )
    return df.select(
        F.col(id_col), F.explode(F.expr(gram)).alias("_g")
    ).select(id_col, F.col("_g._start").alias("_start"), F.col("_g._h").alias("_h"))


def long_span_dedup(
    docs: DataFrame,
    span_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    builder: str = "direct",
) -> DataFrame:
    """Cross-document repeated-substring removal with first-occurrence
    keep at the Lee-et-al. ExactSubstr PRODUCTION length (>= 50
    tokens; "Deduplicating Training Data Makes Language Models
    Better" §4 removes repeats of 50+ BPE tokens) — semantically
    `cross_doc_span_dedup` with ``gram_n = span_len``.

    ``builder`` selects the gram-hash construction; both are
    output-identical (parity-fuzzed across span lengths):

    * ``"direct"`` (default): the family's window-string builder.
      MEASURED WINNER on web-shaped corpora: 6.9 s vs doubling's
      74.5 s at the x25 probe (warm, span 50).  The intuition that
      span-50 strings blow up 50x is wrong on short docs — a doc of n
      tokens has only n-span+1 windows, so the intermediate is
      (n-span+1) x span tokens/doc (~250 for the 54-token median web
      doc, i.e. ~5x the doc, shrinking as spans grow), and each
      window costs one concat + ONE md5.

    * ``"doubling"``: `_doubling_grams`' O(tokens x log2 span) hash
      doubling.  Pays ~log2(span) md5s PER TOKEN POSITION regardless
      of how few long windows survive (324 md5s/doc at n=54, span 50
      — 60x the direct builder's hash work on this corpus) plus the
      materialized level arrays.  It wins only when BOTH the doc is
      long (n >> span, so windows ~ positions) and the span is large
      enough that md5-of-span-tokens dominates log2(span) fixed-width
      md5s — around span ~hundreds on book-length docs.  Kept as the
      documented long-doc escape hatch, not the default.

    Output per doc (the family contract): ``n_tokens``,
    ``n_removed_tokens``, ``cleaned_md5``."""
    if builder not in ("direct", "doubling"):
        # ADVICE r12: a typo like builder='doubing' must not silently
        # run the wrong gram builder — output parity would hide it but
        # any timing comparison the caller intended is invalidated.
        raise ValueError(
            f"long_span_dedup: unknown builder {builder!r} "
            "(expected 'direct' or 'doubling')"
        )
    if builder == "doubling":
        grams = _doubling_grams(docs, span_len, text_col, id_col)
        islands = _mark_and_islands(
            grams, id_col, span_len - 1, cross_doc_keep_first=True
        )
        return _remove_islands(docs, islands, text_col, id_col)
    return cross_doc_span_dedup(docs, gram_n=span_len, text_col=text_col, id_col=id_col)


def _remove_islands(
    docs: DataFrame,
    islands: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Shared back half of the span-removal family: merged-island rows
    → per-doc (lo, hi) interval arrays → one equi-join back to the docs
    scan → scan-side token rebuild → (id, n_tokens, n_removed_tokens,
    cleaned_md5) rows.  See dup_span_removal's docstring for the full
    plan rationale."""
    per_doc = (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("_start").cast("long").alias("_lo"),
            F.max("_end").cast("long").alias("_hi"),
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_lo"), F.col("_hi")))
            ).alias("_isl"),
            F.sum(F.col("_hi") - F.col("_lo") + 1).alias("_n_removed"),
        )
    )
    base = docs.select(id_col, text_col).withColumn(
        "__T__", tokens(F.col(text_col))
    )
    rebuilt = (
        base.join(per_doc, id_col, "left")
        .withColumn(
            "_isl",
            F.coalesce(
                F.col("_isl"),
                F.expr("CAST(array() AS array<struct<_lo:bigint,_hi:bigint>>)"),
            ),
        )
        .withColumn(
            "_surv",
            F.expr(
                "filter(transform(sequence(1, size(__T__)), i -> "
                "CASE WHEN exists(_isl, s -> i >= s._lo AND i <= s._hi) "
                "THEN NULL ELSE element_at(__T__, i) END), x -> x IS NOT NULL)"
            ),
        )
    )
    zero = F.lit(0).cast("long")
    return rebuilt.select(
        id_col,
        F.size("__T__").cast("long").alias("n_tokens"),
        F.coalesce(F.col("_n_removed"), zero).alias("n_removed_tokens"),
        F.md5(F.concat_ws(" ", "_surv").cast("binary")).alias("cleaned_md5"),
    )


def cdc_chunk_dedup(
    docs: DataFrame,
    gram_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (FastCDC-style) + chunk-level corpus
    dedup — the insertion-robust complement to `span_dedup`'s FIXED
    spans: a token starts a new chunk iff its ``gram_n``-token gram's
    md5 opens with nibble 0 (probability 1/16 → ~16-token expected
    chunks).  Because boundaries are functions of LOCAL content, an
    insertion reshapes only the chunk it lands in — every chunk
    downstream keeps its exact text and md5 (property-tested), which is
    why storage/dedup systems chunk this way instead of at fixed
    offsets.

    Output one row per chunk: (doc_id, chunk_idx, n_tokens, chunk_md5,
    n_dups = corpus-wide occurrence count of the chunk content).

    Scale shape: boundary flags are computed in let-bound array algebra
    (O(tokens) per doc), exploded as slim (pos, token, flag) rows via
    arrays_zip (never duplicating the token array per row), chunk ids
    are a running flag sum over a PER-DOC window (key-parallel), chunks
    assemble with one (doc, chunk) groupBy, and the duplicate count is
    a map-side-combinable groupBy(chunk_md5) joined back — the same
    no-window-over-the-hot-hash discipline as span_dedup and
    dup_ngram_coverage.  Everything is linear in corpus tokens."""
    flags_expr = (
        f"transform(array(split({text_col}, ' ')), TK -> "
        f"transform(sequence(1, size(TK)), j -> named_struct("
        "'tok', element_at(TK, j), "
        "'flag', CASE WHEN j > 1 AND j <= size(TK) - "
        f"{gram_n - 1} AND instr('{HEX}', substring("
        f"md5(concat_ws(' ', slice(TK, j, {gram_n}))), 1, 1)) = 1 "
        "THEN 1 ELSE 0 END)))[0]"
    )
    pos = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col),
            F.posexplode(F.expr(flags_expr)).alias("_j0", "_s"),
        )
        .select(
            id_col,
            (F.col("_j0") + 1).alias("_j"),
            F.col("_s.tok").alias("_tok"),
            F.col("_s.flag").alias("_flag"),
        )
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("_j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cids = pos.withColumn("_cid", F.sum("_flag").over(w))
    chunks = (
        cids.groupBy(id_col, "_cid")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.concat_ws(
                " ",
                F.expr("transform(array_sort(collect_list(struct(_j, _tok))), s -> s._tok)"),
            ).alias("_ctext"),
        )
        .select(
            id_col,
            F.col("_cid").cast("long").alias("chunk_idx"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.md5(F.col("_ctext").cast("binary")).alias("chunk_md5"),
        )
    )
    counts = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("n_dups")
    )
    return chunks.join(counts, "chunk_md5").select(
        id_col, "chunk_idx", "n_tokens", "chunk_md5", F.col("n_dups").cast("long").alias("n_dups")
    )


def image_text_pair_dedup(
    pairs: DataFrame,
    image_key_col: str = "image_key",
    caption_key_col: str = "caption_key",
    id_col: str = "pair_id",
) -> DataFrame:
    """Cross-modal (image, caption) PAIR curation — LLM training data
    ships pairs, and per-modality dedup alone is the wrong unit
    (VERDICT r8 ask #7): a popular image crawled under 50 captions and
    a meme caption pasted on 50 images both survive single-modality
    passes.  Two sequential greedy keeper rounds over the pair table:

      1. ONE CAPTION PER IMAGE CLUSTER — group pairs by the image's
         cluster key (perceptual hash: identical/near-identical
         pixels), keep the min-``id_col`` pair; the rest are
         ``dup_image`` (same picture, redundant caption variants).
      2. ONE IMAGE PER CAPTION CLUSTER — group the SURVIVORS by the
         caption's cluster key (normalized-text hash), keep the
         min-id pair; the rest are ``dup_caption`` (same caption
         pasted on different pictures).

    Sequential (not simultaneous AND) on purpose: a joint
    both-cluster-keeper rule can drop EVERY pair of a cluster whose
    min-ids disagree, losing content; greedy round order is the
    standard LAION-style curation shape and guarantees each image
    cluster that enters keeps ≥ 0 and each caption cluster among
    stage-1 survivors keeps exactly 1.

    Output: every input pair with ``status`` ∈ ('kept', 'dup_image',
    'dup_caption') — an audit table, so the drop REASON is attestable,
    not just the kept set.

    Scale shape: two groupBy(min)+equi-join rounds, both
    map-side-combinable; shuffles carry (hash key, pair id) — media
    payloads and caption text never enter an Exchange.  A viral image
    (10⁶ captions) or meme caption is a grouped min and a join key,
    never a window partition."""
    img_keep = pairs.groupBy(image_key_col).agg(F.min(id_col).alias("_ikeep"))
    s1 = pairs.join(img_keep, image_key_col)
    survivors = s1.filter(F.col(id_col) == F.col("_ikeep")).drop("_ikeep")
    dropped1 = (
        s1.filter(F.col(id_col) != F.col("_ikeep"))
        .drop("_ikeep")
        .withColumn("status", F.lit("dup_image"))
    )
    cap_keep = survivors.groupBy(caption_key_col).agg(
        F.min(id_col).alias("_ckeep")
    )
    s2 = survivors.join(cap_keep, caption_key_col)
    out_cols = [id_col, image_key_col, caption_key_col, "status"]
    kept = (
        s2.withColumn(
            "status",
            F.when(F.col(id_col) == F.col("_ckeep"), "kept").otherwise(
                "dup_caption"
            ),
        )
        .drop("_ckeep")
    )
    return kept.select(*out_cols).unionByName(dropped1.select(*out_cols))


def corpus_overlap_kmv(
    docs: DataFrame,
    k: int = 64,
    shingle_n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Pairwise corpus-overlap estimation between sources with a
    bottom-k (KMV) sketch — the "how much does dump N share with dump
    N−1 / does dataset A leak into dataset B" audit every multi-source
    training mix runs before choosing mixture weights.

    Per group, the sketch is the k lexicographically-smallest md5
    hashes of its DISTINCT word shingles (min-of-uniform-hash, the
    MinHash argument; hex strings so the DuckDB oracle is verbatim).
    For a pair (A, B) the Jaccard estimate is the bottom-k rule
    [Bar-Yossef et al. 2002]:

        est = |{h ∈ bottom_k(A ∪ B) : h ∈ A and h ∈ B}| / min(k, |A ∪ B|)

    EXACT per-pair intersection/union counts over the full distinct-
    shingle sets ride along as audit columns (the ann_recall
    convention: the sketch's error is value-pinned, not asserted
    away), so the output shows estimate, truth, and |est − exact|.

    Scale shape: ONE distinct over (group, shingle-hash) — corpus-wide
    but map-side combinable.  The per-group bottom-k is TWO-PHASE to
    avoid a corpus-scale single-task window: phase 1 takes bottom-k
    within each (group, 2-hex-prefix bucket) — 256 parallel windows
    per group — and phase 2 takes bottom-k of the ≤256·k survivors;
    exactly equal to the global bottom-k because every global bottom-k
    element is inside its bucket's bottom-k.  Pair assembly joins the
    driver-scale group list (one row per source, the mixture-table
    contract) twice on equality; the exact-audit join is an equi-join
    on the hash key.  All downstream tables are (groups² × k)-bounded."""
    from pyspark.sql import Window

    n = shingle_n
    idx = ", ".join(f"element_at(TK, i + {j})" for j in range(n))
    # let-bound tokenization (the with_minhash_signature binder): split
    # evaluates once per row, not once per shingle position reference.
    # md5 runs INSIDE the row-local lambda and duplicates collapse
    # row-locally (array_distinct) BEFORE the explode, so only 32-char
    # hashes ever leave the row — exploding raw shingle strings into
    # the distinct shuffle measured 152 s vs 35 s at the 25× probe.
    sh_expr = (
        f"transform(array(split({text_col}, ' ')), TK -> "
        f"CASE WHEN size(TK) >= {n} "
        f"THEN transform(sequence(1, size(TK) - {n - 1}), "
        f"i -> md5(concat_ws(' ', {idx}))) "
        f"ELSE array(md5(concat_ws(' ', TK))) END)[0]"
    )
    # the distinct (group, hash) table feeds FOUR consumers (the
    # sketch, per-group sizes, and both sides of the exact-audit
    # join): materialize it ONCE — unmaterialized, Spark recomputes
    # the corpus-scale explode+distinct per consumer and the audit
    # self-join sorts raw lineage (measured 1.59× linear at the 25×
    # probe before this cut).  Production stores this table anyway —
    # it IS the per-source shingle index.
    ckpt = make_checkpointer(docs.sparkSession, checkpoint_dir)
    sh = ckpt(
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(F.expr(f"array_distinct({sh_expr})")).alias("h"),
        ).distinct()
    )

    w_bucket = Window.partitionBy("g", F.substring("h", 1, 2)).orderBy("h")
    w_group = Window.partitionBy("g").orderBy("h")
    sig = (
        sh.withColumn("_brn", F.row_number().over(w_bucket))
        .filter(F.col("_brn") <= k)
        .withColumn("_rn", F.row_number().over(w_group))
        .filter(F.col("_rn") <= k)
        .select("g", "h")
    )

    groups = sh.select("g").distinct()
    pairs = (
        groups.alias("ga")
        .join(
            groups.alias("gb"),
            F.col("ga.g") < F.col("gb.g"),
        )
        .select(F.col("ga.g").alias("src_a"), F.col("gb.g").alias("src_b"))
    )

    u = (
        pairs.join(sig.alias("sa"), F.col("sa.g") == F.col("src_a"))
        .select("src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(sig.alias("sb"), F.col("sb.g") == F.col("src_b")).select(
                "src_a",
                "src_b",
                "h",
                F.lit(0).alias("in_a"),
                F.lit(1).alias("in_b"),
            )
        )
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w_pair = Window.partitionBy("src_a", "src_b").orderBy("h")
    est = (
        u.withColumn("_rn", F.row_number().over(w_pair))
        .filter(F.col("_rn") <= k)
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("k_eff"),
            F.sum(
                (F.col("in_a") * F.col("in_b")).cast("long")
            ).alias("n_common_sig"),
        )
    )

    sizes = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("xa")
        .join(sh.alias("xb"), F.col("xa.h") == F.col("xb.h"))
        .filter(F.col("xa.g") < F.col("xb.g"))
        .groupBy(F.col("xa.g").alias("src_a"), F.col("xb.g").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_exact_inter"))
    )

    out = (
        est.join(sizes.withColumnRenamed("g", "src_a"), "src_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("g", "src_b"), "src_b")
        .withColumnRenamed("n_sh", "n_b")
        .join(inter, ["src_a", "src_b"], "left")
        .withColumn("n_exact_inter", F.coalesce("n_exact_inter", F.lit(0)))
    )
    return out.select(
        "src_a",
        "src_b",
        "k_eff",
        "n_common_sig",
        (F.col("n_common_sig").cast("double") / F.col("k_eff").cast("double")).alias(
            "est_jaccard"
        ),
        "n_a",
        "n_b",
        "n_exact_inter",
        (
            F.col("n_exact_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_exact_inter")).cast("double")
        ).alias("exact_jaccard"),
    ).withColumn(
        "est_abs_err",
        F.abs(F.col("est_jaccard") - F.col("exact_jaccard")),
    )


LSH_PLAN_SCALE = 1_000_000_000


def lsh_band_plan(
    sims: DataFrame,
    n_hashes: int = 128,
    n_bins: int = 20,
    target_num: int = 4,
    target_den: int = 5,
    sim_col: str = "jaccard",
) -> DataFrame:
    """LSH band/row planner — choose (bands b, rows-per-band r) with
    b·r = ``n_hashes`` against the corpus's OBSERVED pair-similarity
    distribution, the tuning step that decides whether a 100 TB
    MinHash dedup over- or under-merges before anyone runs it.

    Input: a DataFrame of pair similarities (e.g. the deterministic
    sampled all-pairs of ngram_jaccard — unbiased sub- and supra-
    threshold mass, which LSH candidates cannot give).  The sims are
    binned into ``n_bins`` equal-width buckets (INT counts); for each
    bucket midpoint s and each (b, r) the S-curve collision
    probability

        p(s; b, r) = 1 − (1 − s^r)^b

    is evaluated by LEFT-FOLD multiplication (``aggregate(sequence(…),
    1.0, (acc, _) → acc·s)``) — repeated exact-rounded multiplies in a
    fixed order, bit-identical in DuckDB's list_reduce, where libm
    ``pow`` would not be — then floor-scaled to the 1e9 integer grid.
    Expected mis-bucketing mass vs the target threshold t =
    ``target_num/target_den``:

        fp_mass = Σ_{s<t} w(s)·p_scaled(s)          (merges it shouldn't)
        fn_mass = Σ_{s≥t} w(s)·(1e9 − p_scaled(s))  (misses it should merge)

    — INT64 sums, no float addition order.  The chosen config is the
    cost argmin (ties → fewer bands, i.e. cheaper).

    Scale shape: ONE aggregation over the sims (n_bins rows out), a
    constant 8-row divisor grid broadcast, and window/agg over ≤
    n_bins·|grid| rows — the planner costs nothing beyond its input
    sample, whatever the corpus size."""
    from pyspark.sql import Window

    t_lo = float(target_num) / float(target_den)
    grid_rows = []
    r = 1
    while r <= n_hashes:
        if n_hashes % r == 0:
            grid_rows.append((n_hashes // r, r))
        r *= 2
    spark = sims.sparkSession
    grid = spark.createDataFrame(grid_rows, "n_bands int, rows_per_band int")

    bins = (
        sims.select(
            F.least(
                F.floor(F.col(sim_col) * n_bins).cast("long"), F.lit(n_bins - 1)
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn(
            "s_mid",
            (2 * F.col("bin") + 1).cast("double") / F.lit(float(2 * n_bins)),
        )
    )
    scored = (
        bins.crossJoin(F.broadcast(grid))
        .withColumn(
            "_sr",
            F.expr(
                "aggregate(sequence(1, rows_per_band), cast(1.0 as double), "
                "(acc, x) -> acc * s_mid)"
            ),
        )
        .withColumn(
            "_miss",
            F.expr(
                "aggregate(sequence(1, n_bands), cast(1.0 as double), "
                "(acc, x) -> acc * (1.0 - _sr))"
            ),
        )
        .withColumn(
            "p_scaled",
            F.expr(f"CAST(floor((1.0 - _miss) * {LSH_PLAN_SCALE}) AS BIGINT)"),
        )
    )
    agg = scored.groupBy("n_bands", "rows_per_band").agg(
        F.sum(
            F.when(F.col("s_mid") < t_lo, F.col("w") * F.col("p_scaled")).otherwise(
                F.lit(0)
            )
        ).alias("fp_mass_scaled"),
        F.sum(
            F.when(
                F.col("s_mid") >= t_lo,
                F.col("w") * (F.lit(LSH_PLAN_SCALE) - F.col("p_scaled")),
            ).otherwise(F.lit(0))
        ).alias("fn_mass_scaled"),
        F.sum("w").alias("n_pairs"),
    )
    w_rank = Window.orderBy(
        (F.col("fp_mass_scaled") + F.col("fn_mass_scaled")).asc(),
        F.col("n_bands").asc(),
    )
    return (
        agg.withColumn(
            "cost_scaled", F.col("fp_mass_scaled") + F.col("fn_mass_scaled")
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .withColumn("chosen", F.col("rank") == 1)
        .select(
            "n_bands",
            "rows_per_band",
            "n_pairs",
            "fp_mass_scaled",
            "fn_mass_scaled",
            "cost_scaled",
            "rank",
            "chosen",
        )
    )


def line_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dolma-style paragraph/line-level exact dedup: keep only the
    globally FIRST occurrence of each distinct line (lowest
    (doc_id, line_idx)) and reassemble — span_dedup's sibling with
    NATURAL boundaries (newlines) instead of fixed token windows, the
    form Dolma/RefinedWeb run to strip navigation chrome and repeated
    boilerplate paragraphs from a crawl without dropping documents.

    Output per input doc: (doc_id, n_lines, n_kept, clean_text).
    NULL text coalesces to '' (one empty line) so the doc keeps its
    output row — posexplode of a null split would silently DROP the
    doc_id, a row-count change downstream joins don't expect
    (ADVICE r10).

    Scale shape — identical to span_dedup's mega-bucket-proof plan: a
    boilerplate line repeated across millions of pages reduces via
    groupBy(md5(line)).agg(min(coords)) map-side partials, never one
    window task sorting the hot key; line TEXT travels only on
    well-distributed keys ((doc, idx) keep-flag join, per-doc
    reassembly)."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line_idx", "line"),
    ).withColumn("_h", F.md5(F.col("line").cast("binary")))
    meta = lines.select(id_col, "line_idx", "_h")
    firsts = meta.groupBy("_h").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("line_idx").alias("i"))
        ).alias("_first")
    )
    kept_meta = meta.join(firsts, "_h").select(
        id_col,
        "line_idx",
        (
            (F.col("_first.d") == F.col(id_col))
            & (F.col("_first.i") == F.col("line_idx"))
        ).alias("_keep"),
    )
    flagged = lines.drop("_h").join(kept_meta, [id_col, "line_idx"])
    kept_struct = F.when(
        F.col("_keep"),
        F.struct(F.col("line_idx").alias("i"), F.col("line").alias("s")),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .select(
            id_col,
            "n_lines",
            "n_kept",
            F.array_join(F.expr("transform(_kept, x -> x.s)"), "\n").alias(
                "clean_text"
            ),
        )
    )
