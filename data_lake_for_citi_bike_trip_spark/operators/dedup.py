"""Deduplication operators for large-scale training-data pipelines.

Five strategies over the ``documents`` / ``embeddings`` tables, all
expressed as declarative DataFrame plans (no UDFs):

- exact         — content-hash groupBy. One shuffle on a 16-byte key.
- minhash_lsh   — shingle -> 16-perm min-hash -> 4 banded buckets ->
                  bucket self-join -> signature-similarity filter. The
                  standard near-dup pipeline: candidate generation is a
                  hash join on band keys, never an all-pairs product.
- simhash       — 32-bit SimHash; candidates from half-signature bands,
                  verified by hamming distance <= k.
- ngram_jaccard — exact Jaccard via shingle-posting self-join (the
                  verify-stage companion to minhash_lsh).
- embedding     — cosine near-dup via sign-bucket LSH + in-bucket pairs.

Scale notes (100 TB): every self-join here keys on a *bucket/posting*
value, so work concentrates where candidates are; the known failure mode
is hot shingles/buckets (stop-gram skew) — at production scale add a
frequency cap on posting lists (drop shingles appearing in > X% of docs)
before the join; AQE skew-join splitting is enabled as a backstop.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import cached

from ..functions import text as TX
from ..functions import vectors as V
from ..session import spread
from .skew import salted_candidates


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Content-hash dedup summary: one row per distinct text with its copy
    count and the survivor (min doc_id)."""
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.min("doc_id").alias("survivor_doc_id"),
        )
    )


def _signatures(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Per-doc minhash signature: explode shingles, md5 once per shingle,
    derive all permutations via (a_i*h + b_i) mod p, aggregate mins. Docs
    with fewer than ``shingle_n`` words have no shingles and drop out
    (they can't be near-dup candidates)."""
    # two-step tokenize->shingle-the-attribute + explode_outer: a plain
    # explode over the inline expression re-inlines the whole shingle
    # tree into an inferred per-row size()>0 Filter (see shingles_of)
    toks = spread(docs).select("doc_id", TX.tokens(F.col("text")).alias("w"))
    postings = toks.select(
        "doc_id", F.explode_outer(TX.shingles_of(F.col("w"), shingle_n)).alias("s")
    ).where(F.col("s").isNotNull())
    hashed = postings.select("doc_id", TX.token_hash32(F.col("s")).alias("h"))
    return hashed.groupBy("doc_id").agg(*TX.minhash_agg_columns(F.col("h")))


def _band_table(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_no, key) — one row per banded slice of a signature."""
    sig_cols = [F.col(f"mh_{i}") for i in range(TX.MINHASH_PERMS)]
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        TX.band_key(sig_cols, b).alias("key"),
                    )
                    for b in range(TX.MINHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_no", "band.key")


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, shingle_n: int = 3
) -> DataFrame:
    """Candidate pairs from banded LSH, scored by estimated Jaccard
    (fraction of matching min-hashes), filtered at ``threshold``.

    SIGNATURE COLLAPSE (same argument as simhash_pairs_from_signatures):
    every output column is a function of the two SIGNATURES, so docs
    with identical signature vectors are interchangeable — banding,
    candidate dedup, and permutation-match scoring run once per UNIQUE
    signature, signature pairs expand to member doc pairs, and
    intra-signature pairs emit directly at est_jaccard exactly 1.0
    (every permutation matches itself). Without the collapse a whale
    duplicate-group re-emits its C(m,2) pairs through every band into
    the distinct() and re-scores each with MINHASH_PERMS comparisons —
    measured SUPER-linear in output (whale 10.5k->21k copies: 4x the
    pairs, 8.7x the time, 51.4s), while the collapsed form stays
    output-proportional (1.6x, 7.1s). The collapse's toy-scale
    overhead (VERDICT r10 item 2) is recovered two ways: ``reps`` is
    cached (the groupBy ran four times per plan — banding, both score
    sides, expansion — now once), and member expansion + intra
    emission flow only through gsz>1 groups (``dup_members``, empty on
    a duplicate-free corpus) with left-join+coalesce restoring
    singleton reps — so the no-dup path no longer re-shuffles every
    doc_id twice.
    The collapse key is md5 over the comma-joined signature ints —
    injective on the tuple (fixed count, unambiguous encoding), the
    same 128-bit-collision posture as exact_duplicates' md5 on text.
    Intra emission is salted (_salted_intra_pairs) so the whale's
    contract output parallelizes."""
    sig_cols = [f"mh_{i}" for i in range(TX.MINHASH_PERMS)]
    keyed = cached(
        _signatures(docs, shingle_n)
        .withColumn("skey", F.md5(F.concat_ws(",", *sig_cols)))
    )
    # reps is consumed FOUR times (banding, both score sides, member
    # expansion) — cached, the collapse groupBy runs once per plan
    # instead of four times (VERDICT r10 item 2: the collapse's
    # toy-scale overhead was mostly this recomputation).
    reps = cached(
        keyed.groupBy("skey").agg(
            F.min("doc_id").alias("doc_id"),
            # group members share byte-identical signatures; min() of an
            # all-equal column is that value. The member count rides the
            # same aggregation for free; it gates the intra-pair salt.
            F.count(F.lit(1)).alias("gsz"),
            *[F.min(c).alias(c) for c in sig_cols],
        )
    )
    # Only MULTI-doc signature groups need member rows: a singleton's
    # rep IS its sole member, so expansion is the identity and intra
    # emission is empty. dup_members is near-empty on a duplicate-free
    # corpus, so the expansion joins and the intra stage cost nothing
    # there instead of re-shuffling every doc_id.
    dup_members = keyed.join(
        reps.where(F.col("gsz") > 1).select(
            "skey", F.col("doc_id").alias("rep"), "gsz"
        ),
        "skey",
    ).select("rep", "doc_id", "gsz")
    bands = _band_table(reps)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("r1"), F.col("b.doc_id").alias("r2"))
        .distinct()
    )
    sa = reps.select(F.col("doc_id").alias("r1"), *[F.col(c).alias(f"a_{i}") for i, c in enumerate(sig_cols)])
    sb = reps.select(F.col("doc_id").alias("r2"), *[F.col(c).alias(f"b_{i}") for i, c in enumerate(sig_cols)])
    matches = reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
            for i in range(TX.MINHASH_PERMS)
        ],
    )
    rep_pairs = (
        cand.join(sa, "r1")
        .join(sb, "r2")
        .select(
            "r1",
            "r2",
            (matches.cast("double") / TX.MINHASH_PERMS).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )
    # Expand rep pairs to member pairs through the DUP groups only: a
    # rep absent from dup_members is a singleton (its own sole member),
    # restored by the left join + coalesce without moving the full
    # corpus. Groups are disjoint, so least/greatest restores the
    # global d1 < d2 contract.
    ma = dup_members.select(F.col("rep").alias("r1"), F.col("doc_id").alias("m1"))
    mb = dup_members.select(F.col("rep").alias("r2"), F.col("doc_id").alias("m2"))
    m1 = F.coalesce(F.col("m1"), F.col("r1"))
    m2 = F.coalesce(F.col("m2"), F.col("r2"))
    inter = (
        rep_pairs.join(ma, "r1", "left")
        .join(mb, "r2", "left")
        .select(
            F.least(m1, m2).alias("d1"),
            F.greatest(m1, m2).alias("d2"),
            "est_jaccard",
        )
    )
    intra = (
        _salted_intra_pairs(dup_members, "rep", "doc_id", size_col="gsz")
        .select(
            F.col("id_a").alias("d1"),
            F.col("id_b").alias("d2"),
            F.lit(1.0).alias("est_jaccard"),
        )
        .where(F.lit(1.0) >= threshold)
    )
    return inter.unionByName(intra)


def simhash_docs(docs: DataFrame) -> DataFrame:
    """Per-document 32-bit SimHash (bigint): explode tokens, hash each
    once, per-bit majority vote as a single shallow aggregate. Docs with
    no tokens drop out."""
    toks = spread(docs).select("doc_id", TX.tokens(F.col("text")).alias("w"))
    exploded = toks.select(
        "doc_id", F.explode_outer(F.col("w")).alias("t")
    ).where(F.col("t").isNotNull())
    hashed = exploded.select("doc_id", TX.token_hash32(F.col("t")).alias("h"))
    return hashed.groupBy("doc_id").agg(
        TX.simhash_agg(F.col("h")).alias("simhash")
    )


def simhash_band_layout(n_bands: int, bits: int = 32) -> list[tuple[int, int]]:
    """(offset, width) bands covering ``bits``, widest first.

    Pigeonhole: a pair with hamming distance <= k over ``bits`` shares at
    least one FULL band when there are >= k+1 bands (k errors can dirty at
    most k bands). Two 16-bit halves only guarantee recall for hamming<=1;
    k+1 bands restore the documented guarantee."""
    base, rem = divmod(bits, n_bands)
    layout, off = [], 0
    for i in range(n_bands):
        width = base + (1 if i < rem else 0)
        layout.append((off, width))
        off += width
    return layout


def simhash_pairs_from_signatures(
    sigs: DataFrame, max_hamming: int = 4
) -> DataFrame:
    """Near-dup candidates from (doc_id, simhash) signatures: banded
    pigeonhole candidate generation (``max_hamming + 1`` bands over the
    32-bit hash guarantees every pair with hamming <= max_hamming shares
    a band), verified with exact bit_count(xor).

    SIGNATURE COLLAPSE (the exact-duplicate-collapse argument, one step
    stronger): every output column is a function of the two SIGNATURES
    alone, so docs sharing a simhash are interchangeable — banding,
    candidate dedup, and hamming verification run once per UNIQUE
    signature, then signature pairs expand to the member doc cross
    product and intra-signature pairs are emitted directly at hamming 0
    (x XOR x = 0, always <= max_hamming). Without the collapse a whale
    duplicate-group re-emits its C(m,2) pairs through EVERY band into
    the distinct() (5x the quadratic output shuffled to dedup it back
    down) — measured 117.6s warm on the 30%-hot whale corpus vs 24.2s
    collapsed. The intra emission is salted (_salted_intra_pairs), so
    the whale's contract output also parallelizes. The collapse key is
    the bigint signature itself: exact equality, no float or encoding
    subtleties, and it also merges coincidentally-equal signatures of
    DIFFERENT texts — valid because the output never looks past the
    signature."""
    layout = simhash_band_layout(max_hamming + 1)
    reps = sigs.groupBy("simhash").agg(F.min("doc_id").alias("rid"))
    rep_bands = reps.select(
        "rid",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(i),
                        F.shiftright(F.col("simhash"), off)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .cast("string"),
                    )
                    for i, (off, width) in enumerate(layout)
                ]
            )
        ).alias("band_key"),
    )
    a, b = rep_bands.alias("a"), rep_bands.alias("b")
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("bigint")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
        .select("s1", "s2", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
    # Expand verified signature pairs to member doc pairs. Signature
    # groups are disjoint, so least/greatest restores the global
    # d1 < d2 contract without colliding with intra pairs.
    ma = sigs.select(F.col("simhash").alias("s1"), F.col("doc_id").alias("m1"))
    mb = sigs.select(F.col("simhash").alias("s2"), F.col("doc_id").alias("m2"))
    inter = (
        rep_pairs.join(ma, "s1")
        .join(mb, "s2")
        .select(
            F.least("m1", "m2").alias("d1"),
            F.greatest("m1", "m2").alias("d2"),
            "hamming",
        )
    )
    intra = (
        _salted_intra_pairs(sigs, "simhash", "doc_id")
        .select(
            F.col("id_a").alias("d1"),
            F.col("id_b").alias("d2"),
            F.lit(0).cast("bigint").alias("hamming"),
        )
        # guard parity with the pre-collapse form (and the minhash /
        # levenshtein collapses): intra pairs sit at hamming 0, which
        # still must satisfy the caller's threshold
        .where(F.lit(0) <= max_hamming)
    )
    return inter.unionByName(intra)


def simhash_pairs(docs: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Near-dup candidates over documents: SimHash signatures + banded
    candidate generation (see ``simhash_pairs_from_signatures``)."""
    return simhash_pairs_from_signatures(simhash_docs(docs), max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_doc_frequency: float | None = 0.2,
) -> DataFrame:
    """Exact Jaccard similarity over distinct word shingles via a
    posting-list self-join (shuffle keyed on shingle).

    ``max_doc_frequency`` (DEFAULT ON at 0.2) drops stop-shingles
    appearing in more than that fraction of docs BEFORE the self-join —
    a shingle in f docs generates f^2/2 pairs, so one hot shingle is a
    quadratic scale-killer at corpus size while carrying no dedup
    signal. Capping changes the result (Jaccard is then over the capped
    shingle sets); pass ``max_doc_frequency=None`` for exact uncapped
    scoring on pre-filtered candidates.

    The threshold comparison is integer-exact (``df * 10000 > n_docs *
    cap_bp``) and the doc count is an aggregate inside the plan — no
    eager action, no float comparison drift vs the oracle.
    """
    toks = spread(docs).select("doc_id", TX.tokens(F.col("text")).alias("w"))
    postings = (
        toks.select(
            "doc_id",
            F.explode_outer(TX.shingles_of(F.col("w"), shingle_n)).alias("s"),
        )
        .where(F.col("s").isNotNull())
        .distinct()
    )
    if max_doc_frequency is not None:
        cap_bp = int(round(max_doc_frequency * 10000))
        n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
        hot = (
            postings.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(F.broadcast(n_docs))
            .where(F.col("df") * 10000 > F.col("n_docs") * cap_bp)
            .select("s")
        )
        postings = postings.join(F.broadcast(hot), "s", "left_anti")
    sizes = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = postings.alias("a"), postings.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def blocked_levenshtein_pairs(
    docs: DataFrame,
    max_dist: int = 10,
    block_chars: int = 16,
    head_chars: int = 80,
) -> DataFrame:
    """Fuzzy near-dup pairs via blocked edit distance — the
    record-linkage companion to the token-set strategies (Jaccard/
    MinHash miss single-character edits inside tokens; Levenshtein
    counts them).

    Blocking makes it scale: candidates are pairs sharing the first
    ``block_chars`` of the lowercased text (an equi-join on the block
    key — never all-pairs), then verified with
    ``levenshtein(head_a, head_b) <= max_dist`` over the first
    ``head_chars`` chars (capping the O(len^2) DP cost per pair).
    Prefix blocking by construction only finds pairs that agree on the
    prefix — the right recall trade for near-identical documents; widen
    with additional block keys (suffix, fingerprint) when edits may hit
    the head."""
    base = spread(docs).select(
        "doc_id",
        F.substring(F.lower(F.col("text")), 1, block_chars).alias("blk"),
        F.substring(F.lower(F.col("text")), 1, head_chars).alias("head"),
    )
    # HEAD COLLAPSE (the signature-collapse argument — see
    # minhash_lsh_pairs): both the block key and the verified distance
    # are functions of (blk, head) alone, so docs identical on that
    # prefix pair are interchangeable. The Levenshtein DP — the
    # expensive part — runs once per UNIQUE head pair; member expansion
    # restores the doc-pair contract, and intra-group pairs emit
    # directly at lev 0 (identical heads). Un-collapsed, a whale
    # duplicate-group paid C(m,2) DP calls on ONE block key
    # (single-task): 197s warm on the 30%-hot whale corpus vs 4.1s
    # collapsed (48x); the 2x whale never finished inside 10 min vs
    # 5.0s collapsed. Common case (sf0.1, duplicate-free): ~1.5s.
    # cached: consumed by both join sides, the member expansion, and
    # salted_candidates' eager pair-count gate.
    reps = cached(
        base.groupBy("blk", "head").agg(
            F.min("doc_id").alias("rid"),
            # member count rides the same agg; gates the intra-pair salt
            F.count(F.lit(1)).alias("gsz"),
        )
    )
    members = base.join(reps, ["blk", "head"]).select(
        F.col("rid").alias("rep"), "doc_id", "gsz"
    )
    # Salted block join (salted_candidates): a whale of NEAR-identical
    # heads (distinct heads, shared block prefix — one edit past the
    # block key) defeats the head collapse and owns one blk key; the
    # plain join would run its C(m,2) Levenshtein DPs single-task.
    # Output-identical: each rep pair meets at exactly the probe row's
    # salt, r1 < r2 keeps one orientation.
    a = reps.select(
        F.col("rid").alias("r1"), F.col("head").alias("ha"), "blk"
    )
    b = reps.select(
        F.col("rid").alias("r2"), F.col("head").alias("hb"), "blk"
    )
    rep_pairs = (
        salted_candidates(a, b, "blk", "r1")
        .where(F.col("r1") < F.col("r2"))
        .select(
            "r1",
            "r2",
            F.levenshtein(F.col("ha"), F.col("hb"))
            .cast("bigint")
            .alias("lev"),
        )
        .where(F.col("lev") <= max_dist)
    )
    ma = members.select(F.col("rep").alias("r1"), F.col("doc_id").alias("m1"))
    mb = members.select(F.col("rep").alias("r2"), F.col("doc_id").alias("m2"))
    inter = (
        rep_pairs.join(ma, "r1")
        .join(mb, "r2")
        .select(
            F.least("m1", "m2").alias("d1"),
            F.greatest("m1", "m2").alias("d2"),
            "lev",
        )
    )
    intra = (
        _salted_intra_pairs(members, "rep", "doc_id", size_col="gsz")
        .select(
            F.col("id_a").alias("d1"),
            F.col("id_b").alias("d2"),
            F.lit(0).cast("bigint").alias("lev"),
        )
        .where(F.lit(0) <= max_dist)
    )
    return inter.unionByName(intra)


def _salted_intra_pairs(
    members: DataFrame,
    grp_col: str,
    id_col: str,
    payload: list[str] | None = None,
    salt: int = 16,
    size_col: str | None = None,
    whale_min: int = 256,
) -> DataFrame:
    """All unordered intra-group member pairs (id_a < id_b), generated
    across up to ``salt`` tasks per group instead of one.

    A self-join keyed on the group id alone serializes each group's
    C(m, 2) pair OUTPUT into a single task: AQE's skew-join split keys
    on INPUT partition bytes, and a whale duplicate-group's id list is
    tiny even when its pair output is quadratic — so on a corpus where
    one document/vector owns a large share of the rows (empty docs,
    boilerplate), the un-salted join pins one core for the whole pair
    emission. Standard skew salting fixes the parallelism without
    changing the output: the left side takes a deterministic salt in
    [0, salt), the right side replicates once per salt value, and the
    join keys on (group, salt) — each unordered pair is produced
    exactly once (the left row's salt matches exactly one of the right
    row's replicas, and id_a < id_b picks one orientation).

    WHALE-GATED (VERDICT r09 item 7): the salt factor is PER GROUP — a
    function of the group's member count, so both sides derive the same
    value and exactly-once is unchanged. Groups under ``whale_min``
    members (C(m,2) < ~32k pairs: sub-task-sized output) take factor 1 —
    the right side's explode emits ONE replica and the no-whale common
    case pays nothing over an unsalted join — while whale groups scatter
    over the full ``salt``. ``size_col`` names a group-constant member
    count the caller already has (every collapse computes one in its
    rep aggregation — thread it here for free); when absent it is
    computed internally with groupBy+join (whale-safe rep-assignment
    shape, linear).

    ``payload``: group-constant columns the caller needs on every pair
    (self-similarity, shingle size). They ride the LEFT side so the
    pair stream never needs a post-generation join keyed on the group
    — such a join would re-serialize the quadratic stream onto the
    whale's single hash key, undoing the salting."""
    pay = payload or []
    if size_col is None:
        sized = members.join(
            members.groupBy(grp_col).agg(F.count(F.lit(1)).alias("__m")),
            grp_col,
        )
        size_expr = F.col("__m")
    else:
        sized = members
        size_expr = F.col(size_col)
    factor = (
        F.when(size_expr >= whale_min, F.lit(salt)).otherwise(F.lit(1))
    )
    x = sized.select(
        F.col(grp_col).alias("__g"),
        F.col(id_col).alias("id_a"),
        F.pmod(F.xxhash64(F.col(id_col)), factor).alias("__s"),
        *pay,
    )
    y = sized.select(
        F.col(grp_col).alias("__g"),
        F.col(id_col).alias("id_b"),
        F.explode(F.sequence(F.lit(0), factor - F.lit(1))).alias("__s"),
    )
    return (
        x.join(y, ["__g", "__s"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(F.col("__g").alias(grp_col), "id_a", "id_b", *pay)
    )


def _exact_vector_members(embeddings: DataFrame) -> DataFrame:
    """(vec_id, v, rep, gsz): min vec_id and member count over groups of
    byte-identical vectors. One keyed shuffle on the array itself (Spark
    normalizes NaN/-0.0 in grouping keys; both merges are cosine-safe —
    identical arrays give identical dot/norm arithmetic, and sign_bucket
    treats -0.0 >= 0 and NaN >= 0 the same for every member). ``gsz``
    rides the same window for free; it gates the intra-pair salt."""
    e = spread(embeddings).select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    )
    # Window, NOT groupBy+rejoin, deliberately: the join alternative
    # keys a sort-merge join on the 64-double array itself — the array
    # shuffles twice and every merge comparison scans the whole array
    # (measured 2.5x slower end-to-end on the whale-skew corpus, while
    # this window form ran the same corpus in 6.4s warm). The window's
    # per-group cost is a LINEAR single-task sort — acceptable because
    # the quadratic stage downstream (intra-pair emission) is the part
    # that must parallelize, and _salted_intra_pairs handles that; a
    # corpus dominated by one duplicate group should run exact dedup
    # first regardless (the pair OUTPUT is quadratic by contract).
    w = Window.partitionBy("v")
    return e.withColumn("rep", F.min("vec_id").over(w)).withColumn(
        "gsz", F.count(F.lit(1)).over(w)
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.999,
    bucket_bits: int | None = None,
) -> DataFrame:
    """Cosine near-dup via sign-bucket LSH: pairs sharing a sign pattern,
    verified by exact (rounded) cosine. Scaled/identical-direction copies
    land in the same bucket by construction.

    EXACT-DUPLICATE COLLAPSE (same argument as jaccard_prefix_join):
    byte-identical vectors are collapsed to their min-id representative
    before the bucket join — cosine verification runs once per UNIQUE
    pair instead of once per pair (a 100-copy cluster would otherwise
    pay C(100,2) array reductions) — then representative pairs re-expand
    to the member cross product and intra-group pairs are emitted with
    the representative's SELF-cosine (identical float arithmetic to the
    naive a-vs-b computation for identical arrays; a NaN vector
    self-scores NaN, which Spark's NaN-is-greatest ordering KEEPS past
    the >= threshold filter exactly as the naive form keeps NaN pair
    scores, and a zero-norm vector raises DIVIDE_BY_ZERO under ANSI
    mode in BOTH forms — loud-fail parity). Output-identical by
    construction; the brute-force oracle (no collapse) proves it at
    every scale.

    ``bucket_bits=None`` derives the width from the corpus size
    (similarity.auto_bucket_bits — same clamp(ceil(log2(n)) - 3, 4, 24)
    the blocked-kNN family uses): at 1M vectors a fixed 8-bit table
    averages ~4k vectors per bucket and the candidate join goes
    quadratic per bucket; the derived width holds occupancy ~8. More
    bits narrows the candidate net (a true near-dup pair straddling a
    sign boundary is missed) — the cosine >= threshold verification
    only ever prunes candidates, so the bucket equality is part of the
    operator's contract and the oracle derives the same width."""
    from .similarity import auto_bucket_bits

    if bucket_bits is None:
        bucket_bits = auto_bucket_bits(embeddings)
    g = _exact_vector_members(embeddings)
    reps = (
        g.where(F.col("vec_id") == F.col("rep"))
        .select("vec_id", "v")
        .withColumn("bucket", V.sign_bucket(F.col("v"), bucket_bits))
    )
    # SALTED bucket join (salted_candidates — see its docstring): a
    # NEAR-identical whale defeats the exact collapse (arrays distinct)
    # and owns one bucket key; the plain a-b join emitted its C(m,2)
    # pairs single-task (229 s at 21k vectors / 7k whale). The salted
    # form is output-identical (each pair meets at exactly the probe
    # row's salt; a<b then keeps one orientation, same as unsalted).
    # Norms precompute once per REP (cosine_r6_prenormed is
    # bit-identical to cosine_r6): on the same whale the all-pairs
    # scorer drops from three interpreted array reductions per pair to
    # one — the pair-scoring stage, not the join, is the cost at scale.
    # cached: consumed by both join sides and by salted_candidates'
    # eager pair-count gate — uncached, the gate job re-derived the
    # whole collapse + bucket chain (measured +1 s/query at sf0.1).
    normed = cached(reps.withColumn("nrm", V.norm(F.col("v"))))
    a = normed.select(
        F.col("vec_id").alias("r1"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "bucket",
    )
    b = normed.select(
        F.col("vec_id").alias("r2"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket",
    )
    rep_pairs = (
        salted_candidates(a, b, "bucket", "r1")
        .where(F.col("r1") < F.col("r2"))
        .select(
            "r1",
            "r2",
            V.cosine_r6_prenormed(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    members = g.select("vec_id", "rep", "gsz")
    inter = (
        rep_pairs.join(
            members.select(
                F.col("rep").alias("r1"), F.col("vec_id").alias("m1")
            ),
            "r1",
        )
        .join(
            members.select(
                F.col("rep").alias("r2"), F.col("vec_id").alias("m2")
            ),
            "r2",
        )
        .select(
            F.least("m1", "m2").alias("d1"),
            F.greatest("m1", "m2").alias("d2"),
            "cos_sim",
        )
    )
    self_cos = (
        reps.select(
            F.col("vec_id").alias("rep"),
            V.cosine_r6(F.col("v"), F.col("v")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    # Salted pair generation — see _salted_intra_pairs: the un-salted
    # self-join on rep serializes a whale group's C(m,2) output into
    # one task. The self-cosine attaches to MEMBERS (linear, input-
    # proportional partitions that AQE can split) and rides the salted
    # left side, so the quadratic pair stream never re-keys on rep.
    intra = (
        _salted_intra_pairs(
            members.join(self_cos, "rep"), "rep", "vec_id",
            payload=["cos_sim"],
            size_col="gsz",
        )
        .select(
            F.col("id_a").alias("d1"),
            F.col("id_b").alias("d2"),
            "cos_sim",
        )
    )
    return inter.unionByName(intra)


def embedding_dup_edges_for_clustering(
    embeddings: DataFrame,
    threshold: float = 0.999,
    bucket_bits: int | None = None,
) -> DataFrame:
    """Component-equivalent REDUCED edge set for pairs->clusters
    pipelines (semantic dedup): representative-level qualifying pairs
    plus one rep->member STAR edge per exact-duplicate member, instead
    of the full C(n,2) intra-cluster clique ``embedding_dup_pairs``
    contractually emits. Connected components — and therefore cluster
    assignments and survivors — are IDENTICAL (a star connects exactly
    what a clique connects), but the edge count feeding the iterative
    label propagation drops from O(sum n_i^2) to O(sum n_i): at the
    100x replicated soak that is 11.4M -> ~0.2M edges. Star edges are
    gated on the representative's self-cosine clearing the threshold —
    the same >= filter the full pair set applies, so NaN groups (which
    Spark's NaN-is-greatest ordering keeps) and sub-threshold groups
    connect or stay singletons exactly as the clique form decides.
    ``bucket_bits=None`` derives the width from corpus size — see
    ``embedding_dup_pairs``; both functions must use the same width for
    their edge sets to stay component-equivalent on the same corpus."""
    from .similarity import auto_bucket_bits

    if bucket_bits is None:
        bucket_bits = auto_bucket_bits(embeddings)
    g = _exact_vector_members(embeddings)
    reps = (
        g.where(F.col("vec_id") == F.col("rep"))
        .select("vec_id", "v")
        .withColumn("bucket", V.sign_bucket(F.col("v"), bucket_bits))
    )
    # Salted bucket join + per-rep norm precompute — near-identical
    # whale defense, same argument and output-identity (prenormed is
    # bit-identical) as embedding_dup_pairs above. cached: both join
    # sides plus the salted gate's counting passes read it.
    normed = cached(reps.withColumn("nrm", V.norm(F.col("v"))))
    a = normed.select(
        F.col("vec_id").alias("d1"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "bucket",
    )
    b = normed.select(
        F.col("vec_id").alias("d2"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket",
    )
    rep_pairs = (
        salted_candidates(a, b, "bucket", "d1")
        .where(F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            V.cosine_r6_prenormed(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    self_cos = (
        reps.select(
            F.col("vec_id").alias("rep"),
            V.cosine_r6(F.col("v"), F.col("v")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    star = (
        g.where(F.col("vec_id") != F.col("rep"))
        .select("vec_id", "rep")
        .join(self_cos, "rep")
        .select(
            F.col("rep").alias("d1"),
            F.col("vec_id").alias("d2"),
            "cos_sim",
        )
    )
    return rep_pairs.unionByName(star)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation: every node
    repeatedly adopts the smallest label among itself and its neighbors
    until a fixpoint. Returns (id, cluster_id) where cluster_id is the
    minimum node id of the component.

    Scale design: each iteration is ONE shuffle (edge join + min agg) and
    converges in O(component diameter) rounds — near-dup clusters are
    shallow (copies of a common ancestor), so typically <= 4-5 rounds.
    ``localCheckpoint`` truncates the growing lineage each round so the
    plan doesn't double per iteration; the only driver-side data is the
    one scalar "did anything change" count per round.

    ``nodes``: one column ``id``. ``edges``: columns ``src``, ``dst``
    (undirected; symmetrized internally).

    ``checkpoint_dir``: when given, per-round materialization uses
    RELIABLE ``checkpoint()`` into that directory instead of
    ``localCheckpoint()``. localCheckpoint blocks are executor-memory
    resident — an executor loss mid-iteration on a real cluster kills
    the (truncated-lineage, hence unrecomputable) job; reliable
    checkpointing survives it at the cost of a distributed-FS write per
    round. Local/bench default stays localCheckpoint. Two side effects
    to know about: (1) ``setCheckpointDir`` mutates the SHARED
    SparkContext and is not restored — Spark offers no scoped form;
    (2) superseded rounds' checkpoint files are reclaimed only when the
    context was built with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (our
    ``get_session`` sets it; it is construction-time-only, so on a
    session this engine did not build, a long run accumulates one
    rdd-checkpoint directory per iteration until the dir is cleaned).
    """
    if checkpoint_dir is not None:
        nodes.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _materialize(df: DataFrame) -> DataFrame:
        # LAZY local checkpoint (r15): the eager form ran one dedicated
        # materialization job per round and the convergence count then
        # ran a SECOND job over the checkpointed blocks — 2 jobs/round.
        # eager=False defers materialization to the count action below,
        # which computes the round and persists its blocks in ONE job
        # (lineage truncation is identical once materialized). The
        # reliable-checkpoint path keeps its eager write — that mode
        # exists to survive executor loss, so the write must not be
        # deferrable.
        return (
            df.checkpoint()
            if checkpoint_dir is not None
            else df.localCheckpoint(eager=False)
        )

    # Materialize edges ONCE: every iteration joins against them, and
    # without this the upstream pair-generation pipeline (minhash etc.)
    # would be re-executed per round.
    sym = _materialize(
        edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    # ACTIVE-node restriction (r16): a node with no edge never changes
    # its label — it is its own singleton component by construction —
    # so the loop iterates over edge-endpoint nodes ONLY and singletons
    # are restored by one left join at the end. On a dedup corpus the
    # active set is the near-duplicate docs (typically a small fraction
    # of the corpus), so every per-round join/checkpoint/count touches
    # |dup nodes| rows instead of |corpus| rows — the same sparse-
    # frontier argument as personalized_pagerank (r15). Output
    # identical: restricting labels to active nodes cannot change
    # propagation (a label only ever enters the loop through sym, whose
    # endpoints are all active), and absent rows are exactly the
    # (id, id) singleton rows the final coalesce re-emits.
    # endpoints derive from the MATERIALIZED sym (both directions are
    # in it, so src alone covers every endpoint) — deriving from the
    # raw `edges` plan would re-run the whole upstream pair-generation
    # pipeline a second time.
    endpoints = sym.select(F.col("src").alias("id")).distinct()
    active = nodes.join(endpoints, "id", "left_semi")
    labels = _materialize(active.select("id", F.col("id").alias("cluster_id")))

    def _step(lab: DataFrame, carry_changed: bool = False) -> DataFrame:
        """One propagation step; ``carry_changed`` ORs the incoming
        ``__changed`` flag through, so chained steps report changes
        across the whole chain without a re-join."""
        nbr_min = (
            sym.join(lab, sym.src == lab.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("cluster_id").alias("nbr_label"))
        )
        prev = F.col("__changed") if carry_changed else F.lit(False)
        return lab.join(nbr_min, lab.id == nbr_min.id2, "left").select(
            "id",
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("nbr_label"), F.col("cluster_id")),
            ).alias("cluster_id"),
            (
                prev | (F.col("nbr_label") < F.col("cluster_id"))
            ).alias("__changed"),
        )

    # Single step per materialization. DOUBLE-STEP rounds (two
    # propagation steps per checkpoint+count, halving driver
    # round-trips) were tried in r16 and measured a LOSS on the dedup
    # corpus — near-dup components are shallow (diameter ~1), so the
    # fixpoint arrives in one step and the second step per round was
    # pure extra work: dedup_clusters 3.43 -> 4.68 s, dedup_keep_best
    # 3.54 -> 4.33 s (min-of-3, same harness). A deep-diameter graph
    # would flip that trade; the _step helper keeps the chainable form
    # (carry_changed) should one appear.
    converged = False
    steps_left = max_iters
    while steps_left > 0:
        steps_left -= 1
        updated = _materialize(_step(labels))
        n_changed = (
            updated.agg(
                F.sum(F.col("__changed").cast("long")).alias("n")
            ).collect()[0].n
            or 0
        )
        labels = updated.drop("__changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # Labels may be only partially propagated: a component with
        # diameter > max_iters yields silently SPLIT clusters. The check
        # is CONSERVATIVE — convergence is only ever observed via a
        # zero-change round, so if the final allowed round made the last
        # real changes this still warns on a fully-propagated result
        # (deciding otherwise would cost one extra confirmation round).
        import warnings

        warnings.warn(
            f"connected_components stopped at max_iters={max_iters} without "
            "observing a zero-change round; cluster labels MAY be split "
            "(the warning is conservative — the final round may have "
            "completed propagation). Raise max_iters (rounds needed ~= "
            "component diameter) to confirm.",
            RuntimeWarning,
            stacklevel=2,
        )
    # Restore the edge-less singletons the loop never carried: a node
    # absent from `labels` is exactly a node with no edge, whose
    # component label is itself. One broadcast-or-keyed left join at
    # the end instead of |corpus| rows through every round above.
    return nodes.join(labels, "id", "left").select(
        "id",
        F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster near-dup pairs into components and pick survivors: every
    doc (singletons included) gets (doc_id, cluster_id, is_survivor) with
    the minimum doc_id as the component's survivor — the standard final
    stage of a dedup pipeline (pairs -> clusters -> keep one per cluster).
    """
    nodes = docs.select(F.col(id_col).alias("id"))
    edges = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    cc = connected_components(nodes, edges)
    return cc.select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("is_survivor"),
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster near-dup pairs and keep the BEST doc per cluster (highest
    ``score_col``, doc_id as the deterministic tie-break) instead of
    ``dedup_clusters``'s min-id survivor — the policy a real corpus
    pipeline wants (keep the longest / highest-quality copy).

    One row_number window per cluster on top of the component labels;
    the scores ride along from the docs table (key-partitioned join).
    """
    from pyspark.sql import Window

    nodes = docs.select(F.col(id_col).alias("id"))
    edges = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    cc = connected_components(nodes, edges)
    scored = cc.join(
        docs.select(F.col(id_col).alias("id"), F.col(score_col).alias("score")),
        "id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("id")
    )
    return scored.select(
        F.col("id").alias(id_col),
        "cluster_id",
        "score",
        (F.row_number().over(w) == 1).alias("is_keeper"),
    )


def incremental_dedup(
    old_docs: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Dedupe a NEW shard against an EXISTING corpus — the shape every
    continuously-ingesting training pipeline actually runs: the old
    corpus is already deduped, so old x old pairs must never be
    recomputed; only new x old (and implicitly new x new via the
    existing batch operators) matter.

    Two detection tiers, exact taking precedence:
    - exact: content-hash anti-membership (md5 equi-join against the old
      corpus's distinct hashes — one shuffle on a 16-byte key).
    - near: banded MinHash-LSH, ASYMMETRIC — the new shard's band table
      joins the old corpus's band table, so candidate generation is
      |new_bands| x matching buckets, never quadratic in the old corpus.
      Candidates are verified by estimated Jaccard (signature overlap)
      at ``threshold``.

    Returns one row per new doc: (doc_id, is_dup, dup_of, reason) with
    dup_of = the smallest matching old doc_id and reason in
    ('exact', 'near', NULL).

    At 100 TB the old side's signatures/bands are a PERSISTED index
    (written bucketed on the band key at ingest time); here they are
    derived inline from ``old_docs``, which is the same plan minus the
    table scan swap. New-shard signatures are always computed fresh.
    """
    old_hashes = old_docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("dup_of")
    )
    exact = (
        new_docs.select("doc_id", F.md5("text").alias("content_hash"))
        .join(old_hashes, "content_hash")
        .select("doc_id", "dup_of", F.lit("exact").alias("reason"))
    )

    sigs_old = cached(_signatures(old_docs, shingle_n))
    sigs_new = cached(_signatures(new_docs, shingle_n))
    cand = (
        _band_table(sigs_new)
        .alias("a")
        .join(
            _band_table(sigs_old).alias("b"),
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.key") == F.col("b.key")),
        )
        .select(F.col("a.doc_id").alias("nd"), F.col("b.doc_id").alias("od"))
        .distinct()
    )
    sa = sigs_new.select(
        F.col("doc_id").alias("nd"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(TX.MINHASH_PERMS)],
    )
    sb = sigs_old.select(
        F.col("doc_id").alias("od"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(TX.MINHASH_PERMS)],
    )
    matches = reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
            for i in range(TX.MINHASH_PERMS)
        ],
    )
    near = (
        cand.join(sa, "nd")
        .join(sb, "od")
        .where(
            (matches.cast("double") / TX.MINHASH_PERMS) >= F.lit(threshold)
        )
        .groupBy(F.col("nd").alias("doc_id"))
        .agg(F.min("od").alias("dup_of"))
        .select("doc_id", "dup_of", F.lit("near").alias("reason"))
    )
    flagged = exact.unionByName(near.join(exact, "doc_id", "left_anti"))
    return (
        new_docs.select("doc_id")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.col("reason").isNotNull().alias("is_dup"),
            "dup_of",
            "reason",
        )
    )


def jaccard_prefix_join(docs: DataFrame, threshold_e1: int = 6) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (the ppjoin family):
    all document pairs whose word-TRIGRAM shingle sets reach Jaccard >=
    threshold, generating candidates from only each document's PREFIX
    shingles instead of all of them. (Shingles, not unigrams: on a
    small shared vocabulary unigram SETS of unrelated documents overlap
    heavily — trigram sets only collide for genuine near-duplicates, so
    the join is selective AND the test corpus exercises it.)

    The guarantee: order all tokens by one global total order (rarest
    first: (df, token)); two sets with |A∩B|/|A∪B| >= t MUST share a
    token within each one's first |d| - ceil(t·|d|) + 1 tokens — so
    indexing only prefixes is lossless for the threshold, while the
    candidate join shrinks by the prefix ratio AND pivots onto the
    RAREST tokens (tiny posting lists — the hot-shingle blowup that
    the df-cap guards elsewhere never happens here; this is the
    principled fix, the cap is the blunt one). Verification computes
    exact Jaccard in integer e1·e4 arithmetic (ceil via
    (t·|d| + 9) div 10 — all non-negative).

    The oracle generates candidates from ALL shared tokens (brute
    force) — so a prefix too short to be lossless goes red, proving
    completeness, not just precision.

    r16 NEGATIVE RESULTS (measured, interleaved; see OPTIMIZATION_r16):
    caching the ranked-prefix window output (both candidate-join sides
    re-derive it) 2.45-2.57 -> 3.47-3.73 s; an array_distinct per-row
    shingle-array spine rooted at one repartition(doc_id) exchange
    (killing the distinct aggregate, collect_list, and count-window)
    4.1-4.9 -> 10.1-11.1 s — the exchange ships full shingle arrays
    and per-row HOF array building loses to the codegen explode
    pipeline. With r15's spread() negative, the current shape stands.

    EXACT-DUPLICATE COLLAPSE (enforced in code, not just documented —
    VERDICT r08 item 2): on duplicate-heavy corpora the all-pairs
    contract is the cost driver — a cluster of n identical docs emits
    C(n,2) pairs and each pair pays exact Σ|A∩B| verification (the r8
    10× soak measured 28× time purely from this). Docs with identical
    normalized token arrays have identical shingle SETS, so their
    Jaccard with every third doc is identical and with each other is
    exactly 1.0. The join therefore (1) collapses each identical-token
    group to its min-doc_id representative, (2) runs the ppjoin over
    representatives only — verification cost drops from O(pairs) to
    O(unique-pairs), (3) re-expands representative pairs to the full
    member cross product and emits the intra-group C(n,2) pairs
    directly with inter = uni = |shingle set| and jaccard_e4 = 10000.
    Output-identical to the naive form by construction; the brute-force
    oracle (which does NOT collapse) proves it at every scale.

    SET-GRAIN COLLAPSE — measured negative result (r13, VERDICT item
    1): collapsing on the distinct shingle SET instead of the token
    array is strictly more general in theory, but measured identical
    on the corpus (sf0.01: 500 array-groups = 500 set-groups; sf0.1:
    4992 = 4992), while shingling would run over ALL members instead
    of reps only — a pure regression on dup-heavy corpora. Not taken;
    the array-grain collapse stays. The r13 levers taken instead are
    PPJoin's remaining two filters (asymmetric index/probe prefixes +
    the positional filter — see the candidate stage below).
    """
    # NO spread() here — measured negative (r15 A/B: 3.65 s -> 4.72 s
    # min-of-3 with it). Unlike bootstrap_ci/embedding_covariance, the
    # single-task prefix of this pipeline is only the split+md5 of the
    # raw docs; every expensive stage (shingle explode, distinct, the
    # ranked-prefix window, candidate join) already runs after the
    # keyed.groupBy exchange at full parallelism, so the extra
    # repartition pass was pure overhead.
    words = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), "[^a-z]+").alias("ws")
    )
    # Docs with <3 tokens have no trigram shingles. Without this guard
    # sequence(1, size-2) auto-DESCENDS for size<3 (sequence(1,0) ->
    # [1,0]) and element_at(ws, 0) raises INVALID_INDEX_OF_ZERO; the
    # DuckDB oracle's generate_series(1, len-2) is empty for the same
    # input, so filtering matches oracle semantics exactly.
    words = words.where(F.size("ws") >= 3)
    # Exact-duplicate collapse: key on the normalized token array
    # (tokens are [a-z]+ only, so "\n" can never appear inside one and
    # array_join is injective). One shuffle on the md5 key — the same
    # cost shape as exact_duplicates(), scales to 100 TB.
    keyed = words.withColumn("grp", F.md5(F.array_join("ws", "\n")))
    # groupBy+join, not Window.partitionBy(grp) — whale-group safe rep
    # assignment (see _exact_vector_members for the argument). The
    # member count rides the same aggregation for free; it gates the
    # intra-pair salt stage below. NOT cached despite four consumers:
    # measured A/B (r12, VERDICT item 6) — Spark's ReusedExchange
    # already dedupes these identical subtrees within the one plan,
    # so cached()/InMemoryRelation only added row-format conversion
    # cost (sf0.1: 6.62 s uncached vs 7.04 s cached).
    members = keyed.select("doc_id", "grp").join(
        keyed.groupBy("grp").agg(
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).alias("gsz"),
        ),
        "grp",
    )
    words = (
        keyed.join(
            members.where(F.col("doc_id") == F.col("rep")).select("doc_id"),
            "doc_id",
        )
        .select("doc_id", "ws")
    )
    # Three consumers (df_counts, the ranked prefix pass, the arrs
    # verification arrays) but NOT cached: the r11 minhash recompute
    # lesson does NOT transfer here — ReusedExchange shares the one
    # distinct shuffle across the consumers already, and the measured
    # A/B (r12, VERDICT item 6) showed caching is a small net LOSS
    # (sf0.1: 6.62 s vs 7.04 s). Negative result recorded in
    # BENCH_NOTES.md r12.
    toks = (
        words.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 2), i -> "
                    "concat(element_at(ws, i), ' ', element_at(ws, i + 1), "
                    "' ', element_at(ws, i + 2)))"
                )
            ).alias("tok"),
        )
        .distinct()
    )
    df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # No broadcast hint on df_counts: it grows with the corpus (one row
    # per distinct shingle), so a forced hint would blow the 8 GB
    # broadcast limit at 100 TB. AQE still broadcasts it when small.
    # sz rides the SAME doc_id window the rank needs (whole-partition
    # count — no extra exchange), replacing the r12 groupBy+join
    # (r13 plan-thinning, part of the 5.9 -> 3.6 s measured cut).
    wdoc = Window.partitionBy("doc_id")
    ranked = toks.join(df_counts, "tok").select(
        "doc_id",
        "tok",
        F.row_number().over(wdoc.orderBy("df", "tok")).alias("rk"),
        F.count(F.lit(1)).over(wdoc).alias("sz"),
    )
    # ASYMMETRIC PREFIXES (r13, VERDICT item 1): candidates pair the
    # larger doc's PROBING prefix (|x| - ceil(t|x|) + 1 — with the
    # length filter |y| >= t|x|, alpha >= ceil(t/(1+t)(|x|+t|x|)) =
    # ceil(t|x|)) against the smaller doc's shorter INDEXING prefix
    # (|y| - ceil(2t/(1+t)|y|) + 1 — with |x| >= |y|, alpha >=
    # ceil(2t/(1+t)|y|)). The minimal common token t0 (global (df,tok)
    # order) sits at position <= |d| - overlap + 1 in EACH doc, so it
    # lies in both prefixes — lossless, and the size-ordered join
    # orientation keys each unordered pair exactly once. Measured at
    # sf0.1/t=0.6: raw candidate-join rows 204k -> 129k.
    prefix = ranked.where(
        F.col("rk")
        <= F.col("sz") - F.expr(f"({threshold_e1} * sz + 9) div 10") + 1
    )
    d = 10 + threshold_e1
    idx = ranked.where(
        F.col("rk")
        <= F.col("sz")
        - F.expr(f"(2 * {threshold_e1} * sz + {d - 1}) div {d}")
        + 1
    )
    # LENGTH FILTER (ppjoin's second lever, r12): J >= t forces
    # inter <= min(sa, sb) and uni >= max(sa, sb), so
    # 10*min(sa, sb) >= t_e1*max(sa, sb) is a LOSSLESS pair bound —
    # applied inside the candidate join, before the pair-grain
    # aggregate and the per-pair intersection count. Integer
    # arithmetic, same e1 basis as the final jaccard gate.
    #
    # POSITIONAL FILTER (ppjoin's third lever, r13): the global total
    # order makes each doc's rank order-isomorphic to it, so
    # min(rk_a)/min(rk_b) over the pair's shared prefix tokens are BOTH
    # attained at t0, the globally minimal common token — every common
    # token ranks >= t0 in both docs, hence
    # inter <= min(sa - i0 + 1, sb - j0 + 1). Pairs whose bound cannot
    # reach alpha = ceil(t/(1+t)(sa+sb)) (the exact overlap equivalent
    # of J >= t) are pruned BEFORE the intersection join — the pair
    # dedup becomes a groupBy carrying two mins instead of distinct,
    # same shuffle shape. Measured at sf0.1/t=0.6: candidates entering
    # the intersection join 193k -> 69k (2.8x), true pairs 256.
    cand = (
        prefix.alias("a")
        .join(idx.alias("b"), "tok")
        .where(
            (
                (F.col("b.sz") < F.col("a.sz"))
                | (
                    (F.col("b.sz") == F.col("a.sz"))
                    & (F.col("b.doc_id") < F.col("a.doc_id"))
                )
            )
            & (10 * F.col("b.sz") >= threshold_e1 * F.col("a.sz"))
        )
        .groupBy(
            F.col("a.doc_id").alias("id_x"),
            F.col("b.doc_id").alias("id_y"),
            F.col("a.sz").alias("sx"),
            F.col("b.sz").alias("sy"),
        )
        .agg(
            F.min("a.rk").alias("i0"),
            F.min("b.rk").alias("j0"),
        )
        .where(
            F.least(
                F.col("sx") - F.col("i0") + 1, F.col("sy") - F.col("j0") + 1
            )
            >= F.expr(f"({threshold_e1} * (sx + sy) + {d - 1}) div {d}")
        )
        # carry both set sizes through (least/greatest restores the
        # doc_a < doc_b contract; the sizes swap with the ids) — the
        # verification stage then needs NO size joins at all
        .select(
            F.least("id_x", "id_y").alias("doc_a"),
            F.greatest("id_x", "id_y").alias("doc_b"),
            F.when(F.col("id_x") < F.col("id_y"), F.col("sx"))
            .otherwise(F.col("sy"))
            .alias("sa"),
            F.when(F.col("id_x") < F.col("id_y"), F.col("sy"))
            .otherwise(F.col("sx"))
            .alias("sb"),
        )
    )
    # VERIFICATION BY ARRAY INTERSECTION (r13): each doc's distinct
    # shingle set collects ONCE into an array row (bounded by the
    # document's own size — the text column already arrives as one row,
    # so no new whale class), and the surviving candidate pairs join
    # the two arrays and compute |A∩B| with a per-row array_intersect.
    # This replaces the r12 explode-join-groupBy (a sum-of-set-sizes
    # row fanout + pair-grain shuffle, ~27M rows at sf0.1 pre-filter)
    # with two hash joins keyed on doc id — AQE broadcasts the
    # candidate side when small; at scale both joins stay equi-joins
    # with no blowup. Measured (with the filters above): sf0.1 board
    # query 5.9 -> 3.6 s min-of-5.
    arrs = toks.groupBy("doc_id").agg(F.collect_list("tok").alias("tarr"))
    rep_pairs = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("doc_a"), F.col("tarr").alias("ta")
            ),
            "doc_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("doc_b"), F.col("tarr").alias("tb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "sa",
            "sb",
            F.size(F.array_intersect("ta", "tb")).alias("inter"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("inter"),
            (F.col("sa") + F.col("sb") - F.col("inter"))
            .cast("long")
            .alias("uni"),
            F.expr("(10000 * inter) div (sa + sb - inter)").alias("jaccard_e4"),
        )
        .where(F.col("jaccard_e4") >= threshold_e1 * 1000)
    )
    # Re-expand representative pairs to the full member cross product.
    # Groups are disjoint, so a member of doc_a's group never equals a
    # member of doc_b's group; least/greatest restores the global
    # doc_a < doc_b contract (member ids interleave across groups).
    ma = members.select(
        F.col("rep").alias("doc_a"), F.col("doc_id").alias("mem_a")
    )
    mb = members.select(
        F.col("rep").alias("doc_b"), F.col("doc_id").alias("mem_b")
    )
    expanded = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("mem_a", "mem_b").alias("doc_a"),
            F.greatest("mem_a", "mem_b").alias("doc_b"),
            "inter",
            "uni",
            "jaccard_e4",
        )
    )
    # Intra-group pairs: identical token arrays => identical shingle
    # sets => inter = uni = |shingle set| and Jaccard exactly 1.0.
    # Output-proportional by construction (the contract emits exactly
    # these C(n,2) rows), so no hidden blowup beyond the output itself.
    # Salted generation (_salted_intra_pairs) keeps that output
    # PARALLEL on a whale duplicate-group; the shingle size attaches to
    # members first (linear join) and rides the salted left side so
    # the quadratic stream never re-keys on the group.
    intra = (
        _salted_intra_pairs(
            members.join(
                arrs.select(
                    F.col("doc_id").alias("rep"),
                    F.size("tarr").cast("long").alias("sz"),
                ),
                "rep",
            ),
            "grp",
            "doc_id",
            payload=["sz"],
            size_col="gsz",
        )
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.col("sz").alias("inter"),
            F.col("sz").alias("uni"),
            F.lit(10000).cast("long").alias("jaccard_e4"),
        )
        .where(F.lit(10000) >= threshold_e1 * 1000)
    )
    return expanded.unionByName(intra)


def cross_source_dups(docs: DataFrame, prefix_chars: int = 64) -> DataFrame:
    """Cross-source duplicate leakage at OPENING-PREFIX grain: hash
    groups of the first ``prefix_chars`` characters that SPAN more
    than one source — the contamination shape within-source dedup
    misses (shared boilerplate openings, syndicated ledes, template
    headers; if sources later split into train and eval, this is the
    leak's leading edge). Prefix grain rather than full text because
    real cross-source duplication is rarely byte-exact end to end —
    the opening is what survives syndication. Per source pair:
    group count and document count — the dedup-policy evidence.

    One prefix-hash aggregate (collect the bounded DISTINCT source
    set per hash), filter to spanning groups, explode the source-pair
    combinations (set sizes are source-enum-bounded).
    """
    groups = (
        docs.groupBy(
            F.md5(F.substring("text", 1, prefix_chars)).alias("h")
        )
        .agg(
            F.array_sort(F.collect_set("source")).alias("srcs"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.size("srcs") > 1)
    )
    pairs = groups.select(
        "h",
        "n_docs",
        F.explode(
            F.expr(
                "flatten(transform(srcs, (a, i) -> "
                "transform(slice(srcs, i + 2, size(srcs)), "
                "b -> struct(a AS sa, b AS sb))))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.sa").alias("source_a"),
            F.col("p.sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_docs").cast("long").alias("n_docs_involved"),
        )
    )
