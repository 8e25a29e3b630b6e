"""Text analysis over the ``documents`` table — language ID, quality
scoring, token counting, fingerprinting. All built-in expressions
(whole-stage codegen); per-row arithmetic, no shuffles beyond the scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..session import spread

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Order matters: ties resolve to the earlier language.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}

#: The "BPE-ish" token pattern: runs of letters, runs of digits, or a
#: single non-space symbol — a cheap proxy for subword tokenizers.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _hit_ratio(toks: Column, words: list[str]) -> Column:
    hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
    return hits.cast("double") / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)).cast("double")


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit-ratio language ID with deterministic tie-breaking.

    Emits the per-language scores plus the argmax (``pred_lang``) and the
    labeled ``lang`` column for accuracy inspection.
    """
    toks = TX.tokens(F.col("text"))
    scores = {lang: _hit_ratio(toks, words) for lang, words in LANG_STOPWORDS.items()}
    # argmax with first-wins tie-break, as a CASE chain
    best = F.lit(None).cast("string")
    langs = list(LANG_STOPWORDS)
    expr = None
    for lang in langs:
        cond = reduce(
            lambda acc, other: acc & (scores[lang] >= scores[other]),
            [o for o in langs if o != lang],
            F.lit(True),
        )
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    best = expr.otherwise(F.lit("und"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.round(scores[lang], 6).alias(f"score_{lang}") for lang in langs],
        best.alias("pred_lang"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + combined score (Gopher-rules-style):
    length, mean word length, stopword ratio, alpha ratio."""
    toks = TX.tokens(F.col("text"))
    n_tok = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    alpha_chars = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", "")).cast(
        "bigint"
    )
    stop_ratio = _hit_ratio(toks, LANG_STOPWORDS["en"])
    mean_word_len = n_chars.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    alpha_ratio = alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    score = (
        F.when((n_tok >= 50) & (n_tok <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 3.0) & (mean_word_len <= 12.0), 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.25).otherwise(0.0)
        + F.when(alpha_ratio >= 0.6, 0.25).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 2).alias("quality"),
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace words and BPE-ish regex tokens
    (a deterministic stand-in for a real subword tokenizer)."""
    ws = F.size(TX.tokens(F.col("text"))).cast("bigint")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)).cast(
        "bigint"
    )
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (bpe.cast("double") / F.greatest(ws, F.lit(1)).cast("double")).alias(
            "subword_ratio"
        ),
    )


def fingerprint(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Document fingerprints: winnowing-style minimum shingle hash (stable
    under small edits) and an order-insensitive bag-of-words hash.

    The shingle minimum aggregates over exploded shingles (shallow exprs,
    codegen-friendly) and left-joins back so short docs keep a NULL
    ``min_shingle_fp`` — same semantics as array_min over an empty array.
    """
    min_fp = (
        spread(docs)
        .select("doc_id", TX.tokens(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.explode_outer(TX.shingles_of(F.col("w"), shingle_n)).alias("s"),
        )
        .where(F.col("s").isNotNull())
        .groupBy("doc_id")
        .agg(F.min(F.md5("s")).alias("min_shingle_fp"))
    )
    bag_hash = F.md5(
        F.array_join(F.array_sort(F.array_distinct(TX.tokens(F.col("text")))), " ")
    )
    return (
        spread(docs).select("doc_id", bag_hash.alias("bag_fp"))
        .join(min_fp, "doc_id", "left")
        .select("doc_id", "min_shingle_fp", "bag_fp")
    )


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Unigram language-model scoring — the perplexity-filtering
    primitive: per-token surprisal -log2 P(token) under the corpus
    unigram distribution, summed per document.

    Engine-exact float discipline: each token's surprisal is quantized
    to integer millibits with floor(x*1000 + 0.5) (floor, not round —
    identical in every engine) BEFORE the per-doc sum, so the aggregate
    is pure integer arithmetic regardless of summation order.

    Scale: explode -> map-side-combined counts; the unigram table
    re-joins postings keyed on token (AQE broadcasts it when small; no
    forced hint — the vocab grows with the corpus); corpus total
    attaches as a 1-row broadcast."""
    postings = (
        spread(docs)
        .select("doc_id", TX.tokens(F.col("text")).alias("w"))
        .select("doc_id", F.explode_outer(F.col("w")).alias("token"))
        .where(F.col("token").isNotNull())
    )
    vocab = postings.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    total = vocab.agg(F.sum("cf").alias("total_cf"))
    per_token_mb = F.floor(
        F.log2(F.col("total_cf").cast("double") / F.col("cf")) * 1000 + F.lit(0.5)
    ).cast("bigint")
    # vocab grows with the corpus (one row per distinct token) — no
    # forced broadcast hint; AQE broadcasts it when it is actually
    # small and falls back to a shuffle join at 100 TB vocab sizes.
    # The 1-row `total` stays hinted (provably bounded).
    scored = (
        postings.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", per_token_mb.alias("mb"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("mb").alias("surprisal_mb"),
    ).withColumn("avg_surprisal_mb", F.expr("surprisal_mb div n_tokens"))


def token_colocation_lift(docs: DataFrame, min_count: int = 3) -> DataFrame:
    """Adjacent-token colocation strength — the PMI idea with the log
    dropped so it stays integer-exact: for each adjacent bigram (a, b),

        lift_e4 = (count(a,b) * total_bigrams * 10000)
                  div (count(a as first) * count(b as second))

    lift > 1e4 means the pair co-occurs more than independence predicts
    (collocations: "new york"); <= 1e4 means incidental adjacency. The
    standard corpus-exploration signal before building a tokenizer's
    merge table.

    Scale: bigrams are generated inline per document (``transform`` over
    the token array — no positional self-join), and the corpus is
    scanned/exploded exactly ONCE: the (a, b) pair counts are the only
    full-data aggregate, and the marginals n_a / n_b / n_total are
    RE-aggregations of that |distinct-bigrams|-sized table (joined back
    with AQE choosing the strategy — the marginals are vocabulary-sized,
    so no forced broadcast). ``min_count`` prunes the long tail after
    the marginals are taken, so they stay exact.
    """
    toks = spread(docs).select(
        "doc_id", TX.tokens(F.lower(F.col("text"))).alias("toks")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i-1] AS a, toks[i] AS b))"
            )
        ).alias("bg")
    ).select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    # Materialize the pair counts ONCE (localCheckpoint, as in
    # connected_components): four consumers (filter + three marginal
    # re-aggs) would otherwise each re-run the corpus explode.
    pair_counts = (
        bigrams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    ).localCheckpoint()
    first_counts = pair_counts.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    second_counts = pair_counts.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    total = pair_counts.agg(F.sum("n_ab").alias("n_total"))
    return (
        # Marginal tables are vocabulary-sized (grow with the corpus) —
        # no forced broadcast; AQE chooses. Only the 1-row total keeps
        # its hint.
        pair_counts.where(F.col("n_ab") >= min_count)
        .join(first_counts, "a")
        .join(second_counts, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "n_ab",
            F.expr("(n_ab * n_total * 10000) div (n_a * n_b)").alias("lift_e4"),
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition metrics per document — the quality
    filter that catches boilerplate and degenerate generations:
    duplicate-word share, duplicate-trigram share, and the share of
    bigram slots held by the single most frequent bigram.

    All three are integer e4 basis points (``div`` — engine-exact, no
    float rounding). Word/trigram duplication is pure per-row array
    arithmetic (size vs size(array_distinct)) — zero shuffle; the
    top-bigram mode needs a frequency table, so NON-distinct bigrams
    explode once and aggregate twice on the doc key (partial aggs both
    hops, per-doc stats ride along as group keys — documents never
    scan twice). Docs under 2 tokens have no bigram slots and drop out.
    """
    # Tokenize ONCE into a materialized projection: every derived metric
    # references the `w` attribute, not a re-inlined regex split (Catalyst
    # keeps the projection because tokens() is not collapse-cheap). The
    # n-gram builders then reference `w` by attribute too, so the
    # codegen'd expression tree stays small.
    w = F.col("w")
    bi = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.array_join(F.slice(w, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.array_join(F.slice(w, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    toks = spread(docs).select("doc_id", TX.tokens(F.col("text")).alias("w"))
    arrs = toks.select("doc_id", "w", tri.alias("tri"), bi.alias("bi"))
    # explode_OUTER: a plain explode would infer a size(bi) > 0 filter
    # and push it below the projections, re-inlining the whole n-gram
    # build into a per-row Filter (measured 5x slower). Empty-bigram
    # docs surface as one NULL-gram row and are dropped by the final
    # n_tokens >= 2 cut instead.
    base = arrs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_tokens"),
        F.size(F.col("tri")).cast("bigint").alias("n_tri"),
        F.size(F.array_distinct(F.col("tri"))).cast("bigint").alias("n_distinct_tri"),
        F.explode_outer(F.col("bi")).alias("gram"),
    )
    stat_keys = ["doc_id", "n_tokens", "n_distinct_tokens", "n_tri", "n_distinct_tri"]
    per_gram = base.groupBy(*stat_keys, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_gram.groupBy(*stat_keys)
        .agg(
            F.max("cnt").cast("bigint").alias("top_bigram_cnt"),
            F.sum("cnt").cast("bigint").alias("n_bi"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (10000 * (n_tokens - n_distinct_tokens)) div n_tokens END"
            ).alias("dup_word_e4"),
            F.expr(
                "CASE WHEN n_tri = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (10000 * (n_tri - n_distinct_tri)) div n_tri END"
            ).alias("dup_trigram_e4"),
            F.expr("(10000 * top_bigram_cnt) div n_bi").alias("top_bigram_e4"),
        )
        .where(F.col("n_tokens") >= 2)
    )


def bpe_pair_stats(docs: DataFrame, k: int = 40) -> DataFrame:
    """First iteration of BPE vocabulary induction: corpus-wide adjacent
    character-pair frequencies, word-weighted — the statistic whose
    argmax becomes the first merge rule.

    Scale design (the trick real BPE trainers use): aggregate the corpus
    to DISTINCT words with counts FIRST (one word-keyed shuffle with
    map-side combine; vocabulary grows ~ Heaps' law, sublinearly in
    corpus size), then explode each distinct word into its
    ``len(word)-1`` adjacent pairs and weight by the word count. The
    expensive explode runs over the vocabulary, not the corpus —
    at 100 TB that is the difference between ~10^6 and ~10^13 exploded
    rows. Top-k plans as TakeOrderedAndProject (no global sort).
    """
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
        )
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(k)
    )


def tokenizer_drift(docs: DataFrame) -> DataFrame:
    """Dual-tokenizer audit: whitespace token counts vs the BPE-ish
    regex tokenizer, per document — the drift check a training pipeline
    runs before switching tokenizers (token budgets, packing lengths
    and quality thresholds all shift with the tokenizer).

    Both counts are single regexp_count expressions in codegen (the
    pattern is RE2/Java-compatible so both engines count identically);
    the ratio ships as basis points through non-negative integer
    division. No explode — cost is one scan.
    """
    ws = F.regexp_count(F.col("text"), F.lit(r"\S+"))
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_PATTERN))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    ).withColumn(
        "ratio_bp",
        F.expr("(10000 * bpe_tokens) div greatest(ws_tokens, 1)"),
    )


def source_divergence(docs: DataFrame, top_terms: int = 100) -> DataFrame:
    """Distribution-shift detector: the L1 (total-variation-style)
    distance between each source's term distribution and the corpus
    distribution, over the corpus' ``top_terms`` head terms — the check
    a data pipeline runs when a new crawl snapshot lands.

    Integer-exact throughout: |o_st/n_s - c_t/N| summed over head terms
    becomes (10000 * SUM |o_st*N - c_t*n_s|) div (n_s*N) — one common
    denominator, every factor a BIGINT, the absolute values keep the
    single division non-negative (where both engines' integer division
    agree). Overflow headroom: the numerator is bounded by
    top_terms * n_s * N * 1e4, inside int64 through corpus sizes of
    ~3e6 tokens per source; beyond that the same formula runs in
    DECIMAL(38). Restricting to head terms bounds the per-source row
    count (the dense grid is sources x top_terms) and the tail is noise
    anyway.
    """
    toks = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        )
        .where(F.length("term") >= 2)
    )
    corpus_term = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c_t"))
    head = corpus_term.orderBy(F.desc("c_t"), F.asc("term")).limit(top_terms)
    obs = toks.join(F.broadcast(head), "term").groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("o_st")
    )
    n_s = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_total = toks.agg(F.count(F.lit(1)).alias("n"))
    grid = n_s.crossJoin(F.broadcast(head))  # dense: absent cells = 0
    cells = grid.join(obs, ["source", "term"], "left").select(
        "source",
        "n_s",
        "c_t",
        F.coalesce("o_st", F.lit(0)).alias("o_st"),
    )
    scored = cells.crossJoin(F.broadcast(n_total)).select(
        "source",
        "n_s",
        "n",
        F.abs(F.col("o_st") * F.col("n") - F.col("c_t") * F.col("n_s")).alias(
            "dev"
        ),
    )
    return scored.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.expr("(10000 * sum(dev)) div (max(n_s) * max(n))")
        .cast("long")
        .alias("l1_bp"),
    )


def bigram_surprisal(docs: DataFrame) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — the
    second-order perplexity-filtering primitive (unigram_surprisal
    scores vocabulary rarity; this scores SEQUENCE plausibility:
    shuffled or machine-mangled text keeps its unigram profile but
    loses its bigram structure).

    Model: P(b|a) = (c(a,b) + 1) / (c(a,*) + V), V = |vocabulary|.
    Engine-exact by the same discipline as unigram_surprisal: each
    bigram's surprisal quantizes to integer millibits (floor(x*1000 +
    0.5) over exact-int inputs — one IEEE expression) BEFORE the
    per-doc sum, so aggregation order cannot matter.

    Scale: bigrams generate inline per document (transform over the
    token array — no positional self-join) and explode once; the
    (a, b) count table is the only corpus-sized aggregate and joins
    back UNHINTED (AQE broadcasts while small, shuffles at vocab^2
    scale); the first-token marginal is a re-aggregation of that
    table; V attaches as a 1-row broadcast."""
    toked = spread(docs).select(
        "doc_id", TX.tokens(F.col("text")).alias("w")
    )
    grams = toked.where(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(w)), i -> "
                "struct(element_at(w, i - 1) AS a, element_at(w, i) AS b))"
            )
        ).alias("g"),
    ).select("doc_id", "g.a", "g.b")
    counts = grams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    firsts = counts.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vsize = toked.select(F.explode("w").alias("t")).agg(
        F.count_distinct("t").alias("v")
    )
    mb = F.floor(
        F.log2(
            (F.col("c_a") + F.col("v")).cast("double")
            / (F.col("c_ab") + 1).cast("double")
        )
        * 1000
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        grams.join(counts, ["a", "b"])
        .join(firsts, "a")
        .crossJoin(F.broadcast(vsize))
        .select("doc_id", mb.alias("mb"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("mb").alias("surprisal_mb"),
    ).withColumn("avg_surprisal_mb", F.expr("surprisal_mb div n_bigrams"))


def extract_numbers(docs: DataFrame) -> DataFrame:
    """Structured extraction from free text: every digit run (capped at
    9 digits so the cast can't overflow; both engines chunk long runs
    greedily left-to-right, so the cap is cross-engine stable) pulled
    with regexp_extract_all and reduced per document — the log-parsing
    / entity-extraction primitive as one codegen expression, no UDF.

    Emits per doc: run count, their BIGINT sum, and the max run."""
    nums = F.expr(r"regexp_extract_all(text, '[0-9]{1,9}', 0)")
    vals = F.expr(
        r"transform(regexp_extract_all(text, '[0-9]{1,9}', 0), "
        "x -> CAST(x AS BIGINT))"
    )
    return spread(docs).select(
        "doc_id",
        F.size(nums).cast("long").alias("n_numbers"),
        F.expr(
            r"aggregate(transform(regexp_extract_all(text, '[0-9]{1,9}', 0), "
            "x -> CAST(x AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("number_sum"),
        F.array_max(vals).alias("max_number"),
    )


def sentence_stats(docs: DataFrame) -> DataFrame:
    """Sentence segmentation stats — the document-structure signal
    (mean sentence length separates prose from listy/boilerplate text;
    a single "sentence" spanning the whole doc usually means missing
    punctuation, i.e. not prose at all). Sentences split on [.!?]+
    runs, whitespace-trimmed, empties dropped — one codegen expression
    per row, regex semantics identical across engines.

    Emits per doc: sentence count, total sentence characters, mean
    length in e2 (truncating div over non-negative ints), and the
    longest sentence's length."""
    sents = F.expr(
        r"filter(transform(split(text, '[.!?]+'), x -> trim(x)), "
        "x -> x != '')"
    )
    lens = F.expr(
        r"transform(filter(transform(split(text, '[.!?]+'), x -> trim(x)), "
        "x -> x != ''), s -> CAST(length(s) AS BIGINT))"
    )
    return spread(docs).select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.expr(
            r"aggregate(transform(filter(transform(split(text, '[.!?]+'), "
            "x -> trim(x)), x -> x != ''), s -> CAST(length(s) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("total_chars"),
        F.array_max(lens).alias("max_sentence_chars"),
    ).withColumn(
        "mean_len_e2",
        F.when(
            F.col("n_sentences") > 0,
            F.expr("(100 * total_chars) div n_sentences"),
        ).otherwise(F.lit(0).cast("long")),
    )


def readability_lix(docs: DataFrame) -> DataFrame:
    """LIX readability per source — the punctuation-and-length formula
    (words/sentences + 100 * longwords/words) that needs no syllable
    dictionary, which keeps it deterministic and cross-engine exact:
    words are the [^a-z]+ split (the module's tokenizer convention),
    long words are > 6 letters, sentences the [.!?]+ split used by
    sentence_stats. Everything is HOF size()/filter() codegen per row
    — no explode, no shuffle until the per-source rollup.

    lix_e2 = (100*words) div sentences + (10000*long) div words, exact
    integer per doc; docs without a word or a sentence are excluded
    (0-denominator rows carry no readability signal). Emits per
    source: doc count, truncating-mean lix_e2, and the max.
    """
    words = "filter(split(lower(text), '[^a-z]+'), x -> x != '')"
    sents = "filter(transform(split(text, '[.!?]+'), x -> trim(x)), x -> x != '')"
    per = docs.select(
        "source",
        F.expr(f"size({words})").cast("long").alias("n_words"),
        F.expr(
            f"size(filter({words}, x -> length(x) > 6))"
        ).cast("long").alias("n_long"),
        F.expr(f"size({sents})").cast("long").alias("n_sentences"),
    ).where((F.col("n_words") > 0) & (F.col("n_sentences") > 0))
    lix = per.withColumn(
        "lix_e2",
        F.expr(
            "(100 * n_words) div n_sentences + (10000 * n_long) div n_words"
        ),
    )
    return lix.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(lix_e2) div count(1)").alias("mean_lix_e2"),
        F.max("lix_e2").cast("long").alias("max_lix_e2"),
    )


def zipf_slope(docs: DataFrame, top_n: int = 256) -> DataFrame:
    """Zipf rank-frequency slope over the TOP-N corpus terms — the
    one-number corpus-health check (natural language sits near -1;
    templated/boilerplate corpora flatten, spam steepens). OLS of
    log2(count) on log2(rank) in closed form from exact sums — the
    ols_two_factor stance applied to the log-log plane.

    Exactness: per-term log2 values are quantized to e3 integers
    (MILLIBITS — the module's surprisal convention) FIRST — one shared
    IEEE log2 per row, then BIGINT sums — so the OLS numerator and
    denominator are exact integer arithmetic; only the final ratio is
    one double division. e3 rather than e6 on purpose: the n*Sxy and
    Sx*Sy cross-products must stay inside int64 even when counts reach
    2^40 at full corpus scale (e6 would overflow at ~1e19). Rank is
    deterministic (count desc, term asc).

    Scale: term counts are one map-side-combinable aggregate; top-N
    selection is orderBy+limit (TakeOrderedAndProject — per-partition
    partial top-k, no global sort); the N-row OLS runs on a
    constant-bounded frame. The rank window is over top_n rows only.
    """
    counts = (
        docs.select(
            F.explode(
                F.expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    pts = counts.select(
        F.floor(
            F.lit(1000.0)
            * F.log2(F.row_number().over(w).cast("double"))
        ).cast("long").alias("x"),
        F.floor(
            F.lit(1000.0) * F.log2(F.col("cnt").cast("double"))
        ).cast("long").alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.where(den > 0).select(
        F.col("n").cast("long").alias("n_terms"),
        F.floor(
            F.lit(1000.0) * num.cast("double") / den.cast("double")
        ).cast("long").alias("slope_e3"),
    )


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Per-class evaluation of the language-ID classifier against the
    labeled column — confusion-matrix margins with precision/recall/
    F1 in exact bp (the ML-eval readout every classifier audit starts
    from, here over language_id's own deterministic predictions).

    tp/fp/fn come from two enum-bounded aggregates (by predicted and
    by labeled class) full-outer-joined on the class — the margins
    ARE the confusion matrix summaries, no |classes|^2 materialization
    needed for per-class metrics. F1 is computed from the bp-integer
    precision/recall by exact cross-multiplication; classes with no
    predictions (or no labels) keep NULL for the undefined metric.
    """
    pred = language_id(docs).select(
        "labeled_lang",
        "pred_lang",
        (F.col("labeled_lang") == F.col("pred_lang"))
        .cast("long")
        .alias("hit"),
    )
    by_pred = pred.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum("hit").alias("tp_p"),
    )
    by_label = pred.groupBy(F.col("labeled_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_labeled"),
        F.sum("hit").alias("tp_l"),
    )
    j = by_pred.join(by_label, "cls", "full_outer").select(
        "cls",
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        F.coalesce("n_labeled", F.lit(0)).alias("n_labeled"),
        F.greatest(
            F.coalesce("tp_p", F.lit(0)), F.coalesce("tp_l", F.lit(0))
        ).alias("tp"),
    )
    staged = j.select(
        "cls",
        F.col("n_labeled").cast("long").alias("n_labeled"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("tp").cast("long").alias("tp"),
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_labeled") - F.col("tp")).alias("fn"),
        F.when(
            F.col("n_pred") > 0, F.expr("(10000 * tp) div n_pred")
        ).alias("prec_bp"),
        F.when(
            F.col("n_labeled") > 0, F.expr("(10000 * tp) div n_labeled")
        ).alias("rec_bp"),
    )
    return staged.withColumn(
        "f1_bp",
        F.expr(
            "CASE WHEN prec_bp IS NOT NULL AND rec_bp IS NOT NULL "
            "AND prec_bp + rec_bp > 0 "
            "THEN (2 * prec_bp * rec_bp) div (prec_bp + rec_bp) END"
        ).cast("long"),
    )


def langid_kappa(docs: DataFrame) -> DataFrame:
    """Cohen's kappa for the language-ID classifier — chance-corrected
    agreement, the one number that deflates accuracy on skewed class
    mixes. Exact rational form: with S = sum_c n_labeled_c *
    n_pred_c, kappa = (n * sum_tp - S) / (n^2 - S) — every term an
    exact BIGINT; only the final ratio is one floored double in e6.

    Margins are enum-bounded aggregates; the kappa row is a 1-row
    reduction over |classes| rows.
    """
    pred = language_id(docs).select(
        "labeled_lang",
        "pred_lang",
        (F.col("labeled_lang") == F.col("pred_lang"))
        .cast("long")
        .alias("hit"),
    )
    by_pred = pred.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    by_label = pred.groupBy(F.col("labeled_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_labeled")
    )
    margins = by_pred.join(by_label, "cls", "full_outer").select(
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        F.coalesce("n_labeled", F.lit(0)).alias("n_labeled"),
    )
    s = margins.agg(
        F.sum(F.col("n_pred") * F.col("n_labeled")).alias("s")
    )
    totals = pred.agg(
        F.count(F.lit(1)).alias("n"), F.sum("hit").alias("sum_tp")
    )
    return (
        totals.crossJoin(F.broadcast(s))
        .where(F.col("n") * F.col("n") > F.col("s"))
        .select(
            F.col("n").cast("long").alias("n_docs"),
            F.col("sum_tp").cast("long").alias("n_agree"),
            F.col("s").cast("long").alias("chance_term"),
            F.floor(
                F.lit(1_000_000.0)
                * (
                    F.col("n") * F.col("sum_tp") - F.col("s")
                ).cast("double")
                / (
                    F.col("n") * F.col("n") - F.col("s")
                ).cast("double")
            ).cast("long").alias("kappa_e6"),
        )
    )


def doc_keywords(docs: DataFrame, k: int = 3, min_df: int = 2) -> DataFrame:
    """Top-k TF-IDF keywords per document — the extractive-keyword
    primitive (tfidf_similar ranks document PAIRS; this surfaces the
    terms themselves). Score = tf * idf_mb with idf quantized to
    integer millibits (floor(1000 * log2(n_docs / df)) — the module's
    log convention), so ranking is pure BIGINT; ties break on the
    term string.

    Scale: postings explode once; the df table joins back UNHINTED
    (vocabulary grows with the corpus — AQE decides); n_docs is a
    1-row broadcast; the per-doc top-k window partitions by doc_id
    (group size bounded by doc vocabulary).
    """
    postings = (
        spread(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(split(lower(text), '[^a-z]+'), x -> x != '')"
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).where(F.col("df") >= min_df)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(df_tab, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.floor(
                    F.lit(1000.0)
                    * F.log2(
                        F.col("n_docs").cast("double") / F.col("df")
                    )
                ).cast("long")
            ).alias("score_mb"),
        )
        .where(F.col("score_mb") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_mb"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "doc_id",
            F.col("rk").cast("long").alias("rk"),
            "term",
            F.col("score_mb").cast("long").alias("score_mb"),
        )
    )


def hapax_rate(docs: DataFrame) -> DataFrame:
    """Vocabulary richness per source: vocabulary size, hapax
    legomena (terms seen exactly once) share, and the type-token
    ratio — the fastest corpus-quality fingerprint (templated text
    has few hapaxes and a tiny TTR; scraped natural prose is hapax-
    heavy). One explode -> per-(source, term) counts -> one
    source-grain rollup; everything integer, ratios in bp/e4.
    """
    counts = (
        spread(docs)
        .select(
            "source",
            F.explode(
                F.expr(
                    "filter(split(lower(text), '[^a-z]+'), x -> x != '')"
                )
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("tf") == 1).cast("long"))
        .cast("long")
        .alias("n_hapax"),
        F.sum("tf").cast("long").alias("n_tokens"),
    ).select(
        "source",
        "vocab_size",
        "n_hapax",
        "n_tokens",
        F.expr("(10000 * n_hapax) div vocab_size").alias("hapax_bp"),
        F.expr("(10000 * vocab_size) div n_tokens").alias("ttr_bp"),
    )


def term_burstiness(docs: DataFrame, top_k: int = 50, min_df: int = 3) -> DataFrame:
    """Term burstiness — collection frequency over document frequency
    (Church & Gale's clumping signal): a term with cf/df near 1
    sprinkles once per document (function-word behavior); a high
    ratio means the term CLUMPS into few documents (topical/entity
    behavior — the terms worth indexing). Emits the top-k burstiest
    terms above ``min_df`` with exact integer evidence
    (burst_e2 = 100*cf div df).

    One explode -> (term, doc) counts -> term-grain rollup -> top-k
    via TakeOrderedAndProject. The ranking is total (burst desc, cf
    desc, term asc).
    """
    td = (
        spread(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(split(lower(text), '[^a-z]+'), x -> x != '')"
                )
            ).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = td.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cf"),
        F.count(F.lit(1)).alias("df"),
    ).where(F.col("df") >= min_df)
    return (
        stats.select(
            "term",
            "cf",
            F.col("df").cast("long").alias("df"),
            F.expr("(100 * cf) div df").alias("burst_e2"),
        )
        .orderBy(
            F.desc("burst_e2"), F.desc("cf"), F.asc("term")
        )
        .limit(top_k)
    )


def unseen_mass(docs: DataFrame) -> DataFrame:
    """Good-Turing unseen-probability mass per source: P0 = N1 / N
    (singleton token count over total tokens) with the
    frequency-of-frequencies head (N1..N3) as evidence — the LLM-
    corpus question "how much of this domain's vocabulary have we NOT
    crawled yet" answered from counts alone. A source with high P0
    needs more crawling; one near zero is saturated.

    One explode -> (source, term) counts -> frequency-of-frequency
    rollup; all integers, P0 in bp.
    """
    counts = (
        spread(docs)
        .select(
            "source",
            F.explode(
                F.expr(
                    "filter(split(lower(text), '[^a-z]+'), x -> x != '')"
                )
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return counts.groupBy("source").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum((F.col("tf") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("tf") == 2).cast("long")).cast("long").alias("f2"),
        F.sum((F.col("tf") == 3).cast("long")).cast("long").alias("f3"),
    ).withColumn(
        "unseen_bp", F.expr("(10000 * f1) div n_tokens")
    )


def style_profile(docs: DataFrame) -> DataFrame:
    """Character-class style fingerprint per source: shares of upper-
    case, digit, punctuation, and whitespace characters in bp — the
    cheapest source-provenance signal (code-heavy, shouty, tabular,
    and prose sources separate immediately). Four regexp_replace
    lengths per row (identical RE2-safe classes on both engines),
    summed exactly, shares by truncating division.
    """
    n = F.length("text").cast("long")
    def cls(pat: str) -> F.Column:
        return (
            n
            - F.length(F.regexp_replace(F.col("text"), pat, ""))
        ).cast("long")
    per = docs.select(
        "source",
        n.alias("n_chars"),
        cls(r"[A-Z]").alias("n_upper"),
        cls(r"[0-9]").alias("n_digit"),
        cls(r"[.,;:!?'\"()-]").alias("n_punct"),
        cls(r"\s").alias("n_space"),
    )
    return per.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.expr("(10000 * sum(n_upper)) div sum(n_chars)").alias(
            "upper_bp"
        ),
        F.expr("(10000 * sum(n_digit)) div sum(n_chars)").alias(
            "digit_bp"
        ),
        F.expr("(10000 * sum(n_punct)) div sum(n_chars)").alias(
            "punct_bp"
        ),
        F.expr("(10000 * sum(n_space)) div sum(n_chars)").alias(
            "space_bp"
        ),
    )


def quality_by_lang(docs: DataFrame, pass_e2: int = 75) -> DataFrame:
    """Quality-gate pass rates per labeled language — the corpus-mix
    governance readout (a language whose pass rate collapses is a
    crawler or boilerplate problem localized to that pipeline): the
    module's quality_score rolled up by the label, with the e2 score
    kept integral (0.25 steps -> exact 25s) so means and pass flags
    are pure integers.

    One pass over quality_score's codegen features + an enum-bounded
    rollup.
    """
    scored = quality_score(docs).select(
        "doc_id",
        F.round(F.col("quality") * 100).cast("long").alias("q_e2"),
    ).join(docs.select("doc_id", "lang"), "doc_id")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(q_e2) div count(1)").alias("mean_quality_e2"),
        F.expr(
            f"(10000 * sum(CASE WHEN q_e2 >= {pass_e2} THEN 1 ELSE 0 "
            "END)) div count(1)"
        ).alias("pass_bp"),
    )


def lang_source_matrix(docs: DataFrame) -> DataFrame:
    """Language x source coverage matrix: document counts per cell
    with the within-source share — the corpus-mix table every
    multilingual data plan starts from (a source whose language mix
    shifts is a crawler routing change). Enum-bounded output; one
    contingency aggregate + a source-partitioned share window.
    """
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return cells.select(
        "source",
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.expr(
            "(10000 * n_docs) div sum(n_docs) OVER "
            "(PARTITION BY source)"
        ).alias("share_bp"),
    )


def token_p90_by_lang(docs: DataFrame) -> DataFrame:
    """Token-count P50/P90 per labeled language — the context-window
    planning table at language grain (tokenizers inflate some
    languages; packing budgets set on the corpus average overflow on
    the long-tail language). Whitespace-token counts per doc, then
    value-at-rank quantiles over each language's count histogram —
    exact integers throughout.
    """
    counts = docs.select(
        "lang",
        F.size(
            F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
        ).cast("long").alias("n_tok"),
    )
    hist = counts.groupBy("lang", "n_tok").agg(
        F.count(F.lit(1)).alias("t")
    )
    cw = (
        Window.partitionBy("lang")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("lang")
    r = hist.select(
        "lang",
        "n_tok",
        (F.sum("t").over(cw) - F.col("t") + 1).alias("lo"),
        F.sum("t").over(cw).alias("hi"),
        F.sum("t").over(tot).alias("n"),
    )
    qs = r.select(
        "lang",
        "n_tok",
        "lo",
        "hi",
        "n",
        F.explode(F.array(F.lit(50), F.lit(90))).alias("q"),
    ).where(
        (F.expr("(n - 1) * q div 100 + 1") >= F.col("lo"))
        & (F.expr("(n - 1) * q div 100 + 1") <= F.col("hi"))
    )
    return qs.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.min(F.when(F.col("q") == 50, F.col("n_tok")))
        .cast("long")
        .alias("p50_tokens"),
        F.min(F.when(F.col("q") == 90, F.col("n_tok")))
        .cast("long")
        .alias("p90_tokens"),
    )
