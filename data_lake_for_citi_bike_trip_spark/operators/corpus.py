"""Corpus-level data-prep operators for training pipelines.

Deterministic-by-hash everywhere: splits and samples must be reproducible
across runs, engines, and cluster sizes, so nothing here uses rand() —
assignment is pure arithmetic on md5 of a stable key. That also makes
every operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..session import spread

#: scrubbing patterns (mirrored verbatim in the DuckDB oracle)
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def hash_bucket(key, buckets: int = 100):
    """Stable bucket in [0, buckets): first 8 md5 hex chars mod buckets."""
    return TX.token_hash32(key.cast("string")) % buckets


def train_test_split(
    docs: DataFrame, val_pct: int = 10, test_pct: int = 10, salt: str = "split-v1"
) -> DataFrame:
    """Reproducible three-way split keyed on md5(doc_id || salt).

    Salted so re-splitting with a new salt reshuffles; bucket arithmetic
    (not rand()) so membership is stable under any partitioning/retry.
    """
    bucket = hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", bucket.cast("bigint").alias("bucket"), split.alias("split"))


def sample_by_hash(docs: DataFrame, pct: int = 10, salt: str = "sample-v1") -> DataFrame:
    """Deterministic pct% sample (same keys selected on every run/engine)."""
    bucket = hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    return docs.where(bucket < pct).select("doc_id", "lang", "n_chars")


def vocabulary(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """Corpus vocabulary: token document-frequency and collection-frequency,
    top-k by collection frequency (deterministic tie-break on token).

    explode -> two-level aggregate: the shuffle carries (token, partial
    counts) after map-side combine; top-k is a single window over the
    aggregated (small) vocab table.
    """
    exploded = (
        spread(docs)
        .select("doc_id", TX.tokens(F.col("text")).alias("w"))
        .select("doc_id", F.explode_outer(F.col("w")).alias("token"))
        .where(F.col("token").isNotNull())
    )
    counts = exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("cf"),
        F.count_distinct("doc_id").alias("df"),
    )
    # distributed top-k (TakeOrderedAndProject), then rank the k survivors —
    # a global row_number window would single-partition the whole vocab
    topk = counts.orderBy(F.desc("cf"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("cf"), F.asc("token"))
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint"))


def scrub_text(docs: DataFrame) -> DataFrame:
    """PII/URL scrubbing: emails then URLs replaced with sentinel tokens.

    Order matters (emails first — a URL pattern could otherwise eat an
    embedded email); single regexp_replace pass each, whole-stage codegen.
    """
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_PATTERN, "<EMAIL>"),
        URL_PATTERN,
        "<URL>",
    )
    return docs.select(
        "doc_id",
        scrubbed.alias("clean_text"),
        (F.length("text") - F.length(scrubbed)).cast("bigint").alias("chars_removed"),
    )


def length_histogram(docs: DataFrame, bucket_chars: int = 100) -> DataFrame:
    """Doc-length histogram (fixed-width buckets) — the size profile a
    pipeline uses to set batch/sequence budgets."""
    # integer div, not float-div-then-cast: double->bigint casts truncate in
    # Spark but round in DuckDB
    bucket = F.expr(f"n_chars div {bucket_chars}")
    return docs.groupBy(bucket.alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, stride: int = 48
) -> DataFrame:
    """Split documents into overlapping fixed-token chunks (training-prep
    windowing). One explode over precomputed window starts; chunk text is
    rebuilt with slice/array_join so everything stays in codegen.

    Windows start at 0, stride, 2*stride, ... and the last window is the
    first one that reaches the end of the doc (no degenerate tail chunks).
    """
    w = TX.tokens(F.col("text"))
    n = F.size(w)
    n_starts = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)).cast("double") / stride).cast("int") + 1,
        F.lit(1),
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_starts - 1), lambda i: i * stride
    )
    chunked = spread(docs).select(
        "doc_id",
        w.alias("w"),
        F.explode(starts).alias("start"),
    )
    piece = F.slice(F.col("w"), F.col("start") + 1, chunk_tokens)
    return chunked.select(
        "doc_id",
        F.col("start").cast("bigint").alias("chunk_start"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("bigint").alias("chunk_tokens"),
    )


def llm_prep_pipeline(docs: DataFrame, quality_threshold: float = 0.75) -> DataFrame:
    """The composed training-data pipeline: scrub -> quality gate ->
    exact-dedup (survivor = min doc_id per content hash) -> split.

    Each stage is one of this module's/text.py's operators; composing them
    keeps a single declarative plan end-to-end (Catalyst pipelines the
    scans; the only shuffles are the dedup groupBy and nothing else —
    split/scrub/quality are map-side)."""
    from . import text as text_ops

    scrubbed = scrub_text(docs).select("doc_id", "clean_text")
    quality = text_ops.quality_score(docs).select("doc_id", "quality")
    survivors = (
        scrubbed.join(quality, "doc_id")
        .where(F.col("quality") >= quality_threshold)
        # dedup on the SCRUBBED content: two docs differing only in
        # stripped PII/URLs are duplicates for training purposes
        .groupBy(F.md5("clean_text").alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    split = train_test_split(docs).select("doc_id", "split")
    return (
        survivors.join(split, "doc_id")
        .join(quality, "doc_id")
        .select("doc_id", "content_hash", "split", "quality")
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int = 512,
    n_groups: int = 8,
    salt: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM pretraining: documents
    are hash-assigned to ``n_groups`` independent packing streams, laid
    end-to-end in deterministic (doc_id) order within each stream, and
    cut into ``context_len``-token bins. Emits where each doc lands
    (bin_id + bin_offset); a doc straddling a boundary continues into the
    next bin — exactly the layout of a packed pretraining shard.

    Scale: ONE shuffle (window partitioned on pack_group); each stream
    packs independently, so parallelism == n_groups — size it to the
    cluster (executors x cores), not the corpus. Assignment is hash
    arithmetic, not rand(), so shards are reproducible run-over-run.
    """
    g = TX.token_hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit(salt))
    ) % n_groups
    base = docs.select(
        "doc_id",
        g.cast("bigint").alias("pack_group"),
        F.size(TX.tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        "doc_id",
        "pack_group",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_offset"),
    ).selectExpr(
        "doc_id",
        "pack_group",
        "n_tokens",
        "start_offset",
        f"start_offset div {context_len} AS bin_id",
        f"start_offset % {context_len} AS bin_offset",
    )


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    default_pct: int = 0,
    salt: str = "strat-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing primitive
    of a pretraining pipeline (keep 100% of one source, 25% of another).

    Membership is hash arithmetic on doc_id (reproducible across runs,
    engines, partitionings); the rates table is broadcast (strata counts
    are tiny next to the corpus); strata absent from ``rates`` fall back
    to ``default_pct``.
    """
    spark = docs.sparkSession
    rates_df = spark.createDataFrame(
        [(s, int(p)) for s, p in sorted(rates.items())],
        f"{stratum_col} string, pct int",
    )
    bucket = hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    return (
        docs.join(F.broadcast(rates_df), stratum_col, "left")
        .where(bucket < F.coalesce(F.col("pct"), F.lit(default_pct)))
        .select("doc_id", stratum_col, "source")
    )


def sample_per_group(
    docs: DataFrame, key: str = "source", k: int = 20, salt: str = "pergroup-v1"
) -> DataFrame:
    """Exactly-k-per-group sampling (the distributed stand-in for a
    per-key reservoir): rows rank within their group by a salted md5 of
    their id — a deterministic pseudo-random order any engine reproduces
    — and the first ``k`` survive. Balanced per-domain subsets for eval
    sets / data mixes, without rand() (reruns and retries agree).

    One window over the group key (single shuffle); rank <= k cuts
    early via the window's TopK sort. Change ``salt`` to draw a fresh
    sample."""
    order_key = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    w = Window.partitionBy(key).orderBy(order_key, F.col("doc_id"))
    return (
        docs.select(key, "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
    )


def contamination_check(
    docs: DataFrame,
    n: int = 5,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split-v1",
    flag_e1: int = 1,
) -> DataFrame:
    """Train→test n-gram decontamination audit (the eval-leakage check
    every pretraining pipeline runs before trusting its benchmarks).

    Reuses ``train_test_split``'s hash assignment, then: distinct word
    ``n``-grams per doc (hashed to 32-bit ints so the shuffle carries
    ints, not 5-word strings), the train side collapsed to a distinct
    gram set, and each TEST doc scored by how many of its grams appear
    in train. Output per test doc: gram counts, overlap in e4 basis
    points (integer ``div`` — engine-exact), and a flag at
    ``flag_e1``/10 fraction (integer cross-multiply, no float compare).

    Scale: the gram set never collects — train-distinct, the left join,
    and the per-doc rollup are three key shuffles, all partial-agged.
    Docs shorter than ``n`` tokens have no grams and drop out (they
    cannot be contaminated). At production scale widen token_hash32 to
    a 64/128-bit gram hash to keep false-hit odds negligible.
    """
    bucket = hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    # Tokenize into a materialized column, then shingle the attribute and
    # explode_outer: a plain explode over the inline expression makes
    # Catalyst infer size(...) > 0 and push the whole tokenize+shingle
    # tree into a per-row Filter (it would run 3x per row).
    toks = spread(docs).select(
        "doc_id", split.alias("split"), TX.tokens(F.col("text")).alias("w")
    )
    grams = (
        toks.select(
            "doc_id",
            "split",
            F.explode_outer(TX.shingles_of(F.col("w"), n)).alias("gram"),
        )
        .where(F.col("gram").isNotNull())
        .select("doc_id", "split", TX.token_hash32(F.col("gram")).alias("g"))
    )
    train = grams.where(F.col("split") == "train").select("g").distinct()
    test = grams.where(F.col("split") == "test").select("doc_id", "g")
    return (
        test.join(train.withColumn("hit", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "hits",
            F.expr("(10000 * hits) div n_grams").alias("contam_e4"),
            (F.col("hits") * 10 >= F.col("n_grams") * flag_e1).alias("flagged"),
        )
    )


#: default mixture for the contract query: epochs in hundredths per
#: source domain (250 = 2.5 epochs, 0 = drop the domain entirely);
#: unlisted domains default to 100 (exactly one epoch).
DEFAULT_MIXTURE_E2: dict[str, int] = {"src0": 250, "src1": 130, "src2": 0, "src3": 75}


def mixture_epochs(
    docs: DataFrame,
    epochs_e2: dict[str, int] | None = None,
    default_e2: int = 100,
    salt: str = "mix-v1",
) -> DataFrame:
    """Domain-mixture materialization WITH repetition — the upsampling
    half of data mixing that ``sample_stratified`` (downsample-only)
    cannot express: a domain weighted 2.5 epochs emits every doc twice
    plus a deterministic hash-chosen half of docs a third time.

    Weights are integers in hundredths of an epoch (no float rates —
    reruns, retries, and the oracle agree exactly). Each doc emits
    ``e2 div 100`` full copies plus one extra iff its salted hash
    bucket falls below ``e2 % 100``; copies materialize via
    sequence+explode (rows never round-trip through the driver) with a
    ``copy_id`` so downstream shuffles can tell copies apart. The
    weight table is broadcast.
    """
    spark = docs.sparkSession
    weights = DEFAULT_MIXTURE_E2 if epochs_e2 is None else epochs_e2
    w_df = spark.createDataFrame(
        [(s, int(e)) for s, e in sorted(weights.items())], "source string, e2 int"
    )
    bucket = hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    tagged = (
        docs.join(F.broadcast(w_df), "source", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("e2"), F.lit(default_e2)).alias("e2"),
            bucket.alias("b"),
        )
        .withColumn(
            "n_copies",
            F.expr("e2 div 100") + (F.col("b") < F.col("e2") % 100).cast("int"),
        )
    )
    copies = F.when(
        F.col("n_copies") >= 1, F.sequence(F.lit(1), F.col("n_copies"))
    ).otherwise(F.array().cast("array<int>"))
    return tagged.select(
        "doc_id", "source", F.explode(copies).alias("copy_id")
    ).withColumn("copy_id", F.col("copy_id").cast("bigint"))


def boilerplate_chunks(
    docs: DataFrame,
    chunk_tokens: int = 8,
    stride: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document boilerplate detector: fixed-token chunks (via
    ``chunk_documents``) that recur in >= ``min_docs`` DISTINCT docs —
    headers, footers, license blocks, templated spam. Deduplicating
    these *chunks* (vs whole docs) is what substring-level dedup does
    at corpus scale.

    One chunking explode + one groupBy; distinct-doc counting rides the
    same aggregate. The chunk text itself is the key here for
    contract-readability — at 100 TB pre-hash the chunk (128-bit) and
    carry ``min(chunk_text)`` as the exemplar so the shuffle moves
    fixed-width keys.
    """
    chunks = chunk_documents(docs, chunk_tokens, stride)
    return (
        chunks.groupBy("chunk_text")
        .agg(
            F.count_distinct(F.col("doc_id")).cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            TX.token_hash32(F.col("chunk_text")).alias("chunk_hash"),
            "chunk_text",
            "n_docs",
            "n_occurrences",
        )
    )


def sample_weighted(
    docs: DataFrame, weight_col: str = "n_chars", k: int = 50,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted priority sample: each row draws a stable
    uniform 32-bit integer from md5(doc_id || salt) and keeps priority
    ``u div weight`` — larger weights systematically shrink priorities,
    so the bottom-k is weight-biased, stable under any partitioning or
    retry, and mergeable (bottom-k of a union == bottom-k of
    per-partition bottom-ks, the TakeOrderedAndProject plan Spark
    already emits — no full sort at 100 TB).

    The textbook Efraimidis-Spirakis ``u^(1/w)`` keys give exact
    inclusion probabilities but sit on float ``pow``, which disagrees
    between engines in the last ulp (measured on ~6% of values) —
    unusable under a hash-exact oracle and irreproducible across libm
    versions; the integer form trades probability exactness for
    bit-reproducibility, which is what a training-data pipeline
    actually needs from a sampler."""
    u = TX.token_hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit(salt)).cast("string")
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col(weight_col).cast("long").alias("weight"),
            u.cast("long").alias("__u"),
        )
        .select(
            "doc_id",
            "lang",
            "weight",
            F.expr("__u div greatest(weight, CAST(1 AS BIGINT))").alias(
                "priority"
            ),
        )
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(k)
    )


def sliding_chunks(docs: DataFrame, width: int = 5, stride: int = 3) -> DataFrame:
    """Overlapping sliding-window chunking (the RAG/embedding-prep
    shape: ``width`` words per chunk, ``stride`` words apart, so
    consecutive chunks share ``width - stride`` words of context) —
    implemented as a Python UDTF (Spark 4's user-defined TABLE function)
    applied with a LATERAL join.

    Why a UDTF and not explode: the same semantics ARE expressible as
    sequence+transform+explode (chunk_documents above does the
    non-overlapping case), but the UDTF surface is the right tool when
    per-row expansion logic outgrows what a lambda expression can say —
    this registers the API pattern with a case simple enough to
    oracle-check. The UDTF runs Arrow-batched; each eval emits
    ceil(n_words/stride) rows and the plan stays a single Generate over
    the scan.

    Parallelism guard: the chunker is CPU-bound per row, so it must fan
    out across cores. At 100 TB the parquet scan already yields many
    splits (session.spread is then a metadata-check no-op); on a corpus
    smaller than one split (one file < maxPartitionBytes → ONE task,
    the round-7 bench regression) spread() round-robin repartitions to
    defaultParallelism first — the shuffle moves only (doc_id, text)
    and is strictly cheaper than serializing the whole UDTF behind a
    single core.
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id bigint, chunk_idx bigint, start_word bigint, "
            "chunk_text string, n_words bigint"
        ),
        useArrow=True,
    )
    class ChunkWindows:
        def eval(self, doc_id: int, text: str):
            words = (text or "").split(" ")
            n = len(words)
            for ci in range((n + stride - 1) // stride):
                start = ci * stride
                chunk = words[start : start + width]
                yield (
                    doc_id,
                    ci,
                    start,
                    " ".join(chunk),
                    len(chunk),
                )

    spark = docs.sparkSession
    spark.udtf.register("chunk_windows", ChunkWindows)
    from ..session import spread

    spread(docs.select("doc_id", "text")).createOrReplaceTempView(
        "_chunk_src"
    )
    return spark.sql(
        "SELECT c.* FROM _chunk_src, LATERAL chunk_windows(doc_id, text) c"
    )


def mixture_deficit(
    docs: DataFrame, targets_bp: dict[str, int] | None = None
) -> DataFrame:
    """Mixture accounting: how far the corpus' per-source TOKEN mass is
    from the configured mixture weights — the number a data-mixing run
    watches to decide what to up/down-sample next.

    Emits per source: docs, exact whitespace-token count, actual share
    (bp), target (bp), and the deficit in TOKENS (negative = surplus),
    computed as target_bp*total_tokens/1e4 - source_tokens in exact
    integer arithmetic (the product stays well inside int64 at any
    total a single mixture run sees; at 1e15+ tokens switch the product
    to DECIMAL). One scan + one tiny aggregate."""
    targets_bp = targets_bp or {
        # four favored sources get explicit weight; the rest implicitly
        # target zero (pure-downsample candidates)
        "src0": 4000,
        "src1": 2500,
        "src2": 2000,
        "src3": 1500,
    }
    items = F.array(
        *[
            F.struct(F.lit(s).alias("source"), F.lit(bp).alias("target_bp"))
            for s, bp in targets_bp.items()
        ]
    )
    per_source = docs.select(
        "source", F.regexp_count(F.col("text"), F.lit(r"\S+")).alias("toks")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("long").alias("tokens"),
    )
    total = per_source.agg(F.sum("tokens").cast("long").alias("total_tokens"))
    targets = (
        docs.sparkSession.range(1)
        .select(F.explode(items).alias("t"))
        .select("t.source", F.col("t.target_bp").cast("long").alias("target_bp"))
    )
    return (
        per_source.join(targets, "source", "full_outer")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("tokens", F.lit(0)).alias("tokens"),
            F.expr(
                "(10000 * coalesce(tokens, 0)) div total_tokens"
            ).alias("actual_bp"),
            F.coalesce("target_bp", F.lit(0)).alias("target_bp"),
            F.expr(
                "(coalesce(target_bp, 0) * total_tokens) div 10000"
                " - coalesce(tokens, 0)"
            ).alias("deficit_tokens"),
        )
    )


def group_split(docs: DataFrame, folds: int = 5) -> DataFrame:
    """Leakage-free evaluation folds: every document of a SOURCE lands
    in the same fold (GroupKFold semantics — splitting by row would let
    near-identical documents of one origin straddle train/eval). Fold =
    md5-hash bucket of the group key; emits per (fold, source) counts,
    and a leakage audit is definitionally zero because the fold is a
    FUNCTION of the group key. Deterministic under any partitioning."""
    fold = (TX.token_hash32(F.concat(F.col("source"), F.lit("|gkf-v1"))) % folds).cast(
        "long"
    )
    return (
        docs.select(fold.alias("fold"), "source", "doc_id")
        .groupBy("fold", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def feature_hash_encode(customer: DataFrame, n_buckets: int = 64) -> DataFrame:
    """The hashing trick for categorical features — fixed-width
    encoding with NO vocabulary pass: each (feature_name, value) pair
    hashes straight to one of ``n_buckets`` columns, so the encoder
    needs zero coordination, never grows with cardinality, and
    applies identically to unseen values at serving time (the reason
    production feature pipelines prefer it to index-fitted one-hot at
    scale). Collisions are the accepted trade; this readout makes
    them VISIBLE: per bucket, how many rows land there from each
    feature and how many distinct source values collided into it.

    Hash is the repo's md5-uniform convention (first 8 hex chars mod
    buckets) over 'name:value' — deterministic, engine-identical,
    oracle-replayable. One scan, one bounded 2x explode (two features
    per row), one n_buckets-grain aggregate.
    """
    feats = customer.select(
        F.explode(
            F.array(
                F.concat_ws(
                    ":", F.lit("nation"),
                    F.col("c_nationkey").cast("string"),
                ),
                F.concat_ws(":", F.lit("segment"), F.col("c_mktsegment")),
            )
        ).alias("fv")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("fv")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    )
    return (
        feats.select(
            bucket.alias("bucket"),
            "fv",
            F.split(F.col("fv"), ":").getItem(0).alias("feat"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("fv").alias("n_distinct_values"),
            F.sum((F.col("feat") == "nation").cast("long"))
            .cast("long")
            .alias("n_nation"),
            F.sum((F.col("feat") == "segment").cast("long"))
            .cast("long")
            .alias("n_segment"),
        )
    )


def target_encode_loo(orders: DataFrame) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value — the categorical-encoding workhorse for gradient models,
    in the LOO form that prevents the row's own label from leaking
    into its feature: encode(row i) = (sum(category) - y_i) /
    (n_category - 1). Plain mean encoding memorizes singletons; LOO
    is the standard correction, and it is exactly expressible.

    Exact integers: y in cents, loo_e2 = (100 * (S - y)) div (n - 1)
    with non-negative numerators (prices are positive), categories
    with n = 1 are excluded (no leave-one-out exists). One
    enum-bounded category aggregate broadcast back onto the rows — no
    window, no shuffle of the fact beyond the scan.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(
        "o_orderkey", "o_orderpriority", cents.alias("y")
    )
    stats = base.groupBy("o_orderpriority").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        base.join(F.broadcast(stats), "o_orderpriority")
        .where(F.col("n") > 1)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("y").alias("y_cents"),
            F.expr("(100 * (s - y)) div (n - 1)").alias("loo_e2"),
        )
    )


def negative_samples(
    lineitem: DataFrame, part: DataFrame, k: int = 3,
    salt: str = "negsamp-v1",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs
    — the retrieval/recsys prep step: every observed (order, part)
    positive gets ``k`` hash-drawn candidate parts, with candidates
    the order ACTUALLY contains removed by an anti-join (a "negative"
    that is secretly positive poisons the loss — the correctness step
    naive random sampling skips). All draws are md5-uniform over
    (salt, orderkey, slot), so reruns, retries, and the oracle
    reproduce the identical sample — the repo's no-rand() rule.

    Draws land in part-key space via modulo over the catalog max (a
    1-row stat attach); a draw that collides with a positive is
    DROPPED, not redrawn (bounded one-pass contract — redraw loops
    are order-dependent; expected loss is basket/catalog, tiny).
    Scale: the k-way expand is a bounded sequence explode; the
    anti-join is keyed on (order, part) — one shuffle each.
    """
    positives = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    cat = part.agg(F.max("p_partkey").alias("max_pk"))
    draws = (
        positives.select("ok")
        .distinct()
        .crossJoin(F.broadcast(cat))
        .select(
            "ok",
            "max_pk",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
        )
        .select(
            "ok",
            "slot",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(salt),
                                F.col("ok").cast("string"),
                                F.col("slot").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                # greatest(.,1): any real catalog has max_pk >= 1; a
                # degenerate one-part catalog (max_pk 0) must not turn
                # the draw into a remainder-by-zero
                % F.greatest(F.col("max_pk"), F.lit(1))
                + 1
            ).alias("neg_pk"),
        )
    )
    clean = draws.join(
        positives.select(
            "ok", F.col("pk").alias("neg_pk")
        ),
        ["ok", "neg_pk"],
        "left_anti",
    )
    return clean.select(
        "ok",
        F.col("slot").cast("long").alias("slot"),
        F.col("neg_pk").cast("long").alias("neg_pk"),
    )


def quantile_normalize(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """Quantile normalization of document length ACROSS SOURCES — the
    cross-dataset feature-alignment step (each source's length
    distribution is mapped onto the POOLED distribution, so "long for
    its source" becomes comparable across sources — the
    batch-effect-removal move borrowed from bioinformatics). Here in
    decile form: per source, a doc's within-source decile is looked
    up against the pooled decile cut points.

    Integer rank arithmetic end to end: within-source deciles use the
    (n-1)*q div 100 + 1 value-at-rank convention over the per-source
    histogram; pooled cut points use the identical convention over
    the global histogram. Emits per (source, decile): the source cut
    point, the pooled cut point, and their gap — the drift table.

    Scale: two histogram aggregates (per-source, pooled) over the
    value domain, windows over histogram grain only.
    """
    base = docs.select("source", F.col("n_chars").cast("long").alias("v"))

    def cuts(df: DataFrame, keys: list[str]) -> DataFrame:
        hist = df.groupBy(*keys, "v").agg(F.count(F.lit(1)).alias("t"))
        part = (
            Window.partitionBy(*keys) if keys else Window.partitionBy()
        )
        w = part.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ranked = hist.select(
            *keys,
            "v",
            (F.sum("t").over(w) - F.col("t") + 1).alias("lo"),
            F.sum("t").over(w).alias("hi"),
            F.sum("t").over(part).alias("n"),
        )
        qs = F.explode(
            F.sequence(F.lit(1), F.lit(n_bins - 1))
        ).alias("decile")
        return (
            ranked.select(*keys, "v", "lo", "hi", "n", qs)
            .where(
                (
                    F.expr(f"(n - 1) * decile * 10 div 100 + 1")
                    >= F.col("lo")
                )
                & (
                    F.expr(f"(n - 1) * decile * 10 div 100 + 1")
                    <= F.col("hi")
                )
            )
            .select(*keys, "decile", F.col("v").alias("cut"))
        )
    pooled = cuts(base.select("v"), []).withColumnRenamed(
        "cut", "pooled_cut"
    )
    per_source = cuts(base, ["source"])
    return (
        per_source.join(F.broadcast(pooled), "decile")
        .select(
            "source",
            F.col("decile").cast("long").alias("decile"),
            F.col("cut").cast("long").alias("source_cut"),
            F.col("pooled_cut").cast("long").alias("pooled_cut"),
            (F.col("cut") - F.col("pooled_cut")).alias("gap"),
        )
    )
