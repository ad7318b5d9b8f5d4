"""Training-pipeline assembly operators: sequence packing, benchmark
contamination, stratified sampling.

No reference counterpart (north-star LLM-data-pipeline additions,
/root/repo/BASELINE.json) — these are the operations that turn a cleaned
corpus into actual training batches: pack documents into fixed
token-capacity context windows, audit train/eval n-gram overlap, and draw
reproducible per-stratum samples for dataset mixing.

All three are engine-deterministic (no RNG, no engine-specific hashes in
checked output), so each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from artigraph_spark.operators.dedup import tokens


_HASH_P = 1_000_000_007


def _mul_hash(key) -> Column:
    """THE deterministic multiplicative hash shared by every sampling/
    split/shuffle operator in this module: ``pmod(pmod(key, p) ·
    2654435761, p)`` with p = 1e9+7 (Knuth's constant over the Mersenne-
    adjacent prime the dedup family also uses). One definition — the
    docstrings' "same hash as split_corpus" claims stay true by
    construction, and any overflow/constant change lands everywhere at
    once. The inner pmod keeps every product within int64 for ANY int64
    key."""
    p = F.lit(_HASH_P)
    return F.pmod(F.pmod(key, p) * F.lit(2_654_435_761), p)


def token_count(text: Column) -> Column:
    """Whitespace token count, same tokenization as the dedup/text family."""
    return F.size(tokens(text))


def _pack_impl(
    df: DataFrame,
    group_col: str | None,
    id_col: str,
    count_col: str,
    capacity: int,
    num_buckets: int,
) -> DataFrame:
    """Shared two-phase distributed packing core. ``group_col=None`` packs
    the whole input as one stream; otherwise every group gets its own bin
    space. See the public wrappers for the semantics/scale story.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    # The range-bucketing arithmetic ((id - __lo) / __w, driver-side int()
    # of the bounds) requires an integral id. A string or date id orders
    # fine but would fail LATE with an opaque cast/AnalysisException — fail
    # up front with the actual requirement instead.
    id_dt = df.schema[id_col].dataType
    if not isinstance(id_dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise ValueError(
            f"packing requires an integral id column for range-bucketing; "
            f"{id_col!r} is {id_dt.simpleString()} — derive an integral key "
            f"first (e.g. xxhash64 or a monotonically increasing id)"
        )
    gtype = df.schema[group_col].dataType if group_col else T.IntegerType()
    id_type = id_dt
    gexpr = F.col(group_col) if group_col else F.lit(0)
    # Slim the input to (group, id, count) and persist it for the two
    # driver-side aggregation passes (bounds, bucket totals) so the upstream
    # (scan + tokenization) executes once for both, spilling to disk rather
    # than failing when it doesn't fit. persist — NOT localCheckpoint —
    # keeps lineage intact: an executor loss recomputes the lost blocks
    # instead of failing the job, and nothing is pinned after the explicit
    # unpersist below. NULL ids are unorderable and NULL groups
    # unassignable: filtered (cheap columns). NULL/zero/negative counts
    # occupy no bin — those are NULLed in the projection rather than
    # filtered, because a `count > 0` filter would be pushed below the
    # projection and duplicate the (often expensive — tokenization) count
    # expression into the filter (no cross-operator CSE). NULL counts are
    # skipped by every SUM, and the final bin explode drops the rows
    # (sequence over a NULL span is NULL). Referencing the count column
    # twice inside ONE projection is safe: CollapseProject keeps
    # multiply-referenced non-cheap aliases behind a projection boundary.
    from pyspark.storagelevel import StorageLevel

    cnt = F.col(count_col).cast("long")
    slim = (
        df.select(
            gexpr.alias("__g"), F.col(id_col), F.when(cnt > 0, cnt).alias("__n")
        )
        .filter(F.col("__g").isNotNull() & F.col(id_col).isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spark = df.sparkSession
    try:
        bnds = {
            r["__g"]: (int(r["__lo"]), int(r["__hi"]))
            for r in slim.groupBy("__g")
            .agg(F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi"))
            .collect()
        }
        prefix = [T.StructField(group_col, gtype)] if group_col else []
        if not bnds:
            return spark.createDataFrame(
                [],
                T.StructType(
                    prefix
                    + [
                        T.StructField(id_col, id_type),
                        T.StructField("bin_id", T.LongType()),
                        T.StructField("tokens_in_bin", T.LongType()),
                    ]
                ),
            )
        # Per-group range-bucket widths — one row per group, broadcast back.
        # Helper frames carry the group column's REAL type (a string schema
        # would reject integer curriculum stages or date shards).
        helper = lambda fields: T.StructType([T.StructField("__g", gtype), *fields])
        widths = spark.createDataFrame(
            [
                (g, lo, float(max((hi - lo) // num_buckets + 1, 1)))
                for g, (lo, hi) in bnds.items()
            ],
            helper([T.StructField("__lo", T.LongType()), T.StructField("__w", T.DoubleType())]),
        )
        # bucket index computed in DOUBLE: an int64 `id - __lo` overflows
        # when the id range spans > 2^63 — exactly the full-range xxhash64
        # ids the integral-id error message above recommends. The double
        # path is monotone in id (double cast, subtraction of a constant,
        # and division by a positive width all preserve order; ties only
        # merge neighbours into one bucket), which is all the layout needs
        # — final positions come from the within-bucket prefix sums, so
        # the packed output is identical.
        bucketed = slim.join(F.broadcast(widths), "__g").withColumn(
            "__bkt",
            (
                (F.col(id_col).cast("double") - F.col("__lo").cast("double"))
                / F.col("__w")
            ).cast("long"),
        )
        # Phase 1: per-(group, bucket) totals — metadata-sized — rolled into
        # per-group running offsets on the driver.
        # Buckets whose rows ALL had non-positive/NULL counts sum to NULL —
        # they hold no tokens; absent from totals ⇒ pruned by the offsets
        # inner join.
        totals = {
            (r["__g"], r["__bkt"]): int(r["total"])
            for r in bucketed.groupBy("__g", "__bkt").agg(F.sum("__n").alias("total")).collect()
            if r["total"] is not None
        }
    finally:
        # Both metadata collects are done; release the cached blocks NOW.
        # The returned lazy plan still references slim and recomputes it
        # from source at consumption (one extra upstream pass) — the price
        # of keeping lineage unbroken and executor storage unpinned.
        slim.unpersist(blocking=False)
    offsets, acc = [], {}
    for g, b in sorted(totals, key=lambda k: (str(k[0]), k[1])):
        offsets.append((g, b, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + totals[(g, b)]
    offset_df = spark.createDataFrame(
        offsets,
        helper([T.StructField("__bkt", T.LongType()), T.StructField("__off", T.LongType())]),
    )
    # Phase 2: within-bucket prefix sum (buckets sort independently) shifted
    # by the broadcast offsets -> exact running totals per group. ROWS frame,
    # not the default RANGE: RANGE sums all ORDER-BY tie peers together, so
    # duplicate ids would share one cumulative value and claim overlapping
    # spans (duplicate ids get an arbitrary but valid relative order; token
    # conservation always holds).
    w = (
        Window.partitionBy("__g", "__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fin = (F.sum("__n").over(w) + F.col("__off")).alias("__fin")
    laid = (
        bucketed.join(F.broadcast(offset_df), ["__g", "__bkt"])
        .select("__g", F.col(id_col), F.col("__n"), fin)
        .withColumn("__start", F.col("__fin") - F.col("__n"))
    )
    cap = F.lit(int(capacity))
    out_prefix = [F.col("__g").alias(group_col)] if group_col else []
    return laid.select(
        *out_prefix,
        F.col(id_col),
        F.explode(
            F.sequence(F.floor(F.col("__start") / cap), F.floor((F.col("__fin") - 1) / cap))
        ).alias("bin_id"),
        "__start",
        "__fin",
    ).select(
        *([group_col] if group_col else []),
        id_col,
        "bin_id",
        (
            F.least(F.col("__fin"), (F.col("bin_id") + 1) * cap)
            - F.greatest(F.col("__start"), F.col("bin_id") * cap)
        ).alias("tokens_in_bin"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count_col: str,
    capacity: int,
    num_buckets: int = 32,
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay documents end-to-end in
    ``id_col`` order and slice the token stream into ``capacity``-sized bins
    (the standard LLM pretraining packing — documents may straddle a bin
    boundary). Returns one row per (document, bin) overlap:
    ``(id, bin_id, tokens_in_bin)``. Zero-token documents occupy no bin and
    are omitted; rows with a NULL id or NULL count are dropped (a NULL id
    has no place in the total order, a NULL count no length).

    ``id_col`` must be an INTEGRAL column (byte/short/int/long) — the
    distributed prefix sum range-buckets on id arithmetic. A non-integral
    id raises ``ValueError`` up front; derive an integral key first
    (``xxhash64``, ``monotonically_increasing_id``).

    Scale: a naive global ``Window.orderBy`` prefix-sum drags every row into
    ONE partition — a non-starter at 100 TB. The shared core uses the
    classic two-phase distributed scan instead: range-bucket on the id,
    per-bucket window prefix-sums (each bucket sorts independently),
    per-bucket totals (``num_buckets`` rows — metadata) rolled into bucket
    offsets on the driver and broadcast-joined back. The heavy path is one
    shuffle on the bucket key plus a narrow explode of spanned bins
    (≤ tokens/capacity + 1 rows per doc).
    """
    return _pack_impl(df, None, id_col, count_col, capacity, num_buckets)


def pack_sequences_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    count_col: str,
    capacity: int,
    num_buckets: int = 32,
) -> DataFrame:
    """Grouped concat-then-chunk packing: each group (language, source,
    curriculum stage — any atomic-typed column) gets its OWN bin space, so
    batches never mix groups — the monolingual-batch / per-source-batch case
    of ``pack_sequences``. Returns ``(group, id, bin_id, tokens_in_bin)``
    with ``bin_id`` counted from 0 within each group; NULL-group rows are
    dropped along with NULL ids and empty documents. ``id_col`` must be
    integral (see ``pack_sequences``) — validated up front.

    Scale: same two-phase distributed prefix sum, with the bucket key
    extended to (group, bucket). The driver sees one row per (group, bucket)
    — metadata-sized while the group count is bounded (languages, sources),
    which is the use case; an unbounded group column belongs in
    ``cap_per_group``/``stratified_sample`` first.
    """
    return _pack_impl(df, group_col, id_col, count_col, capacity, num_buckets)


def _require_positive_n(n: int) -> None:
    if n < 1:
        # n=0 renders every document's gram set [""] — benchmark overlap
        # reads 100% and decontaminate_corpus would delete the whole
        # corpus instead of erroring on the invalid parameter.
        raise ValueError(f"n-gram size must be >= 1, got {n}")


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Array of space-joined n-grams from an ALREADY-MATERIALIZED token
    array column. Project the tokens into a real column first: lambda
    bodies (higher-order functions) run interpreted — no codegen, no
    common-subexpression elimination — so an inline ``tokens(text)``
    argument is re-split on EVERY element access, which measured 23×
    slower at bench scale. A separate projection materializes the array
    once per row (CollapseProject keeps multiply-referenced non-cheap
    aliases as a projection boundary)."""
    _require_positive_n(n)
    count = F.size(toks) - (n - 1)

    def gram(i: Column) -> Column:
        return F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        )

    return F.when(
        count >= 1, F.transform(F.sequence(F.lit(1), count), gram)
    ).otherwise(F.array().cast("array<string>"))


def ngrams(text: Column, n: int = 3) -> Column:
    """Array of space-joined token n-grams (distinct not applied).
    Convenience form over an inline tokenization — fine for one-shot use,
    but in a hot path project ``tokens(text)`` into a column and call
    ``ngrams_from_tokens`` (see its docstring for why)."""
    return ngrams_from_tokens(tokens(text), n)


def benchmark_contamination(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Train/eval contamination audit: for each training document, the share
    of its distinct token ``n``-grams that appear anywhere in the benchmark
    set. Returns ``(id, total_ngrams, overlap_ngrams, contamination)`` for
    documents with at least one n-gram (shorter docs are not assessable).

    Scale: the benchmark side collapses to DISTINCT n-grams (eval suites are
    tiny next to the corpus — typically broadcast-sized), the train side is
    one explode + one equi-join on the gram and two aggregations keyed by
    doc. Nothing quadratic; the join key is the gram string, so skew only
    appears if one n-gram dominates the benchmark — bounded by the distinct
    collapse.
    """
    # ONE pass over the train text: explode distinct grams once, LEFT-join
    # the benchmark gram set with a hit marker, and take both counts from
    # the same aggregation. (The naive shape — separate total and overlap
    # aggregates joined afterwards — executes the n-gram expression twice
    # and adds a per-doc join; measured 2× slower at bench scale.)
    tr = train.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_from_tokens(F.col("__t"), n))).alias("__g"),
    )
    bg = (
        bench.select(tokens(F.col(text_col)).alias("__t"))
        .select(F.explode(F.array_distinct(ngrams_from_tokens(F.col("__t"), n))).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        tr.join(bg, "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("total_ngrams"),
            F.count("__hit").alias("overlap_ngrams"),
        )
        .withColumn(
            "contamination",
            F.col("overlap_ngrams") / F.col("total_ngrams"),
        )
    )


def decontaminate_corpus(
    train: DataFrame,
    bench: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.2,
    audit: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end benchmark decontamination: audit train/eval n-gram overlap
    (``benchmark_contamination``) and REMOVE training documents whose
    contamination reaches ``threshold``. Returns ``(clean, audit)``:
    ``clean`` is the training corpus minus flagged documents (all input
    columns intact), ``audit`` the full per-document contamination table —
    keep both, the audit is the evidence trail for what was dropped and why.

    Documents too short to form a single n-gram are unassessable and KEPT
    (they cannot leak a benchmark answer in under n tokens).

    Scale: the audit is the contamination join (bench side collapsed to
    broadcast-sized distinct grams); the removal is one anti-join of the
    corpus against the flagged-id set — at any sane threshold that set is
    a small fraction of the corpus, so AQE turns it into a broadcast
    anti-join. Both returned frames SHARE the audit's lineage: a caller
    that materializes both executes the contamination join once per
    output. When that matters (it does at 100 TB), write the audit first
    and pass the materialized table back via ``audit=`` — ``bench`` may
    then be None — so the removal anti-joins against stored evidence
    instead of recomputing it (examples/training_batch_demo.py chains two
    producers exactly this way).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if audit is None:
        if bench is None:
            raise ValueError("bench is required when no precomputed audit is given")
        audit = benchmark_contamination(train, bench, id_col, text_col, n)
    flagged = audit.filter(F.col("contamination") >= threshold).select(id_col)
    clean = train.join(flagged, id_col, "left_anti")
    return clean, audit


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: Column,
    *,
    denominator: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-mixing primitive:
    draw a different reproducible fraction from each stratum (e.g. languages
    or sources at different rates). Unlike ``df.sample``, membership depends
    only on the ROW KEY, never on partitioning, engine, or run order — a
    training pipeline can re-materialize the exact same mixture anywhere.

    ``key`` must be a deterministic integer column expression (reduce it
    mod a prime first if values can exceed ~2^31, see sample_deterministic);
    negative keys are fine — hashing uses pmod, so a signed key cannot
    push a bucket below every threshold. Rows whose stratum is missing from
    ``fractions`` are dropped. Pure filter over a scan: no shuffle, fully
    pushdown-friendly.
    """
    h = _mul_hash(key)
    thresholds = F.create_map(
        *[
            x
            for s, frac in sorted(fractions.items())
            for x in (F.lit(s), F.lit(int(round(frac * denominator))))
        ]
    )
    limit = F.element_at(thresholds, F.col(strata_col))
    return df.filter(limit.isNotNull() & (F.pmod(h, F.lit(denominator)) < limit))


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws a deterministic pseudo-uniform u from its id and ranks by
    ``u^(1/weight)``; the global top-k is an exact weighted sample. Rows with
    non-positive or NULL weight are excluded.

    The ranking uses the equivalent LOG-DOMAIN key
    ``ln(ln(1/u)) - ln(w)`` ascending (a monotone transform of
    ``u^(1/w)`` descending). Ranking on ``u^(1/w)`` directly would collapse:
    for large weights the value crowds against 1.0 and any fixed-decimal
    rounding merges an arbitrarily large tie group (billion-token shards all
    rounding to 1.000000000 would degrade the "weighted" sample into
    id-order). The log-domain key spans only tens of units across ANY weight
    range, so the 9-decimal snap (the BM25 guard-digit technique for
    cross-engine ULP differences in ln) keeps relative weights intact; ties
    break on the id.

    Scale: a pure projection plus one TakeOrdered top-k — per-partition
    heaps of k rows, no global sort, no shuffle beyond the k-row exchange.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # ln(1/u) computed as ONE division ln(D / (h+1)) — the two-step
    # 1.0/((h+1)/D) form rounds twice and can land 1 ulp away from the
    # oracle's single division, flipping a 9-decimal snap at a boundary.
    key = F.round(
        F.log(F.log(F.lit(1_000_000_008.0) / (_mul_hash(F.col(id_col)) + 1)))
        - F.log(F.col(weight_col)),
        9,
    )
    w = F.col(weight_col)
    return (
        # Explicit NaN exclusion: Spark orders NaN above every number, so
        # NaN > 0 is TRUE and NaN-weight rows would smuggle past the
        # positivity filter into the sample tail.
        df.filter(w.isNotNull() & (w > 0) & ~F.isnan(w.cast("double")))
        .withColumn("__sk", key)
        .orderBy(F.col("__sk").asc(), F.col(id_col))
        .limit(k)
        .drop("__sk")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_key: Column,
) -> DataFrame:
    """Domain capping: keep at most ``k`` rows per group, chosen
    deterministically by ``order_key`` (hash the row id for an unbiased,
    reproducible draw; use a quality score to keep the best instead). The
    standard defense against a handful of crawl domains dominating a
    training mixture.

    Scale: one shuffle on the group key; WindowGroupLimit pushes the
    row_number predicate below the sort at the map side, so only ≤ k rows
    per group per partition survive into the exchange.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(group_col).orderBy(order_key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def select_token_budget(
    df: DataFrame,
    id_col: str,
    score_col: str,
    count_col: str,
    budget: int,
    *,
    num_buckets: int = 256,
) -> DataFrame:
    """Corpus selection under a token budget: take documents in descending
    ``score_col`` order (ties broken by ascending ``id_col``) while the
    running sum of ``count_col`` stays within ``budget``. Returns
    ``(id, score, count, running_total)`` for the selected documents — the
    "best N tokens" primitive for quality-filtered pretraining mixes.

    Scale: a naive global ``Window.orderBy(score)`` serializes the whole
    corpus through one task. Instead, three passes, each paying only what
    it needs:

    1. **bounds** — min/max score over a COLUMN-PRUNED scan: the count
       expression (often an expensive tokenization) is never evaluated.
    2. **totals** — one full pass computing per-score-bucket token sums
       (bucket 0 = highest scores), rolled into driver-side offsets
       (``num_buckets`` rows, metadata-sized). The first bucket whose
       offset alone exceeds the budget marks the CUT: it and everything
       past it are dropped from the broadcast offsets frame.
    3. **consume** — the prefix-sum window per kept bucket. The cut is
       also turned into a STATIC score-cutoff literal on the source
       column, so it reaches the parquet scan (``PushedFilters`` /
       row-group skipping): pruned-bucket rows are never tokenized — at
       100 TB the sub-budget prefix is usually a small fraction of the
       corpus, and only it shuffles.

    Rows whose score, id, or count is NULL (or count <= 0) are not
    selectable and are dropped.

    Bucket assignment is floor((hi - score) / width) clamped to
    [0, num_buckets-1]: monotone non-increasing in score even under IEEE
    rounding (subtraction and division by a positive constant are monotone,
    floor is monotone), so cross-bucket order is always consistent with
    score order and equal scores land in the same bucket — exactness never
    depends on the float math, only bucket *balance* does.
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    spark = df.sparkSession
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField(score_col, df.schema[score_col].dataType),
            T.StructField(count_col, T.LongType()),
            T.StructField("running_total", T.LongType()),
        ]
    )
    selectable = df.filter(F.col(id_col).isNotNull() & F.col(score_col).isNotNull())
    # Pass 1 — bounds, count expression untouched (column-pruned scan).
    # Rows later dropped for NULL/<=0 counts can only widen the range,
    # which is harmless: they just leave some buckets lighter.
    row = selectable.agg(
        F.min(F.col(score_col).cast("double")).alias("lo"),
        F.max(F.col(score_col).cast("double")).alias("hi"),
    ).collect()[0]
    if row["lo"] is None:
        return spark.createDataFrame([], out_schema)
    lo, hi = float(row["lo"]), float(row["hi"])
    width = (hi - lo) / num_buckets or 1.0
    bkt = F.least(
        F.lit(num_buckets - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((F.lit(hi) - F.col("__s").cast("double")) / F.lit(width)),
        ),
    )

    # NO eager `__n > 0` filter here: pushing that predicate below the
    # projection would duplicate the (often expensive — tokenization)
    # count expression into the filter, evaluating it twice per row
    # (no cross-operator CSE). Instead non-positive counts are NULLed in
    # the projection — SUM and the window prefix sum skip NULLs, so a
    # negative count (upstream tokenizer bug) can never deflate
    # running_total and over-admit past the budget — and the final output
    # filter drops the rows. Referencing the count column twice inside
    # ONE projection is safe: CollapseProject keeps multiply-referenced
    # non-cheap aliases behind a projection boundary.
    def slim(src: DataFrame) -> DataFrame:
        c = F.col(count_col).cast("long")
        return src.select(
            F.col(id_col),
            F.col(score_col).alias("__s"),
            F.when(c > 0, c).alias("__n"),
        ).withColumn("__bkt", bkt)

    # Pass 2 — per-bucket token totals (the one unavoidable full pass).
    # A bucket whose rows ALL had non-positive/NULL counts sums to NULL —
    # it holds no selectable tokens; treat as absent.
    totals = {
        int(r["__bkt"]): int(r["total"])
        for r in slim(selectable).groupBy("__bkt").agg(F.sum("__n").alias("total")).collect()
        if r["total"] is not None
    }
    # Driver-side offsets in score-descending bucket order; find the first
    # bucket whose offset alone exhausts the budget — everything at or past
    # it can be pruned BEFORE the shuffle.
    offsets, acc, cut = {}, 0, None
    for b in sorted(totals):
        offsets[b] = acc
        if acc > budget and cut is None:
            cut = b
        acc += totals[b]
    kept = {b: off for b, off in offsets.items() if cut is None or b < cut}
    if not kept:
        return spark.createDataFrame([], out_schema)
    # Pass 3 — consume. Turn the cut into a static score cutoff on the
    # SOURCE column so it pushes into the scan: kept bucket b satisfies
    # score > hi - (b+1)*width; one extra bucket of slack absorbs any
    # float rounding (the offsets inner join still enforces exact
    # membership — the cutoff is a conservative prefilter, never the
    # correctness boundary).
    consume = selectable
    max_kept = max(kept)
    if max_kept < num_buckets - 1:
        cutoff = hi - (max_kept + 2) * width
        if isinstance(
            df.schema[score_col].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            # Plain integer comparison (no cast) so the predicate reaches
            # the parquet scan (PushedFilters / row-group skipping);
            # floor() keeps it conservative.
            import math

            consume = consume.filter(F.col(score_col) >= F.lit(int(math.floor(cutoff))))
        else:
            consume = consume.filter(F.col(score_col).cast("double") >= F.lit(cutoff))
    off_df = spark.createDataFrame(
        [(b, off) for b, off in kept.items()],
        T.StructType(
            [T.StructField("__bkt", T.LongType()), T.StructField("__off", T.LongType())]
        ),
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("__s").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        slim(consume).join(F.broadcast(off_df), "__bkt")  # inner join = bucket pruning
        .withColumn("running_total", F.sum("__n").over(w) + F.col("__off"))
        .filter((F.col("running_total") <= budget) & (F.col("__n") > 0))
        .select(
            F.col(id_col),
            F.col("__s").alias(score_col),
            F.col("__n").alias(count_col),
            F.col("running_total"),
        )
    )


def upsample_domains(
    df: DataFrame,
    domain_col: str,
    factors: dict[str, float] | DataFrame,
    key: Column,
    *,
    denominator: int = 10_000,
) -> DataFrame:
    """Domain upsampling with fractional repeat factors — the "epochs per
    source" mixing primitive (e.g. Wikipedia ×3.2, CommonCrawl ×0.8): each
    row is emitted floor(r) times plus one more with probability frac(r),
    decided by a deterministic hash of ``key`` (reproducible on any engine/
    partitioning, like stratified_sample). Output adds ``copy_idx``
    (1-based). Rows whose domain is missing from ``factors`` are dropped;
    a factor < 1 behaves as deterministic downsampling.

    ``factors`` takes two forms:

    - a **dict** (metadata-sized domain sets — languages, sources): the
      factors compile into literal maps, zero extra plan nodes;
    - a **DataFrame** whose first column is the domain and second the
      factor (HIGH-cardinality domain columns — millions of registrable
      web domains, where a driver dict is an OOM): the factors join in
      as an ordinary equi-join (AQE broadcasts it while it stays small;
      a genuinely huge factor table hash-joins — no driver ceiling).
      Build one with :func:`temperature_factor_frame`.

    Scale: a per-row sequence-explode with small factors — no shuffle in
    the dict form, one (usually broadcast) join in the frame form; the
    output size is exactly sum over domains of round(r_d × rows_d).
    """
    if isinstance(factors, DataFrame):
        return _upsample_domains_frame(
            df, domain_col, factors, key, denominator=denominator
        )
    if not factors:
        raise ValueError("factors must be non-empty")
    for d, r in factors.items():
        if r < 0:
            raise ValueError(f"factor for {d!r} must be >= 0, got {r}")
    h = F.pmod(_mul_hash(key), F.lit(denominator))
    base_map = F.create_map(
        *[x for d, r in sorted(factors.items()) for x in (F.lit(d), F.lit(int(r)))]
    )
    frac_map = F.create_map(
        *[
            x
            for d, r in sorted(factors.items())
            for x in (F.lit(d), F.lit(int(round((r - int(r)) * denominator))))
        ]
    )
    copies = (
        F.element_at(base_map, F.col(domain_col))
        + F.when(h < F.element_at(frac_map, F.col(domain_col)), 1).otherwise(0)
    ).cast("long")
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)  # sequence(1, 0) would DESCEND — guard
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1).cast("long"), F.col("__copies"))))
        .drop("__copies")
    )


def _upsample_domains_frame(
    df: DataFrame,
    domain_col: str,
    factors: DataFrame,
    key: Column,
    *,
    denominator: int = 10_000,
) -> DataFrame:
    """Frame-factored body of :func:`upsample_domains`: identical copy
    arithmetic (floor(r) copies + one more when the key hash lands under
    frac(r)·denominator), with the per-domain factor delivered by an
    equi-join instead of literal maps. Negative factors raise lazily
    inside the plan (the dict path validates eagerly); frac rounding is
    half-even (``bround``) to match the dict path's Python ``round``.
    The inner join drops missing-domain rows exactly like the dict
    path's NULL map lookup."""
    dcol, fcol = factors.columns[0], factors.columns[1]
    fct = factors.select(
        F.col(dcol).alias("__dom"),
        F.when(
            F.col(fcol) < 0,
            F.raise_error(
                F.concat(
                    F.lit("upsample_domains: negative factor for domain "),
                    F.col(dcol).cast("string"),
                )
            ),
        )
        .otherwise(F.col(fcol).cast("double"))
        .alias("__r"),
    )
    h = F.pmod(_mul_hash(key), F.lit(denominator))
    base = F.floor(F.col("__r")).cast("long")
    frac_scaled = F.bround((F.col("__r") - base) * denominator, 0).cast("long")
    copies = (base + F.when(h < frac_scaled, 1).otherwise(0)).cast("long")
    return (
        df.join(fct, F.col(domain_col) == F.col("__dom"), "inner")
        .withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("__copies"))),
        )
        .drop("__copies", "__dom", "__r")
    )


def temperature_factors(
    df: DataFrame,
    domain_col: str,
    *,
    alpha: float = 0.5,
    total_rows: int | None = None,
) -> dict[str, float]:
    """Temperature-based mixing factors: sampling weight per domain
    proportional to count^alpha (alpha < 1 flattens the natural
    distribution toward uniform — the multilingual-sampling standard), as
    repeat factors for :func:`upsample_domains` targeting ``total_rows``
    output rows (default: input size, i.e. pure re-balancing).

    Driver-side BY CHOICE for metadata-sized domain sets (languages,
    sources — dozens to thousands): the per-domain count table is tiny,
    the factor arithmetic is a dict comprehension, and the heavy lifting
    stays in the deterministic upsample. For HIGH-cardinality domain
    columns (millions of registrable web domains) the collect here is a
    driver OOM — use :func:`temperature_factor_frame`, which keeps the
    same arithmetic distributed and feeds ``upsample_domains`` directly.
    Not oracle-checked itself (float policy math); the applied result
    is, through upsample_domains.
    """
    counts = {
        r["d"]: int(r["c"])
        for r in df.groupBy(F.col(domain_col).alias("d")).agg(F.count("*").alias("c")).collect()
        if r["d"] is not None
    }
    if not counts:
        return {}
    total = sum(counts.values())
    target = total if total_rows is None else total_rows
    weights = {d: c**alpha for d, c in sorted(counts.items())}
    z = sum(weights.values())
    return {d: (weights[d] / z) * target / counts[d] for d in weights}


def temperature_factor_frame(
    df: DataFrame,
    domain_col: str,
    *,
    alpha: float = 0.5,
    total_rows: int | None = None,
) -> DataFrame:
    """Distributed form of :func:`temperature_factors` for
    HIGH-cardinality domain columns: same count^alpha flattening, but the
    per-domain count table never leaves the cluster — no driver dict, no
    OOM ceiling — and the result feeds :func:`upsample_domains` directly
    as its DataFrame ``factors`` argument.

    Determinism: the normalizer z = Σ count^alpha is a float sum, which
    would be partition-order-dependent; each weight is snapped to the
    9-decimal guard grid and summed as DECIMAL(38,9) (exact,
    order-independent — the repo's fixed-point convention), so the
    factors replay identically at any partitioning. Weight/z/target
    arithmetic past the exact sum is single double operations.

    Scale shape: one map-side-combined groupBy(domain) count (the only
    data-sized stage), a one-row broadcast of (total, z), and a
    projection over the domain-count frame.

    Returns ``(domain, factor)`` — NULL domains are excluded, matching
    the dict form.
    """
    w9 = F.round(F.pow(F.col("__c").cast("double"), F.lit(float(alpha))), 9)
    counts = (
        df.filter(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    tot = counts.agg(
        F.sum("__c").alias("__total"),
        F.sum(w9.cast("decimal(38,9)")).alias("__z"),
    )
    target = (
        F.col("__total").cast("double")
        if total_rows is None
        else F.lit(float(total_rows))
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "domain",
        (
            w9 / F.col("__z").cast("double") * target / F.col("__c").cast("double")
        ).alias("factor"),
    )


def split_corpus(
    df: DataFrame,
    key: Column,
    fractions: dict[str, float] | None = None,
    *,
    denominator: int = 10_000,
) -> DataFrame:
    """Deterministic disjoint corpus split — the train/valid/test
    assignment primitive: every row gets exactly one ``split`` label,
    decided by a hash of ``key`` alone (never partitioning, engine, or run
    order), so the same document lands in the same split on any engine,
    any cluster, any rerun — the property that keeps eval sets honest
    across pipeline re-materializations.

    ``fractions`` (default 98/1/1 train/valid/test) must sum to 1 within
    1/denominator; label order follows the dict's insertion order and the
    LAST label absorbs the integer-rounding remainder, so the union is
    exactly the input (disjoint and exhaustive by construction).

    Scale: one projection — no shuffle, no UDF; each split is then a
    pushdown-friendly filter on the label column.
    """
    if fractions is None:
        fractions = {"train": 0.98, "valid": 0.01, "test": 0.01}
    fractions = dict(fractions)
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1.0 / denominator:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.pmod(_mul_hash(key), F.lit(denominator))
    bounds, acc = [], 0
    names = list(fractions)
    for name in names[:-1]:
        acc += int(round(fractions[name] * denominator))
        bounds.append((name, acc))
    expr = F.lit(names[-1])  # last label absorbs the remainder
    for name, upper in reversed(bounds):
        expr = F.when(h < upper, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_split_exact(
    df: DataFrame,
    stratum_col: str,
    key: Column,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Exact-count stratified split: within every stratum, EXACTLY
    ``ceil(frac_i · n)`` rows (cumulative, last label absorbs the
    remainder) get each label — the companion to :func:`split_corpus`
    when per-stratum ratios must hold exactly (tiny languages in a
    multilingual eval set: a 98/1/1 hash split of a 120-doc stratum can
    land 0 eval docs; this lands exactly ceil(1.2) = 2 in 'valid').
    Boundaries are cumulative ceils, so every non-final label gets at
    least one row in any non-empty stratum; the FINAL label absorbs the
    remainder and can be empty in tiny strata (n=5 at 80/10/10 →
    4/1/0).

    Rows are ranked within their stratum by the same multiplicative hash
    of ``key`` that :func:`split_corpus` uses (pseudorandom but
    deterministic on any engine/partitioning; ties broken by the raw
    key), so membership is stable across reruns and engines, and the
    oracle replays it. ``key`` must uniquely identify rows (a row id):
    duplicate key values tie on BOTH sort columns, making their label
    assignment partition-dependent.

    Scale (r10): per-stratum ranking rides the grouped bucketed
    row_number (:func:`.._ranks.bucketed_group_row_numbers` over the
    hash — sort parallelism strata×buckets), and the stratum count
    comes from the same offsets frame — NO stage colocates a stratum's
    whole row set on one partition anymore (previously the documented
    billions-of-rows-in-one-language ceiling; :func:`split_corpus`
    remains the shuffle-free alternative when approximate ratios are
    acceptable).
    """
    from artigraph_spark.operators._ranks import bucketed_group_row_numbers

    if fractions is None:
        fractions = {"train": 0.8, "valid": 0.1, "test": 0.1}
    fractions = dict(fractions)
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    keyed = df.withColumn("__h", _mul_hash(key)).withColumn("__k", key)
    ranked = bucketed_group_row_numbers(
        keyed, [stratum_col], "__h", ["__k"], out_col="__rn", count_col="__n"
    ).drop("__h", "__k")
    names = list(fractions)
    # Integer basis points, like split_corpus: float-accumulated
    # cumulative fractions (0.1+0.2 = 0.30000000000000004) would shift
    # ceil(cum*n) off by one for ordinary fraction dicts. ceil(bp*n/D) as
    # exact int64 arithmetic via SQL `div` (true integer division — no
    # double round-trip, so no 2^53 cliff), matching the DuckDB oracle's
    # `//`; overflow-safe to stratum n ~ 9e12 (bp·n + D−1 < 2^63).
    denom = 1_000_000
    acc_bp = 0
    uppers = []
    for name in names[:-1]:
        acc_bp += int(round(fractions[name] * denom))
        uppers.append((name, acc_bp))
    expr = F.lit(names[-1])  # last label absorbs the remainder
    for name, bp in reversed(uppers):
        bound = F.expr(
            f"(CAST({bp} AS BIGINT) * __n + {denom - 1}) div {denom}"
        )
        expr = F.when(F.col("__rn") <= bound, F.lit(name)).otherwise(expr)
    return ranked.withColumn("split", expr).drop("__rn", "__n")


def epoch_shuffle(
    df: DataFrame,
    key: Column,
    *,
    n_shards: int,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic epoch shuffle for training-data serving: assign every
    row a ``(shard, pos)`` — which output shard it belongs to and its
    position within that shard — from a multiplicative hash of
    ``key ⊕ epoch``. Different epochs give different (but each fully
    deterministic) permutations, so "shuffle every epoch" needs no RNG
    state, no global sort, and replays identically on any engine,
    partitioning, or rerun — the property that makes a training run
    resumable mid-epoch. ``key`` must uniquely identify rows: duplicate
    key values tie on both window sort columns, so their relative
    ``pos`` is partition-dependent and the replay guarantee is void for
    them.

    Scale (r10): shard assignment is a per-row expression (no shuffle);
    the within-shard position rides the grouped bucketed row_number
    (:func:`.._ranks.bucketed_group_row_numbers` over the mixed hash —
    sort parallelism shards×buckets), so a shard never needs to fit one
    partition: n_shards is now purely an OUTPUT-layout choice, not a
    memory constraint. Writing the result partitioned by ``shard`` with
    ``sortWithinPartitions(pos)`` lands ready-to-stream training files.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if epoch < 0:
        raise ValueError(f"epoch must be non-negative, got {epoch}")
    p = F.lit(_HASH_P)
    # fold the epoch in BEFORE the multiplicative mix so consecutive
    # epochs decorrelate (key+epoch*C with C coprime to p). Both operands
    # are pmod-reduced BEFORE the addition: `key + epoch*C` on a raw
    # int64 key overflows for keys within 2^31 of 2^63 (full-range
    # xxhash64 ids hit this) — pmod distributes over addition mod p, so
    # the reduced form is bit-identical to pmod(key + epoch*C, p) while
    # every intermediate stays far inside int64 (_mul_hash re-reduces
    # the already-sub-2p sum before its multiply).
    epoch_term = (F.lit(epoch).cast("long") * F.lit(2_147_483_629).cast("long")) % p
    mixed = _mul_hash(F.pmod(key.cast("long"), p) + epoch_term)
    shard = F.pmod(mixed, F.lit(n_shards))
    from artigraph_spark.operators._ranks import bucketed_group_row_numbers

    keyed = (
        df.withColumn("shard", shard)
        .withColumn("__mx", mixed)
        .withColumn("__k", key)
    )
    return bucketed_group_row_numbers(
        keyed, ["shard"], "__mx", ["__k"], out_col="pos"
    ).drop("__mx", "__k")


def curriculum_stages(
    df: DataFrame,
    score: Column,
    id_col: str,
    *,
    stratum_col: str | None = None,
    n_stages: int = 3,
) -> DataFrame:
    """Curriculum assignment for training-data ordering: rank rows by a
    difficulty/quality ``score`` (ascending — stage 1 gets the lowest
    scores, i.e. the "easy" end) and cut into ``n_stages``
    equal-frequency stages with ``ntile``, per ``stratum_col`` when
    given (each language/domain gets its own curriculum so one verbose
    stratum cannot monopolise the late stages). Ties break on
    ``id_col`` — total order, so stage membership is deterministic and
    engine-replayable. Adds ``stage``.

    Scale (r10): both forms ride the bucketed row_number machinery —
    per-stratum through :func:`.._ranks.bucketed_group_row_numbers`
    (sort parallelism strata×buckets), global through
    :func:`.._ranks.bucketed_row_numbers` — with the exact integer
    ntile projection (:func:`.._ranks.ntile_from_rank`, both engines'
    floor distribution). Neither form funnels a stratum (or the corpus)
    through one partition anymore; the previous global-form caveat
    ("always pass stratum_col at scale") is gone.
    """
    from artigraph_spark.operators._ranks import (
        bucketed_group_row_numbers,
        bucketed_row_numbers,
        ntile_from_rank,
    )

    if n_stages <= 0:
        raise ValueError(f"n_stages must be positive, got {n_stages}")
    keyed = df.withColumn("__s", score)
    if stratum_col:
        ranked = bucketed_group_row_numbers(
            keyed, [stratum_col], "__s", [id_col], out_col="__rn", count_col="__n"
        )
    else:
        # the total rides the offsets frame (count_col) — a second
        # keyed.agg(count) scan of the input would double the IO for a
        # number the bucket histogram already knows
        ranked = bucketed_row_numbers(
            keyed, "__s", [id_col], out_col="__rn", count_col="__n"
        )
    return ranked.withColumn(
        "stage", ntile_from_rank("__rn", "__n", n_stages).cast("int")
    ).drop("__s", "__rn", "__n")


def negative_samples(
    positives: DataFrame,
    user_col: str,
    item_col: str,
    *,
    k: int,
    n_items: "int | DataFrame",
    oversample: int = 3,
    salt: int = 0,
) -> DataFrame:
    """Deterministic hash-based negative sampling: for every user with at
    least one positive, up to ``k`` items the user has NO positive for —
    the contrastive/recsys training companion to the positive pairs. No
    RNG state: candidate j for a user is ``1 + h(user, j, salt) mod
    n_items`` through the module's shared multiplicative hash, so the
    sample replays identically on any engine, partitioning, or rerun,
    and ``salt`` (e.g. the epoch) swaps the whole draw deterministically.

    ``k·oversample`` candidates are drawn per user, positives and
    duplicate draws are removed, and the first ``k`` surviving draws (by
    draw index) are kept — a user whose positives cover much of the item
    space may receive fewer than ``k`` (raise ``oversample``). Items are
    assumed to be ``1..n_items`` dense ids; ``n_items`` may be an int or
    a ONE-ROW single-column DataFrame (e.g. ``items.agg(max(id))``) that
    broadcast-joins in lazily — the plan stays collect-free.

    Scale: candidates are |users|·k·oversample rows built by a per-row
    explode (no shuffle), the positive check is one anti-join
    co-partitioned on (user, item), and the final rank is a window over
    ≤ k·oversample rows per user. Nothing touches the full positives
    fan-in beyond the anti-join.
    """
    lazy_n = isinstance(n_items, DataFrame)
    if k <= 0 or oversample <= 0 or (not lazy_n and n_items <= 0):
        raise ValueError(f"need positive k/n_items/oversample, got {k}/{n_items}/{oversample}")

    u, p = F.col(user_col), F.lit(_HASH_P)
    users = positives.select(user_col).distinct()
    if lazy_n:
        (n_name,) = n_items.columns
        users = users.crossJoin(F.broadcast(n_items))
        # Fail at execution, not silently: a NULL/non-positive max (empty
        # items table) would otherwise make every candidate NULL — and
        # NULL never anti-join-matches, so the output would be (user,
        # NULL, 1) garbage pairs. assert_true returns NULL on success.
        ok = F.col(n_name).isNotNull() & (F.col(n_name) > 0)
        n_expr = F.when(F.assert_true(ok).isNull(), F.col(n_name))
    else:
        n_name, n_expr = None, F.lit(n_items)
    cands = users.select(
        "*",
        F.explode(F.sequence(F.lit(1), F.lit(k * oversample))).alias("__j"),
    ).withColumn(
        item_col,
        # Reduce the user BEFORE mixing: keeps every product within int64
        # for any int64 user id (same discipline as _mul_hash).
        1
        + F.pmod(
            _mul_hash(F.pmod(u, p) * F.lit(131) + F.col("__j") * F.lit(40503) + F.lit(salt)),
            n_expr,
        ),
    )
    if n_name is not None:
        cands = cands.drop(n_name)
    survivors = cands.join(
        positives.select(user_col, item_col).distinct(), [user_col, item_col], "left_anti"
    )
    # One j maps to one item, so after the per-(user, item) min the draw
    # index is still unique per user — the rank order is total.
    deduped = survivors.groupBy(user_col, item_col).agg(F.min("__j").alias("__j"))
    w = Window.partitionBy(user_col).orderBy("__j")
    return (
        deduped.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(user_col, F.col(item_col).alias("neg_item"), "rk")
    )


def kfold_assign(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    *,
    n_folds: int,
) -> DataFrame:
    """Exact stratified k-fold assignment: within every stratum, rows
    ordered by ``order_col`` take folds round-robin — fold sizes differ
    by at most 1 in EVERY stratum (a hash split can starve small strata
    of whole folds), and the assignment is deterministic wherever
    ``order_col`` is unique per stratum (document ids, not scores).
    Adds ``fold`` in ``0..n_folds-1``; the cross-validation companion to
    :func:`stratified_split_exact`'s fixed-ratio split.

    Scale (r10): the per-stratum row_number rides
    :func:`.._ranks.bucketed_group_row_numbers` (sort parallelism
    strata×buckets — a numeric ``order_col`` range-buckets; a string
    one degenerates to the old per-stratum colocation, no worse), same
    shape as curriculum_stages.
    """
    from artigraph_spark.operators._ranks import bucketed_group_row_numbers

    if n_folds <= 0:
        raise ValueError(f"n_folds must be positive, got {n_folds}")

    ranked = bucketed_group_row_numbers(
        df, [stratum_col], order_col, [], out_col="__rn"
    )
    return ranked.withColumn(
        "fold", ((F.col("__rn") - 1) % n_folds).cast("long")
    ).drop("__rn")
