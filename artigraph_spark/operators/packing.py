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

from artigraph_spark.operators.dedup import tokens


def token_count(text: Column) -> Column:
    """Whitespace token count, same tokenization as the dedup/text family."""
    return F.size(tokens(text))


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

    Scale: a naive global ``Window.orderBy`` prefix-sum drags every row into
    ONE partition — a non-starter at 100 TB. This uses the classic two-phase
    distributed scan instead: range-bucket on the id, per-bucket window
    prefix-sums (each bucket sorts independently), per-bucket totals
    (``num_buckets`` rows — metadata) rolled into bucket offsets on the
    driver and broadcast-joined back. The heavy path is one shuffle on the
    bucket key plus a narrow explode of spanned bins (≤ tokens/capacity + 1
    rows per doc).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    # Slim the input to (id, count) and truncate lineage ONCE: bounds, bucket
    # totals, and the window phase below would otherwise each re-execute the
    # full upstream (scan + tokenization) — 3 scans for one packing. The
    # checkpointed projection is ~16 bytes/row. NULL ids are unorderable and
    # NULL/zero counts occupy no bin: both dropped here (documented above).
    slim = (
        df.select(F.col(id_col), F.col(count_col).cast("long").alias("__n"))
        .filter(F.col(id_col).isNotNull() & (F.col("__n") > 0))
        .localCheckpoint()
    )
    bounds = slim.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    if bounds["lo"] is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, bin_id long, tokens_in_bin long"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max((hi - lo) // num_buckets + 1, 1)
    bucketed = slim.withColumn(
        "__bkt", ((F.col(id_col) - F.lit(lo)) / F.lit(width)).cast("long")
    )

    # Phase 1: per-bucket totals — num_buckets rows of metadata to the driver.
    totals = {
        r["__bkt"]: int(r["total"])
        for r in bucketed.groupBy("__bkt").agg(F.sum("__n").alias("total")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += totals[b]
    offset_df = df.sparkSession.createDataFrame(offsets, "__bkt long, __off long")

    # Phase 2: within-bucket prefix sum (buckets sort independently) shifted
    # by the broadcast bucket offset → exact global running totals. ROWS
    # frame, not the default RANGE: RANGE sums all ORDER-BY tie peers
    # together, so duplicate ids would share one cumulative value and claim
    # overlapping spans (duplicate ids get an arbitrary but valid relative
    # order; token conservation always holds).
    w = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fin = (F.sum("__n").over(w) + F.col("__off")).alias("__fin")
    laid = (
        bucketed.join(F.broadcast(offset_df), "__bkt")
        .select(F.col(id_col), F.col("__n"), fin)
        .withColumn("__start", F.col("__fin") - F.col("__n"))
    )
    cap = F.lit(int(capacity))
    first_bin = F.floor(F.col("__start") / cap)
    last_bin = F.floor((F.col("__fin") - 1) / cap)
    return laid.select(
        F.col(id_col),
        F.explode(F.sequence(first_bin, last_bin)).alias("bin_id"),
        "__start",
        "__fin",
    ).select(
        F.col(id_col),
        F.col("bin_id"),
        (
            F.least(F.col("__fin"), (F.col("bin_id") + 1) * cap)
            - F.greatest(F.col("__start"), F.col("bin_id") * cap)
        ).alias("tokens_in_bin"),
    )


def pack_sequences_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    count_col: str,
    capacity: int,
    num_buckets: int = 32,
) -> DataFrame:
    """Grouped concat-then-chunk packing: each group (language, source,
    curriculum stage) gets its OWN bin space, so batches never mix groups —
    the monolingual-batch / per-source-batch case of ``pack_sequences``.
    Returns ``(group, id, bin_id, tokens_in_bin)`` with ``bin_id`` counted
    from 0 within each group.

    Scale: same two-phase distributed prefix sum as ``pack_sequences``, with
    the bucket key extended to (group, bucket). The driver sees one row per
    (group, bucket) — metadata-sized while the group count is bounded
    (languages, sources), which is the use case; an unbounded group column
    belongs in ``cap_per_group``/``stratified_sample`` first.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    slim = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(id_col),
            F.col(count_col).cast("long").alias("__n"),
        )
        .filter(
            F.col("__g").isNotNull() & F.col(id_col).isNotNull() & (F.col("__n") > 0)
        )
        .localCheckpoint()
    )
    spark = df.sparkSession
    bounds = slim.groupBy("__g").agg(
        F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi")
    )
    bnds = {r["__g"]: (int(r["__lo"]), int(r["__hi"])) for r in bounds.collect()}
    if not bnds:
        return spark.createDataFrame(
            [], f"{group_col} string, {id_col} long, bin_id long, tokens_in_bin long"
        )
    widths = spark.createDataFrame(
        [(g, lo, max((hi - lo) // num_buckets + 1, 1)) for g, (lo, hi) in bnds.items()],
        "__g string, __lo long, __w long",
    )
    bucketed = slim.join(F.broadcast(widths), "__g").withColumn(
        "__bkt", ((F.col(id_col) - F.col("__lo")) / F.col("__w")).cast("long")
    )
    totals = {
        (r["__g"], r["__bkt"]): int(r["total"])
        for r in bucketed.groupBy("__g", "__bkt")
        .agg(F.sum("__n").alias("total"))
        .collect()
    }
    offsets, acc = [], {}
    for g, b in sorted(totals):
        offsets.append((g, b, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + totals[(g, b)]
    offset_df = spark.createDataFrame(offsets, "__g string, __bkt long, __off long")
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
    return laid.select(
        F.col("__g").alias(group_col),
        F.col(id_col),
        F.explode(
            F.sequence(F.floor(F.col("__start") / cap), F.floor((F.col("__fin") - 1) / cap))
        ).alias("bin_id"),
        "__start",
        "__fin",
    ).select(
        group_col,
        id_col,
        "bin_id",
        (
            F.least(F.col("__fin"), (F.col("bin_id") + 1) * cap)
            - F.greatest(F.col("__start"), F.col("bin_id") * cap)
        ).alias("tokens_in_bin"),
    )


def ngrams(text: Column, n: int = 3) -> Column:
    """Array of space-joined token n-grams (distinct not applied)."""
    toks = tokens(text)
    count = F.size(toks) - (n - 1)

    def gram(i: Column) -> Column:
        return F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        )

    return F.when(
        count >= 1, F.transform(F.sequence(F.lit(1), count), gram)
    ).otherwise(F.array().cast("array<string>"))


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
    tr = train.select(
        F.col(id_col), F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("__g")
    )
    bg = bench.select(
        F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("__g")
    ).distinct()
    total = tr.groupBy(id_col).agg(F.count("*").alias("total_ngrams"))
    hits = (
        tr.join(bg, "__g")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_ngrams"))
    )
    return (
        total.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            "total_ngrams",
            F.coalesce(F.col("overlap_ngrams"), F.lit(0)).alias("overlap_ngrams"),
        )
        .withColumn(
            "contamination",
            F.col("overlap_ngrams") / F.col("total_ngrams"),
        )
    )


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
    p = F.lit(1_000_000_007)
    h = F.pmod(F.pmod(key, p) * F.lit(2_654_435_761), p)
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

    Determinism across engines: the rank key goes through ``pow``/division,
    which can differ by an ULP between implementations — the key is snapped
    to a 9-decimal grid before ranking (the BM25 guard-digit technique) and
    ties break on the id, so the selected set is identical everywhere.

    Scale: a pure projection plus one TakeOrdered top-k — per-partition
    heaps of k rows, no global sort, no shuffle beyond the k-row exchange.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    p = F.lit(1_000_000_007)
    u = (F.pmod(F.pmod(F.col(id_col), p) * F.lit(2_654_435_761), p) + 1) / F.lit(
        1_000_000_008.0
    )
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 9)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__sk", key)
        .orderBy(F.col("__sk").desc(), F.col(id_col))
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
