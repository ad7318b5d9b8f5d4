"""Text analysis operators for training-data pipelines.

Language-ID heuristics, quality scoring, token counting, and document
fingerprinting — all as built-in-function Column builders (JVM-side,
codegen'd; no UDFs in the row path).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from artigraph_spark.functions import dsum
from artigraph_spark.operators.dedup import poly_char_hash, tokens
from artigraph_spark.operators.packing import ngrams_from_tokens


def token_count(text: Column) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(tokens(text)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def regex_count(text: Column, pattern: str) -> Column:
    """Occurrences of a regex — size of regexp_extract_all (cross-engine safe;
    DuckDB 1.0 lacks regexp_count)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")


def avg_token_length(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # NULL for token-less text (ANSI mode would raise on the 0-division).
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t)).alias("avg_token_len")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty text)."""
    return F.when(
        F.length(text) > 0, regex_count(text, r"[\.,;:!\?]").cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    """Digit chars / total chars (0.0 for empty text)."""
    return F.when(
        F.length(text) > 0, regex_count(text, r"[0-9]").cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    """How many tokens are in the given stopword list (exact integer count)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t))).cast("long")


_EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality heuristic: rewards mid-length documents
    and stopword presence, penalizes digit/punct density. Deterministic
    per-row double arithmetic (oracle-expressible)."""
    n_tok = token_count(text).cast("double")
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(
        stopword_hits(text, _EN_STOPWORDS).cast("double") / F.greatest(n_tok, F.lit(1.0)) * 5.0,
        F.lit(1.0),
    )
    digit_penalty = F.least(digit_ratio(text) * 5.0, F.lit(1.0))
    return (0.5 * length_score + 0.5 * sw_score) * (1.0 - digit_penalty)


# Tiny per-language marker lexicons for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def language_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language; argmax is the predicted language."""
    return {lang: stopword_hits(text, markers) for lang, markers in LANG_MARKERS.items()}


def predict_language(text: Column, default: str = "und") -> Column:
    """Argmax over language_scores; alphabetical tie-break; ``default`` when
    no marker hits at all."""
    scores = language_scores(text)
    max_score = F.greatest(*scores.values())
    pick = F.lit(default)
    for lang in sorted(scores, reverse=True):
        pick = F.when(scores[lang] == max_score, F.lit(lang)).otherwise(pick)
    return F.when(max_score == 0, F.lit(default)).otherwise(pick)


def rolling_hash(text: Column, base: int = 31, mod: int = 999_999_999_989) -> Column:
    """Polynomial rolling hash over token *lengths+first-char codes* — a cheap
    engine-independent document fingerprint (exact integer arithmetic, so
    oracle-checkable, unlike murmur/xxhash).

    h = Σ (ascii(first_char)·64 + len(token) mod 64) · base^i  (mod 999999999989)

    The modulus is < 2^40 so ``acc·base + v`` stays far from int64 overflow
    (ANSI mode would raise on wrap).
    """
    t = tokens(text)
    per_tok = F.transform(
        t,
        lambda x: (F.ascii(F.substring(x, 1, 1)) * 64 + F.length(x) % 64).cast("long"),
    )
    return F.aggregate(
        per_tok,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * base + v) % F.lit(mod).cast("long"),
    )


def content_defined_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 4,
    mask_bits: int = 4,
    base: int = 1_000_003,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS rolling-hash trick): cut
    each document into variable-length chunks whose boundaries depend only
    on LOCAL content — after token ``i`` whenever the rolling hash of the
    last ``window`` tokens has ``mask_bits`` low zero bits (average chunk
    ≈ 2^mask_bits tokens).

    Why it exists next to :func:`..dedup.dedup_segments`: fixed k-token
    segmentation is ALIGNMENT-FRAGILE — one token inserted near the top of
    a boilerplate page shifts every downstream segment, so nothing
    downstream matches its twin in other copies. CDC boundaries re-lock
    onto the content within ~window tokens of an edit, so all chunks
    outside the edited neighborhood keep their exact fingerprints — the
    property rsync, LBFS, and every dedup store build on, and what makes
    chunk-level dedup work on near-identical crawl snapshots.

    Exactness: token hashes are the polynomial char fold (ASCII-exact,
    the poly62/str_hash idiom), window and chunk fingerprints are
    ``(acc·base + h) mod 2³¹−1`` folds — everything pure int64-safe
    integer arithmetic, replayed term-for-term by the DuckDB oracle.

    Scale shape: pure per-row array expressions (one O(n·window) pass per
    document) up to the final posexplode — zero shuffles; feed the output
    to a groupBy(chunk_fp) for corpus-level dedup, which is then the only
    exchange. Token-less documents emit no chunks (the dedup_segments
    empty-doc convention is NOT needed here — this is a fingerprinting
    operator, not a rebuild).

    Returns ``(id, chunk_no, chunk, chunk_tokens, chunk_fp)`` — chunk_no
    1-based in document order.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 0 <= mask_bits <= 20:
        raise ValueError(f"mask_bits must be in [0, 20], got {mask_bits}")
    # acc < 2^31 in the fold, so base must stay < 2^31 or acc·base
    # overflows int64 (ANSI abort; silent wrap + oracle divergence
    # otherwise)
    if not 2 <= base < (1 << 31):
        raise ValueError(f"base must be in [2, 2^31), got {base}")
    m31 = (1 << 31) - 1
    mask = (1 << mask_bits) - 1
    tokh = F.transform(F.col("__toks"), lambda t: poly_char_hash(t))

    def fold(arr):
        return F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, h: (acc * base + h) % F.lit(m31),
        )

    n = F.size(F.col("__tokh"))
    # boundary AFTER token i (1-based), for i in [window, n-1]: the last
    # window-token rolling hash masks to zero. No boundary after the final
    # token (it would emit an empty chunk).
    bpos = F.when(
        n - 1 >= window,
        F.filter(
            F.sequence(F.lit(window), n - 1),
            lambda i: F.pmod(
                fold(F.slice(F.col("__tokh"), i - window + 1, window)), F.lit(mask + 1)
            )
            == F.lit(0),
        ),
    ).otherwise(F.array().cast("array<int>"))
    if mask_bits == 0:
        # every position is a boundary — keep the formula honest (2^0=1
        # divides everything) without the filter pass
        bpos = F.when(
            n - 1 >= window, F.sequence(F.lit(window), n - 1)
        ).otherwise(F.array().cast("array<int>"))
    staged = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .filter(F.size(F.col("__toks")) > 0)
        .withColumn("__tokh", tokh)
        .withColumn(
            "__bounds",
            F.concat(
                F.array(F.lit(0).cast("int")),
                bpos.cast("array<int>"),
                F.array(n.cast("int")),
            ),
        )
    )
    lo = lambda k: F.element_at(F.col("__bounds"), k + 1)  # noqa: E731
    hi = lambda k: F.element_at(F.col("__bounds"), k + 2)  # noqa: E731
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(F.col("__bounds")) - 2),
        lambda k: F.struct(
            (k + 1).cast("long").alias("chunk_no"),
            F.array_join(
                F.slice(F.col("__toks"), lo(k) + 1, hi(k) - lo(k)), " "
            ).alias("chunk"),
            (hi(k) - lo(k)).cast("long").alias("chunk_tokens"),
            fold(F.slice(F.col("__tokh"), lo(k) + 1, hi(k) - lo(k))).alias(
                "chunk_fp"
            ),
        ),
    )
    return staged.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(
        F.col(id_col),
        F.col("__c.chunk_no").alias("chunk_no"),
        F.col("__c.chunk").alias("chunk"),
        F.col("__c.chunk_tokens").alias("chunk_tokens"),
        F.col("__c.chunk_fp").alias("chunk_fp"),
    )


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, token, tf): per-document term counts.

    One explode + one groupBy — the shuffle is on (doc, token), which is
    near-unique, so partial aggregation collapses almost nothing but the
    exchange spreads evenly (no hot keys beyond stopwords-per-doc, bounded
    by document length)."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def tf_idf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_df: int = 1,
) -> DataFrame:
    """(doc, token, tf, df_t, tfidf) — smoothed TF-IDF:
    ``tfidf = tf * (ln((N + 1) / (df_t + 1)) + 1)`` (sklearn-style smooth idf).

    Shape at scale: two aggregations (per-doc term counts; per-token doc
    freqs) and one equi-join on token. N is a literal-free scalar carried by
    a broadcast 1-row cross join — no collect(), the plan stays lazy and
    fully distributed. Token doc-freq skew (stopwords) is bounded because
    the per-doc distinct already collapsed repeats: df_t rows are at most
    |vocabulary| and the join's build side (token, df_t) broadcasts when
    small, shuffles on token otherwise.
    """
    tf = term_frequencies(df, id_col, text_col)
    docfreq = (
        tf.groupBy("token")
        .agg(F.count("*").cast("long").alias("df_t"))
        .filter(F.col("df_t") >= F.lit(int(min_df)))
    )
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).cast("long").alias("__n_docs__")
    )
    return (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df_t",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n_docs__") + F.lit(1)).cast("double")
                        / (F.col("df_t") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc, bm25) Okapi BM25 of each document against a bag of query terms.

    idf uses the standard BM25 form ln(1 + (N - df + 0.5)/(df + 0.5)); doc
    length normalization against the corpus mean. Everything is expressions
    over two aggregates + one filtered join — no UDFs, no collect; the
    query-term filter shrinks the tf table before the join.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    tf = term_frequencies(df, id_col, text_col).filter(F.col("token").isin(terms))
    docfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df_t"))
    lens = df.select(
        F.col(id_col), token_count(F.col(text_col)).alias("__dl__")
    )
    stats = lens.select(
        F.count("*").cast("long").alias("__n_docs__"),
        F.avg("__dl__").alias("__avg_dl__"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs__") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    norm_tf = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + F.lit(k1) * (1 - b + F.lit(b) * F.col("__dl__") / F.col("__avg_dl__"))
    )
    # Guard-digit rounding BEFORE the fixed-point floor: the term contains
    # ln(), which can differ by 1 ULP across engines; snapping to a 9-decimal
    # grid first means a ULP difference can only matter if the true value
    # straddles BOTH a rounding boundary and a 2^-20 floor boundary.
    return (
        tf.join(F.broadcast(docfreq), "token")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(dsum(F.round(idf * norm_tf, 9)).alias("bm25"))  # fixed-point: order-independent
    )


def dedup_lines(text: Column, sep: str = "\n") -> Column:
    """Within-document line deduplication (the C4-style cleanup for
    boilerplate: nav bars, cookie banners, repeated headers): keep the FIRST
    occurrence of each line, preserve order, rejoin. ``array_distinct``
    preserves first-occurrence order in Spark — a pure per-row expression,
    zero shuffles. ``sep`` is a LITERAL separator (regex-escaped before the
    split, since ``F.split`` takes a pattern but ``array_join`` a literal —
    an unescaped "|" would split between every character and rejoin
    garbage)."""
    return F.array_join(F.array_distinct(F.split(text, re.escape(sep))), sep)


def line_repetition_ratio(text: Column, sep: str = "\n") -> Column:
    """Share of lines that are repeats of an earlier line — a boilerplate/
    spam signal (0.0 = all lines unique). ``sep`` is a literal separator
    (see dedup_lines). NULL-safe: empty text has one empty line, ratio 0."""
    parts = F.split(text, re.escape(sep))
    return ((F.size(parts) - F.size(F.array_distinct(parts))) / F.size(parts)).cast(
        "double"
    )


def normalize_text(text: Column) -> Column:
    """Deterministic normalization chain for crawl text: lowercase,
    typographic quotes/dashes folded to ASCII, control characters stripped,
    whitespace collapsed and trimmed. Pure JVM expression pipeline — a
    zero-shuffle scan at any scale, exactly reproducible on any engine
    (every step is a plain replace-all regexp_replace)."""
    c = F.lower(text)
    c = F.regexp_replace(c, "[\\u2018\\u2019\\u201A\\u201B]", "'")
    c = F.regexp_replace(c, "[\\u201C\\u201D\\u201E\\u201F]", "\"")
    c = F.regexp_replace(c, "[\\u2012\\u2013\\u2014\\u2015]", "-")
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window document chunking — the standard pre-tokenization step
    for context-window training and embedding pipelines: split each document
    into token windows of ``chunk_size`` advancing by ``stride`` (overlap =
    chunk_size - stride). Returns ``(id, chunk_idx, chunk_text, n_tokens)``;
    empty documents produce no chunks, documents at or under ``chunk_size``
    produce exactly one.

    Reference parity: the reference exposes chunking only inside opaque
    producer bodies; this is the declarative equivalent.

    Scale: a pure per-row explode over built-in array functions — no
    shuffle, no UDF; output row count is ~n_tokens/stride per doc, and the
    explode streams (never materializes a doc's full chunk set in memory
    beyond one row's array of start offsets).
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if stride <= 0 or stride > chunk_size:
        raise ValueError(
            f"stride must be in [1, chunk_size]; got stride={stride}, "
            f"chunk_size={chunk_size}"
        )
    # Materialize the token array in a projection FIRST (see
    # ngrams_from_tokens: HOF/array arguments are re-evaluated per access
    # when inlined).
    base = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        .withColumn("__n", F.size("__t").cast("long"))
        .filter(F.col("__n") > 0)
    )
    # ceil((n - chunk_size) / stride) + 1 for n > chunk_size, else 1.
    # Integral DIV (not double floor) keeps it exact at any length.
    k = F.when(F.col("__n") <= chunk_size, F.lit(1).cast("long")).otherwise(
        F.expr(f"(__n - {chunk_size} + {stride} - 1) DIV {stride} + 1")
    )
    start = (F.col("chunk_idx") * stride).cast("int")
    return (
        base.select(
            F.col(id_col),
            "__t",
            "__n",
            F.explode(F.sequence(F.lit(0).cast("long"), k - 1)).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.array_join(F.slice("__t", start + 1, chunk_size), " ").alias("chunk_text"),
            F.least(F.lit(chunk_size).cast("long"), F.col("__n") - F.col("chunk_idx") * stride).alias(
                "n_tokens"
            ),
        )
    )


def repetition_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style within-document repetition signals: for each document
    with at least one token, the distinct-token ratio, the most frequent
    token's share of all tokens, and the most frequent bigram's share of
    all bigrams (NULL when the doc has fewer than 2 tokens). High top-share
    / low distinct-ratio marks keyword-stuffed or boilerplate pages that
    per-line dedup misses.

    Scale: computing a per-row mode with array HOFs is O(tokens × distinct)
    per document — quadratic on exactly the repetitive documents this
    filter targets. Instead explode to (doc, token) rows and aggregate:
    two shuffles keyed by (doc, token) — linear, partition-even, and
    map-side-combined by Catalyst.
    """
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t")).filter(
        F.size("__t") > 0
    )
    tok_stats = (
        base.select(F.col(id_col), F.explode("__t").alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.count("*").alias("__d"),
            F.max("__c").alias("__topc"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("__d") / F.col("n_tokens")).alias("distinct_token_ratio"),
            (F.col("__topc") / F.col("n_tokens")).alias("top_token_share"),
        )
    )
    big_stats = (
        base.select(
            F.col(id_col),
            F.explode(ngrams_from_tokens(F.col("__t"), 2)).alias("__bg"),
        )
        .groupBy(id_col, "__bg")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(F.sum("__c").alias("__nb"), F.max("__c").alias("__topb"))
        .select(F.col(id_col), (F.col("__topb") / F.col("__nb")).alias("top_bigram_share"))
    )
    return tok_stats.join(big_stats, id_col, "left")


def unigram_logprob_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perplexity-proxy quality scoring WITHOUT an external LM: per-document
    mean unigram negative log-likelihood under the corpus's OWN unigram
    distribution — ``nll = avg over tokens of ln(total_tokens / count(tok))``.
    Low nll = built from common words (boilerplate-ish); high nll = heavy
    tail of rare tokens (noise/garble); the middle is normal prose. The
    standard cheap stand-in where a real LM perplexity filter would run.

    Returns ``(id, n_tokens, nll)`` for documents with >= 1 token.

    Scale: one explode + a vocabulary aggregate + an equi-join on the token
    + a doc-keyed aggregate — the same shape as tf_idf. The corpus total
    rides a broadcast 1-row cross join (no collect, plan stays lazy).
    Per-token terms go through the shared guard-digit + fixed-point path
    (round 9 then dsum) so the per-doc mean is order-independent and
    cross-engine exact despite the ln().
    """
    from artigraph_spark.functions import davg

    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok")
    )
    freqs = tok.groupBy("__tok").agg(F.count("*").cast("long").alias("__c"))
    total = freqs.agg(F.sum("__c").cast("long").alias("__total"))
    term = F.round(
        F.log(F.col("__total").cast("double") / F.col("__c").cast("double")), 9
    )
    return (
        tok.join(freqs, "__tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            davg(term).alias("nll"),
        )
    )


# Conservative PII patterns, deliberately restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB/engine
# oracles): no backreferences, no lookaround, character classes and
# bounded repetition only. Order matters: emails before phones (so the
# local part's digits aren't half-eaten), IPs before phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_pii(
    text: Column, patterns: list[tuple[str, str, str]] | None = None
) -> Column:
    """Regex PII redaction (emails, IPv4s, phone-number-shaped digit runs)
    — the pre-training scrub pass. A chained ``regexp_replace`` pipeline:
    pure JVM expressions, zero shuffle, codegen'd; at 100 TB this is scan
    throughput, nothing else. Patterns are engine-portable by construction
    (see PII_PATTERNS) so the same scrub is oracle-checkable.

    Recall over precision is NOT the goal here: the default patterns are
    conservative (low false-positive) because over-redaction destroys
    training text; pass custom ``patterns`` to widen."""
    for _name, pat, repl in patterns or PII_PATTERNS:
        text = F.regexp_replace(text, pat, repl)
    return text


def collocation_pmi(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    top_k: int = 200,
) -> DataFrame:
    """Corpus-level collocation extraction: the ``top_k`` adjacent word
    pairs by pointwise mutual information, ``pmi = ln(p(w1,w2) /
    (p(w1)·p(w2)))``, among pairs seen at least ``min_count`` times. High
    PMI marks multiword units ("new york", "machine learning") — the
    standard signal for tokenizer-vocabulary curation and phrase mining
    over a pre-training corpus.

    Returns ``(w1, w2, pair_count, pmi_r)`` with PMI rounded to 6 places;
    ties at the top-k boundary break on (w1, w2), so the cut is total.

    Scale: two corpus aggregates (unigram and bigram counts — each one
    shuffle with map-side combine), two vocabulary-keyed equi-joins to
    attach the marginals, broadcast single-row totals, and a TakeOrdered
    top-k. Never all-pairs: only OBSERVED bigrams are scored, and the
    ``min_count`` filter drops the hapax tail before the joins. The PMI
    ratio divides doubles in a fixed shape ((bc/N2) / ((c1/N1)·(c2/N1)))
    so engines agree bit-for-bit before rounding.
    """
    toks = df.select(tokens(F.col(text_col)).alias("__t"))
    uni = (
        toks.select(F.explode("__t").alias("__w"))
        .groupBy("__w")
        .agg(F.count("*").cast("long").alias("__c"))
    )
    n_uni = uni.agg(F.sum("__c").cast("long").alias("__nu"))
    bgc = (
        toks.select(F.explode(ngrams_from_tokens(F.col("__t"), 2)).alias("__bg"))
        .groupBy("__bg")
        .agg(F.count("*").cast("long").alias("__bc"))
    )
    n_big = bgc.agg(F.sum("__bc").cast("long").alias("__nb"))
    pair = bgc.filter(F.col("__bc") >= min_count).select(
        F.element_at(F.split("__bg", " "), 1).alias("w1"),
        F.element_at(F.split("__bg", " "), 2).alias("w2"),
        F.col("__bc"),
    )
    u1 = uni.select(F.col("__w").alias("__w1k"), F.col("__c").alias("__c1"))
    u2 = uni.select(F.col("__w").alias("__w2k"), F.col("__c").alias("__c2"))
    pmi = F.log(
        (F.col("__bc").cast("double") / F.col("__nb"))
        / (
            (F.col("__c1").cast("double") / F.col("__nu"))
            * (F.col("__c2").cast("double") / F.col("__nu"))
        )
    )
    return (
        pair.join(u1, F.col("__w1k") == F.col("w1"))
        .join(u2, F.col("__w2k") == F.col("w2"))
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            F.col("__bc").alias("pair_count"),
            F.round(pmi, 6).alias("pmi_r"),
        )
        .orderBy(F.col("pmi_r").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_k)
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-document n-gram novelty: the share of a document's DISTINCT
    word n-grams that appear in no other document — high novelty marks
    original content, low novelty boilerplate/template families (the
    corpus-level complement of `repetition_scores`' within-doc signals).

    Scale shape: documents explode to distinct n-gram shingles (per-row
    work), shingle document-frequencies are ONE groupBy on the shingle,
    and the per-doc roll-up joins shingle-keyed frames — no document
    pairing anywhere, so cost tracks corpus size, not corpus². The
    novelty ratio is a double division of two exact int64 counts —
    engine-deterministic. Documents with fewer than ``n`` tokens have no
    shingles: ``n_shingles = 0`` and NULL ``novelty_r``. Returns
    ``(id, n_shingles, n_unique, novelty_r)``.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    # project the token array FIRST: an inline tokens(text) inside the
    # shingle lambda is re-split per element access (HOFs run interpreted,
    # no CSE — ngrams_from_tokens' docstring measured 23x), and the
    # shared helper keeps the shingle definition single-sourced
    doc_sh = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(ngrams_from_tokens(F.col("__toks"), n))
            ).alias("__s"),
        )
    )
    sh_df = doc_sh.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        doc_sh.join(sh_df, "__s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.when(
                F.col("n_shingles").isNotNull(),
                F.round(
                    F.col("n_unique").cast("double")
                    / F.col("n_shingles").cast("double"),
                    9,
                ),
            ).alias("novelty_r"),
        )
    )


def g2_keywords(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    top_k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Log-likelihood-ratio (Dunning G²) keyword extraction: for each
    group (source, language, cluster), the tokens most characteristic of
    that group vs. the rest of the corpus — the standard corpus-linguistics
    "what makes this slice different" audit (Dunning 1993).

    Per (group, token) 2×2 table (a = token-in-group occurrences, b =
    other tokens in group, c = token elsewhere, d = everything else):
    ``G² = 2·Σ O·ln(O/E)`` with zero cells contributing 0. All counts are
    exact int64; each of the four terms is one double expression on exact
    counts snapped to the 6-decimal grid, added in a FIXED order, so the
    score and the (g2 desc, token) top-k order replay on any engine.
    ``overrep`` flags a·N > n_g·tot_t (integer-exact direction test).

    Scale shape: one explode + (group, token) count shuffle, two
    summary-sized marginal joins, a broadcast scalar N, and a per-group
    top-k window over candidate tokens only (``min_count`` prunes the
    long tail BEFORE the window — at 100 TB raise it with corpus size).

    Returns ``(group, token, a, g2_r, overrep, rk)`` with rk ≤ top_k.
    """
    from pyspark.sql import Window

    g, t = F.col(group_col), F.col(text_col)
    toks = df.filter(g.isNotNull() & t.isNotNull()).select(
        g.alias("__g"), F.explode(tokens(t)).alias("token")
    )
    cells = toks.groupBy("__g", "token").agg(F.count(F.lit(1)).alias("__a"))
    ng = cells.groupBy("__g").agg(F.sum("__a").alias("__ng"))
    tt = cells.groupBy("token").agg(F.sum("__a").alias("__tt"))
    tot = cells.agg(F.sum("__a").alias("__N"))
    j = (
        cells.filter(F.col("__a") >= min_count)
        .join(ng, "__g")
        .join(tt, "token")
        .crossJoin(F.broadcast(tot))
    )
    ad = F.col("__a").cast("double")
    bd = (F.col("__ng") - F.col("__a")).cast("double")
    cd = (F.col("__tt") - F.col("__a")).cast("double")
    dd = (F.col("__N") - F.col("__ng") - F.col("__tt") + F.col("__a")).cast("double")
    ngd, ttd, nd = (
        F.col("__ng").cast("double"),
        F.col("__tt").cast("double"),
        F.col("__N").cast("double"),
    )

    def term(o: Column, row: Column, col: Column) -> Column:
        return F.when(
            o > 0, F.round(o * F.log(o / (row * col / nd)), 6)
        ).otherwise(F.lit(0.0))

    g2 = F.round(
        2.0
        * (
            (
                (term(ad, ngd, ttd) + term(bd, ngd, nd - ttd))
                + term(cd, nd - ngd, ttd)
            )
            + term(dd, nd - ngd, nd - ttd)
        ),
        6,
    )
    scored = j.select(
        F.col("__g").alias(group_col),
        "token",
        F.col("__a").alias("a"),
        g2.alias("g2_r"),
        # DECIMAL(38,0) products: a·N reaches token-count², past int64
        # exactly when the corpus does (ANSI would abort the job there).
        (
            F.col("__a").cast("decimal(38,0)") * F.col("__N")
            > F.col("__ng").cast("decimal(38,0)") * F.col("__tt")
        ).alias("overrep"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("g2_r").desc(), F.col("token").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_k
    )


def readability_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document, from three
    regex counts — the classic text-difficulty heuristics, used as
    training-data quality signals (filter texts far outside the target
    band) next to quality_score's surface ratios.

    Heuristic components (all exact int64 counts via regexp_extract_all,
    the repo's cross-engine-safe counting idiom):
      - words      = runs of [a-z] in the lowercased text;
      - sentences  = runs of terminal punctuation [.!?], floored at 1
        (fragments without punctuation read as a single sentence);
      - syllables  = vowel-group runs [aeiouy]+ — the standard cheap
        syllable proxy (each maximal vowel cluster ≈ one syllable),
        floored at the word count so no word contributes 0.

    ``flesch_r = 206.835 − 1.015·(words/sentences) − 84.6·(syl/words)``;
    ``fk_grade_r = 0.39·(words/sentences) + 11.8·(syl/words) − 15.59``.
    Both are two divisions of exact integers + constant multiplies,
    snapped to the 9-decimal guard grid — engine-identical. Documents
    with zero words get NULL scores.

    Scale shape: pure per-row projection — zero shuffles, whole-stage
    codegen, scan-linear; exactly what a 100 TB quality-scoring pass
    should compile to.

    Returns ``(id, n_words, n_sentences, n_syllables, flesch_r,
    fk_grade_r)``.
    """
    t = F.lower(F.col(text_col))
    words = regex_count(t, "[a-z]+")
    sentences = F.greatest(regex_count(t, "[.!?]+"), F.lit(1).cast("long"))
    syllables = F.greatest(regex_count(t, "[aeiouy]+"), words)
    wd, sd, yd = (
        words.cast("double"),
        sentences.cast("double"),
        syllables.cast("double"),
    )
    ok = words > 0
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.when(
            ok,
            F.round(
                F.lit(206.835) - F.lit(1.015) * (wd / sd) - F.lit(84.6) * (yd / wd),
                9,
            ),
        ).alias("flesch_r"),
        F.when(
            ok,
            F.round(
                F.lit(0.39) * (wd / sd) + F.lit(11.8) * (yd / wd) - F.lit(15.59),
                9,
            ),
        ).alias("fk_grade_r"),
    )


def bigram_logprob_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram negative log-likelihood under the corpus's
    OWN add-one-smoothed bigram model:
    ``nll = avg over bigrams of ln((c(w1) + V) / (c(w1,w2) + 1))`` —
    the next step up from `unigram_logprob_scores` as a perplexity-proxy
    quality filter: it scores WORD ORDER, so shuffled/garbled text that
    unigram stats cannot see ranks high-nll while common-phrase
    boilerplate ranks low. Add-ONE smoothing keeps every ratio a pure
    integer quotient (c1 + V over c12 + 1), so the only float op is the
    guard-grid ln and the fixed-point mean — cross-engine exact.

    Bigrams come from one zip-slice projection over the token array
    (element i paired with i+1 — no window, no self-join); the corpus
    model is two map-side-combined aggregates (context counts, bigram
    counts) joined back on the bigram key; V (distinct corpus tokens)
    rides the broadcast 1-row cross join. Same plan family as
    tf_idf/unigram — explode + aggregate + equi-join, linear at any
    scale.

    Returns ``(id, n_bigrams, nll)`` for documents with ≥2 tokens.
    """
    from artigraph_spark.functions import davg

    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks")).filter(
        F.size("__toks") >= 2
    )
    pairs = t.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(__toks, 1, size(__toks) - 1),"
                " (x, i) -> struct(x AS w1, element_at(__toks, i + 2) AS w2))"
            )
        ).alias("__p"),
    ).select(F.col(id_col), F.col("__p.w1").alias("__w1"), F.col("__p.w2").alias("__w2"))
    ctx = pairs.groupBy("__w1").agg(F.count(F.lit(1)).alias("__c1"))
    big = pairs.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).alias("__c12"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__tok"))
        .agg(F.count_distinct(F.col("__tok")).alias("__v"))
    )
    term = F.round(
        F.log(
            (F.col("__c1") + F.col("__v")).cast("double")
            / (F.col("__c12") + F.lit(1)).cast("double")
        ),
        9,
    )
    return (
        pairs.join(big, ["__w1", "__w2"])
        .join(ctx, "__w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            davg(term).alias("nll"),
        )
    )
