"""Training-pipeline assembly queries: sequence packing, contamination
audit, stratified mixing — the operators/packing.py surface, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from artigraph_spark.functions import oracle_davg
from artigraph_spark.queries import query
from artigraph_spark.sources import load

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"


@query(
    "pack_sequences",
    bench=True,
    oracle=f"""
    WITH tc AS (
        SELECT doc_id, len({_TOKS}) AS n FROM documents
    ),
    cum AS (
        SELECT doc_id, n,
               CAST(SUM(n) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fin
        FROM tc
    ),
    spans AS (SELECT doc_id, fin - n AS strt, fin FROM cum WHERE n > 0)
    SELECT doc_id, g.b AS bin_id,
           LEAST(fin, (g.b + 1) * 128) - GREATEST(strt, g.b * 128) AS tokens_in_bin
    FROM spans,
         UNNEST(generate_series(CAST(FLOOR(strt / 128.0) AS BIGINT),
                                CAST(FLOOR((fin - 1) / 128.0) AS BIGINT))) AS g(b)
    """,
)
def pack_sequences_q(spark, sf_dir):
    """Concat-then-chunk packing of the document corpus into 128-token
    context windows (distributed two-phase prefix sum — no global window)."""
    from artigraph_spark.operators.packing import pack_sequences, token_count

    d = load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(d, "doc_id", "n_tokens", capacity=128)


@query(
    "pack_sequences_by_lang",
    oracle=f"""
    WITH tc AS (
        SELECT lang, doc_id, len({_TOKS}) AS n FROM documents
    ),
    cum AS (
        SELECT lang, doc_id, n,
               CAST(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fin
        FROM tc WHERE lang IS NOT NULL
    ),
    spans AS (SELECT lang, doc_id, fin - n AS strt, fin FROM cum WHERE n > 0)
    SELECT lang, doc_id, g.b AS bin_id,
           LEAST(fin, (g.b + 1) * 128) - GREATEST(strt, g.b * 128) AS tokens_in_bin
    FROM spans,
         UNNEST(generate_series(CAST(FLOOR(strt / 128.0) AS BIGINT),
                                CAST(FLOOR((fin - 1) / 128.0) AS BIGINT))) AS g(b)
    """,
)
def pack_sequences_by_lang_q(spark, sf_dir):
    """Monolingual packing: each language packs into its own 128-token bin
    space (per-group two-phase prefix sum)."""
    from artigraph_spark.operators.packing import pack_sequences_by_group, token_count

    d = load(spark, sf_dir, "documents").select(
        "lang", "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences_by_group(d, "lang", "doc_id", "n_tokens", capacity=128)


@query(
    "benchmark_contamination",
    bench=True,
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM toks WHERE len(t) >= 3
    ),
    tr AS (SELECT doc_id, u.g AS gram FROM grams, UNNEST(g) AS u(g) WHERE doc_id >= 50),
    bg AS (SELECT DISTINCT u.g AS gram FROM grams, UNNEST(g) AS u(g) WHERE doc_id < 50),
    tot AS (SELECT doc_id, COUNT(*) AS total_ngrams FROM tr GROUP BY doc_id),
    hit AS (SELECT tr.doc_id, COUNT(*) AS overlap_ngrams
            FROM tr JOIN bg USING (gram) GROUP BY tr.doc_id)
    SELECT t.doc_id, t.total_ngrams,
           COALESCE(h.overlap_ngrams, 0) AS overlap_ngrams,
           CAST(COALESCE(h.overlap_ngrams, 0) AS DOUBLE) / t.total_ngrams AS contamination
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
)
def benchmark_contamination_q(spark, sf_dir):
    """Train/eval trigram-overlap audit: docs 0-49 stand in as the benchmark
    set, the rest as the training corpus."""
    from artigraph_spark.operators.packing import benchmark_contamination

    d = load(spark, sf_dir, "documents")
    return benchmark_contamination(
        d.filter(F.col("doc_id") >= 50),
        d.filter(F.col("doc_id") < 50),
        "doc_id",
        "text",
        n=3,
    )


@query(
    "decontaminate_corpus",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM toks WHERE len(t) >= 3
    ),
    tr AS (SELECT doc_id, u.g AS gram FROM grams, UNNEST(g) AS u(g) WHERE doc_id >= 50),
    bg AS (SELECT DISTINCT u.g AS gram FROM grams, UNNEST(g) AS u(g) WHERE doc_id < 50),
    tot AS (SELECT doc_id, COUNT(*) AS total_ngrams FROM tr GROUP BY doc_id),
    hit AS (SELECT tr.doc_id, COUNT(*) AS overlap_ngrams
            FROM tr JOIN bg USING (gram) GROUP BY tr.doc_id),
    flagged AS (
        SELECT t.doc_id FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
        WHERE CAST(COALESCE(h.overlap_ngrams, 0) AS DOUBLE) / t.total_ngrams >= 0.2
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d
    WHERE d.doc_id >= 50 AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
    """,
)
def decontaminate_corpus_q(spark, sf_dir):
    """Decontamination as a pipeline step: audit trigram overlap against the
    benchmark stand-in (docs 0-49) and drop training docs at >= 20%
    contamination; returns the clean corpus (the audit table is the
    benchmark_contamination query)."""
    from artigraph_spark.operators.packing import decontaminate_corpus

    d = load(spark, sf_dir, "documents")
    clean, _audit = decontaminate_corpus(
        d.filter(F.col("doc_id") >= 50),
        d.filter(F.col("doc_id") < 50),
        "doc_id",
        "text",
        n=3,
        threshold=0.2,
    )
    return clean.select("doc_id", "source", "lang")


@query(
    "stratified_sample_mix",
    bench=True,
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE ((((((l_orderkey % 1000000007) * 7 + l_linenumber) % 1000000007)
             * 2654435761) % 1000000007) % 10000) <
          CASE l_returnflag WHEN 'A' THEN 500 WHEN 'N' THEN 1500
                            WHEN 'R' THEN 2500 ELSE 0 END
    """,
)
def stratified_sample_mix_q(spark, sf_dir):
    """Dataset-mixing sampler: reproducible per-stratum rates (5% of 'A',
    15% of 'N', 25% of 'R') keyed by row identity, not partitioning."""
    from artigraph_spark.operators.packing import stratified_sample

    li = load(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") % 1_000_000_007) * 7 + F.col("l_linenumber")
    return stratified_sample(
        li,
        "l_returnflag",
        {"A": 0.05, "N": 0.15, "R": 0.25},
        key,
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


@query(
    "domain_cap",
    bench=True,
    oracle="""
    SELECT doc_id, source, lang
    FROM (
        SELECT doc_id, source, lang,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 25
    """,
)
def domain_cap_q(spark, sf_dir):
    """Cap each source domain at 25 documents, selected by deterministic
    id-hash order (unbiased, engine/partitioning independent)."""
    from artigraph_spark.operators.packing import cap_per_group

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    # Struct ordering = lexicographic over (hash, id) — the id tiebreak makes
    # the ordering total, so the kept set is unique.
    from artigraph_spark.operators.packing import _mul_hash

    # _mul_hash's inner pmod keeps the product within int64 for ANY id —
    # the bare (doc_id * A) % p form overflows under ANSI past doc_id
    # ~3.5e9 (identical values for in-range ids, so the kept set is
    # unchanged; the oracle carries the same reduction).
    return cap_per_group(d, "source", 25, order_key=F.struct(
        _mul_hash(F.col("doc_id")), F.col("doc_id")
    ))


@query(
    "weighted_sample_topk",
    oracle="""
    SELECT doc_id, n_chars
    FROM (
        SELECT doc_id, n_chars,
               round(ln(ln(1000000008.0 /
                   ((((doc_id % 1000000007) * 2654435761) % 1000000007) + 1)))
                   - ln(n_chars), 9) AS sk
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    ORDER BY sk ASC, doc_id
    LIMIT 100
    """,
)
def weighted_sample_topk_q(spark, sf_dir):
    """Length-weighted document sample (top-100 by Efraimidis–Spirakis key,
    weight = n_chars): longer docs proportionally more likely, selection
    exactly reproducible on any engine."""
    from artigraph_spark.operators.packing import weighted_sample_topk

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_topk(d, "doc_id", "n_chars", k=100)


@query(
    "dedup_lines_in_doc",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ls FROM documents),
    lines AS (
        SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
        FROM t
    ),
    firsts AS (SELECT doc_id, line, MIN(pos) AS p FROM lines GROUP BY doc_id, line),
    agg AS (
        SELECT doc_id, string_agg(line, ' ' ORDER BY p) AS dedup_text,
               COUNT(*) AS n_uniq
        FROM firsts GROUP BY doc_id
    )
    SELECT t.doc_id, agg.dedup_text,
           CAST(len(t.ls) - agg.n_uniq AS DOUBLE) / len(t.ls) AS repetition_ratio
    FROM t JOIN agg ON t.doc_id = agg.doc_id
    """,
)
def dedup_lines_in_doc_q(spark, sf_dir):
    """Within-document segment dedup + repetition ratio (the C4 boilerplate
    cleanup; fixture text is single-line, so segments = tokens here — the
    operator's `sep` generalizes to real newline-structured docs). Spark
    side is a pure per-row expression; the oracle re-derives first-
    occurrence order via explode + min(pos)."""
    from artigraph_spark.operators.text import dedup_lines, line_repetition_ratio

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        dedup_lines(F.col("text"), sep=" ").alias("dedup_text"),
        line_repetition_ratio(F.col("text"), sep=" ").alias("repetition_ratio"),
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(lower(text),
                               '[\\u2018\\u2019\\u201A\\u201B]', '''', 'g'),
                           '[\\u201C\\u201D\\u201E\\u201F]', '"', 'g'),
                       '[\\u2012\\u2013\\u2014\\u2015]', '-', 'g'),
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
               '\\s+', ' ', 'g')) AS norm_text,
           CAST(length(text) AS BIGINT) AS orig_chars
    FROM documents
    """,
)
def text_normalize_q(spark, sf_dir):
    """Crawl-text cleanup: typographic-to-ASCII folding, control-character
    strip, whitespace collapse — the standard pre-tokenization pass."""
    from artigraph_spark.operators.text import normalize_text

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        normalize_text(F.col("text")).alias("norm_text"),
        F.length("text").cast("long").alias("orig_chars"),
    )


@query(
    "chunk_documents",
    bench=True,
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    c AS (SELECT doc_id, t, n,
                 CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 23) // 24 + 1 END AS k
          FROM d)
    SELECT doc_id, u.i AS chunk_idx,
           array_to_string(list_slice(t, u.i * 24 + 1, u.i * 24 + 32), ' ') AS chunk_text,
           LEAST(32, n - u.i * 24) AS n_tokens
    FROM c, UNNEST(range(0, k)) AS u(i)
    """,
)
def chunk_documents_q(spark, sf_dir):
    """Sliding-window chunking: 32-token windows advancing by 24 (8-token
    overlap) — the context-window preparation step."""
    from artigraph_spark.operators.text import chunk_documents

    d = load(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_size=32, stride=24)


@query(
    "repetition_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tok AS (SELECT doc_id, u.x AS tok FROM toks, UNNEST(t) AS u(x)),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    td AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                  COUNT(*) AS d, MAX(c) AS topc
           FROM tc GROUP BY doc_id),
    big AS (SELECT doc_id,
                   list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS g
            FROM toks WHERE len(t) >= 2),
    bgr AS (SELECT doc_id, u.x AS bg FROM big, UNNEST(g) AS u(x)),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgr GROUP BY doc_id, bg),
    bd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, MAX(c) AS topb
           FROM bc GROUP BY doc_id)
    SELECT td.doc_id, td.n_tokens,
           td.d / td.n_tokens AS distinct_token_ratio,
           td.topc / td.n_tokens AS top_token_share,
           bd.topb / bd.nb AS top_bigram_share
    FROM td LEFT JOIN bd ON td.doc_id = bd.doc_id
    """,
)
def repetition_scores_q(spark, sf_dir):
    """Gopher-style repetition signals per document: distinct-token ratio,
    top-token share, top-bigram share."""
    from artigraph_spark.operators.text import repetition_scores

    d = load(spark, sf_dir, "documents")
    return repetition_scores(d, "doc_id", "text")


@query(
    "select_token_budget",
    bench=True,
    oracle=f"""
    WITH tc AS (
        SELECT doc_id, n_chars, len({_TOKS}) AS n_tok
        FROM documents
        WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
          AND len({_TOKS}) > 0
    )
    SELECT doc_id, n_chars, n_tok,
           CAST(SUM(n_tok) OVER (ORDER BY n_chars DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS running_total
    FROM tc
    QUALIFY running_total <= 10000
    """,
)
def select_token_budget_q(spark, sf_dir):
    """Quality-ordered corpus selection under a 10k-token budget: longest
    documents first (n_chars standing in for a quality score), ties by id."""
    from artigraph_spark.operators.packing import select_token_budget, token_count

    d = load(spark, sf_dir, "documents").withColumn(
        "n_tok", token_count(F.col("text"))
    )
    return select_token_budget(d, "doc_id", "n_chars", "n_tok", 10_000)


@query(
    "upsample_domains",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
                           WHEN 'src2' THEN 0 ELSE NULL END
               + CASE WHEN ((((doc_id % 1000000007) * 2654435761) % 1000000007)
                            % 10000) <
                           CASE source WHEN 'src0' THEN 5000 WHEN 'src1' THEN 0
                                       WHEN 'src2' THEN 2500 ELSE NULL END
                      THEN 1 ELSE 0 END AS copies
        FROM documents WHERE source IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id, source, u.i AS copy_idx
    FROM d, UNNEST(range(1, copies + 1)) AS u(i)
    WHERE copies >= 1
    """,
)
def upsample_domains_q(spark, sf_dir):
    """Epochs-per-source mixing: src0 ×2.5, src1 ×1, src2 ×0.25 — fractional
    repeats decided by a deterministic id hash; other sources dropped."""
    from artigraph_spark.operators.packing import upsample_domains

    d = load(spark, sf_dir, "documents")
    return upsample_domains(
        d, "source", {"src0": 2.5, "src1": 1.0, "src2": 0.25}, F.col("doc_id")
    ).select("doc_id", "source", "copy_idx")


@query(
    "unigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    freqs AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM freqs)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round({oracle_davg("round(ln(CAST(total AS DOUBLE) / CAST(c AS DOUBLE)), 9)")}, 6) AS nll_r
    FROM toks JOIN freqs USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def unigram_logprob_q(spark, sf_dir):
    """Perplexity-proxy quality score: mean unigram NLL of each document
    under the corpus's own unigram distribution."""
    from artigraph_spark.operators.text import unigram_logprob_scores

    d = load(spark, sf_dir, "documents")
    out = unigram_logprob_scores(d, "doc_id", "text")
    return out.select("doc_id", "n_tokens", F.round("nll", 6).alias("nll_r"))


@query(
    "quantize_embeddings",
    oracle="""
    WITH base AS (
        SELECT vec_id, embedding AS v, CAST(len(embedding) AS BIGINT) AS n_dims,
               CAST(list_min(embedding) AS DOUBLE) AS vmin,
               CAST(list_max(embedding) AS DOUBLE) AS vmax
        FROM embeddings WHERE len(embedding) > 0
    ),
    s AS (SELECT *, (vmax - vmin) / 255.0 AS scale FROM base),
    el AS (SELECT vec_id, n_dims, vmin, vmax, scale, CAST(u.x AS DOUBLE) AS xd
           FROM s, UNNEST(v) AS u(x)),
    codes AS (SELECT vec_id, n_dims, vmin, vmax, scale, xd,
                     CASE WHEN scale > 0
                          THEN floor((xd - vmin) / scale + 0.5) ELSE 0 END AS code
              FROM el),
    errs AS (SELECT vec_id, n_dims, vmin, vmax,
                    (xd - (vmin + code * scale)) AS err FROM codes),
    fx AS (SELECT vec_id, n_dims, vmin, vmax,
                  CAST(floor(err * err * 1048576.0 + 0.5) AS BIGINT) AS fe FROM errs)
    SELECT vec_id, n_dims, round(vmin, 6) AS vmin_r, round(vmax, 6) AS vmax_r,
           round(CAST(SUM(fe) AS DOUBLE) / (n_dims * 1048576.0), 6) AS mse_r
    FROM fx GROUP BY vec_id, n_dims, vmin, vmax
    """,
)
def quantize_embeddings_q(spark, sf_dir):
    """int8 per-vector min/max quantization of the embedding corpus with
    reconstruction MSE — the ANN storage-compression quality audit."""
    from artigraph_spark.operators.similarity import quantize_embeddings

    e = load(spark, sf_dir, "embeddings")
    out = quantize_embeddings(e, "vec_id", "embedding", bits=8)
    return out.select(
        "vec_id",
        "n_dims",
        F.round("vmin", 6).alias("vmin_r"),
        F.round("vmax", 6).alias("vmax_r"),
        F.round("mse", 6).alias("mse_r"),
    )


@query(
    "redact_pii",
    oracle=r"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or +1 (555) 010-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' at 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                   AS t
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
               '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def redact_pii_q(spark, sf_dir):
    """PII scrub over documents augmented with deterministic synthetic
    PII (email + phone + IPv4 derived from doc_id) so the redaction is
    actually exercised, not a no-op pass-through."""
    from artigraph_spark.operators.text import redact_pii

    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    return d.select(F.col("doc_id"), redact_pii(aug).alias("redacted"))


@query(
    "split_corpus",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN ((((doc_id % 1000000007) * 2654435761) % 1000000007) % 10000) < 9800
                THEN 'train'
                WHEN ((((doc_id % 1000000007) * 2654435761) % 1000000007) % 10000) < 9900
                THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_corpus_q(spark, sf_dir):
    """Deterministic 98/1/1 train/valid/test assignment keyed by doc id —
    disjoint, exhaustive, engine- and partitioning-independent."""
    from artigraph_spark.operators.packing import split_corpus

    d = load(spark, sf_dir, "documents")
    return split_corpus(d, F.col("doc_id")).select("doc_id", "source", "split")


@query(
    "collocation_pmi",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    uni AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
    nuni AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
    bg AS (SELECT t[i] AS w1, t[i+1] AS w2
           FROM toks, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2),
    bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bc FROM bg GROUP BY w1, w2),
    nbig AS (SELECT CAST(sum(bc) AS BIGINT) AS n FROM bgc)
    SELECT bgc.w1, bgc.w2, bc AS pair_count,
           round(ln((CAST(bc AS DOUBLE) / nbig.n) /
                    ((CAST(u1.c AS DOUBLE) / nuni.n) *
                     (CAST(u2.c AS DOUBLE) / nuni.n))), 6) AS pmi_r
    FROM bgc JOIN uni u1 ON u1.w = bgc.w1 JOIN uni u2 ON u2.w = bgc.w2, nuni, nbig
    WHERE bc >= 5
    ORDER BY pmi_r DESC, bgc.w1 ASC, bgc.w2 ASC
    LIMIT 200
    """,
)
def collocation_pmi_q(spark, sf_dir):
    """Top-200 adjacent-word collocations by pointwise mutual information
    (pairs seen >= 5 times) — phrase mining for tokenizer-vocabulary
    curation."""
    from artigraph_spark.operators.text import collocation_pmi

    d = load(spark, sf_dir, "documents")
    return collocation_pmi(d, "text", min_count=5, top_k=200)


@query(
    "stratified_split_exact",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007,
                            doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rn <= (800000 * n + 999999) // 1000000 THEN 'train'
                WHEN rn <= (900000 * n + 999999) // 1000000 THEN 'valid'
                ELSE 'test' END AS split
    FROM ranked
    """,
)
def stratified_split_exact_q(spark, sf_dir):
    """Exact-count 80/10/10 stratified split by language: every stratum
    gets exactly ceil(0.8·n)/ceil(0.9·n)-bounded label counts, membership
    decided by the deterministic multiplicative hash (engine- and
    partitioning-independent, oracle-replayed). The exactness companion to
    the shuffle-free hash split `split_corpus` — see
    ``operators.packing.stratified_split_exact`` for the scale tradeoff."""
    from artigraph_spark.operators.packing import stratified_split_exact

    d = load(spark, sf_dir, "documents")
    return stratified_split_exact(d, "lang", F.col("doc_id")).select(
        "doc_id", "lang", "split"
    )


@query(
    "epoch_shuffle_shards",
    oracle="""
    WITH mixed AS (
        SELECT doc_id,
               ((((doc_id + CAST(3 AS BIGINT) * 2147483629) % 1000000007) * 2654435761)
                % 1000000007) AS m
        FROM documents
    )
    SELECT doc_id, m % 8 AS shard,
           ROW_NUMBER() OVER (PARTITION BY m % 8 ORDER BY m, doc_id) AS pos
    FROM mixed
    """,
)
def epoch_shuffle_shards(spark, sf_dir):
    """Deterministic epoch-3 training shuffle of the corpus into 8 shards:
    every document gets a (shard, pos) from a multiplicative hash of
    doc_id⊕epoch — a full pseudorandom permutation with no RNG state, so
    the epoch replays identically on any engine/partitioning (resumable
    mid-epoch). Shard assignment is shuffle-free; positions cost one
    shard-keyed exchange. See ``operators.packing.epoch_shuffle``."""
    from artigraph_spark.operators.packing import epoch_shuffle

    d = load(spark, sf_dir, "documents")
    return epoch_shuffle(d, F.col("doc_id"), n_shards=8, epoch=3).select(
        "doc_id", "shard", "pos"
    )


@query(
    "curriculum_stages_docs",
    oracle="""
    SELECT doc_id, lang, n_chars,
           ntile(3) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS stage
    FROM documents WHERE n_chars IS NOT NULL
    """,
)
def curriculum_stages_docs(spark, sf_dir):
    """Curriculum assignment: each language's documents cut into 3
    equal-frequency difficulty stages by length (ties on doc_id — total
    order, so stage membership is engine-deterministic) — the
    easy-to-hard training-order primitive, per-stratum so no language
    monopolises the late stages. NULL lengths are excluded: Spark windows
    sort NULLS FIRST, DuckDB NULLS LAST, so an unfiltered NULL would land
    in opposite stages. See ``operators.packing.curriculum_stages``."""
    from artigraph_spark.operators.packing import curriculum_stages

    d = load(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    out = curriculum_stages(
        d,
        F.col("n_chars").cast("double"),
        "doc_id",
        stratum_col="lang",
        n_stages=3,
    )
    return out.select("doc_id", "lang", "n_chars", "stage")


@query(
    "negative_samples_orders",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS it
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), users AS (
        SELECT DISTINCT u FROM pos
    ), ni AS (
        SELECT max(p_partkey) AS n FROM part
    ), cand AS (
        SELECT u, j,
               1 + ((((u % 1000000007) * 131 + j * 40503) % 1000000007)
                    * 2654435761 % 1000000007) % n AS it
        FROM users
        CROSS JOIN (SELECT unnest(generate_series(1, 15)) AS j) js
        CROSS JOIN ni
    ), surv AS (
        SELECT c.u, c.it, min(c.j) AS j
        FROM cand c
        WHERE NOT EXISTS (
            SELECT 1 FROM pos WHERE pos.u = c.u AND pos.it = c.it
        )
        GROUP BY c.u, c.it
    ), ranked AS (
        SELECT u, it, row_number() OVER (PARTITION BY u ORDER BY j) AS rk
        FROM surv
    )
    SELECT u AS o_custkey, it AS neg_item, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def negative_samples_orders(spark, sf_dir):
    """Up to 5 deterministic hash-drawn negative parts per customer (items
    the customer never ordered) — the contrastive-training companion to
    the positive (customer, part) pairs; no RNG state, replays
    identically at any partitioning (salt swaps the draw per epoch). See
    ``operators.packing.negative_samples``."""
    from artigraph_spark.operators.packing import negative_samples

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey"), F.col("l_partkey").alias("item")
    )
    # Lazy one-row max — no collect at plan-build time (the oracle's
    # scalar subquery is the same shape).
    n_items = load(spark, sf_dir, "part").agg(F.max("p_partkey").alias("__n"))
    return negative_samples(pos, "o_custkey", "item", k=5, n_items=n_items)


@query(
    "kfold_assign_docs",
    oracle="""
    SELECT doc_id, lang,
           CAST((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 5
                AS BIGINT) AS fold
    FROM documents
    """,
)
def kfold_assign_docs(spark, sf_dir):
    """Exact stratified 5-fold assignment over documents by language:
    round-robin within each lang ordered by doc_id, so fold sizes differ
    by at most 1 in EVERY stratum (hash splits can starve small strata of
    whole folds). See ``operators.packing.kfold_assign``."""
    from artigraph_spark.operators.packing import kfold_assign

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return kfold_assign(d, "lang", "doc_id", n_folds=5)
