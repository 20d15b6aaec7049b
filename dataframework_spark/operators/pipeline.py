"""Capstone: the full pretraining-corpus pipeline as ONE composed query.

Everything the §2.10 operators do individually, chained the way a real
training-data build chains them:

    quality filter → exact dedup → near-dup cluster resolution →
    keeper selection → token accounting

The point of this module is *composition*: each stage is the same library
logic the standalone queries use, fused into one lazy plan (plus the
iterative clustering step), and the DuckDB oracle replays the entire
pipeline in a single SQL statement — so the hash check covers stage
*interactions* (e.g. dedup only among quality-passing docs), not just
stages in isolation.

Scale shape: quality scoring and fingerprints are narrow; exact dedup is
one digest shuffle; the near-dup stage is the prefix-filtered index from
``dedup.py``; final accounting is a partial-agg rollup.  Nothing here
adds a shuffle beyond what the stages themselves need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataframework_spark.catalog import load_table
from dataframework_spark.functions.arrays import DUCK_TOKENS_SQL, tokens
from dataframework_spark.operators.dedup import _PAIRS_SQL_CTE, dedup_clusters
from dataframework_spark.operators.text import _SW_ARRAY, _SW_DUCK
from dataframework_spark.registry import register

_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "pipeline_pretrain_corpus",
    oracle=f"""
    WITH RECURSIVE
    {_PAIRS_SQL_CTE},
    nodes AS (SELECT doc_a AS node FROM edges UNION SELECT doc_b FROM edges),
    reach(node, root) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT CASE WHEN r.node = e.doc_a THEN e.doc_b ELSE e.doc_a END, r.root
      FROM reach r JOIN edges e ON r.node IN (e.doc_a, e.doc_b)),
    comp AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node),
    scored AS (
      SELECT doc_id, lang, source, text, {DUCK_TOKENS_SQL} AS toks,
        CASE WHEN len({DUCK_TOKENS_SQL}) BETWEEN 30 AND 400 THEN 0.4 ELSE 0.0 END
        + CASE WHEN len(list_distinct({DUCK_TOKENS_SQL}))::DOUBLE
               / len({DUCK_TOKENS_SQL}) >= 0.3 THEN 0.3 ELSE 0.0 END
        + CASE WHEN len(list_filter({DUCK_TOKENS_SQL}, t -> t IN {_SW_DUCK}))::DOUBLE
               / len({DUCK_TOKENS_SQL}) BETWEEN 0.01 AND 0.5 THEN 0.3 ELSE 0.0 END AS q
      FROM documents),
    quality AS (SELECT * FROM scored WHERE q >= 0.7),
    exact_kept AS (
      SELECT * FROM quality
      QUALIFY row_number() OVER (
        PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
        ORDER BY doc_id) = 1),
    kept AS (
      SELECT k.* FROM exact_kept k
      LEFT JOIN comp c ON c.doc_id = k.doc_id
      WHERE c.doc_id IS NULL OR c.doc_id = c.cluster_id)
    SELECT lang, source,
           COUNT(*)                                                AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT)                          AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT) AS total_bpe_tokens
    FROM kept GROUP BY lang, source
    """,
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup → near-dup-cluster-keeper → token
    accounting, per (lang, source).

    Near-dup clustering runs over the WHOLE corpus (pairs don't care about
    quality), but keeper filtering applies to the quality-passing,
    exact-deduped survivors — the stage interaction the single-statement
    oracle pins down.  Docs in no cluster pass through; cluster members
    survive only as the cluster-min keeper."""
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
    quality = t.where(q >= 0.7)

    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    from pyspark.sql.window import Window

    w_fp = Window.partitionBy(fp).orderBy("doc_id")
    exact_kept = (
        quality.withColumn("_rn", F.row_number().over(w_fp)).where(F.col("_rn") == 1).drop("_rn")
    )

    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "is_keeper")
    kept = exact_kept.join(clusters, "doc_id", "left").where(
        F.col("is_keeper").isNull() | (F.col("is_keeper") == 1)
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("total_ws_tokens"),
        F.sum(F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)"))).alias(
            "total_bpe_tokens"
        ),
    )


@register(
    "pipeline_semantic_dedup",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
        (SELECT CASE WHEN len(t) BETWEEN 30 AND 400 THEN 0.4 ELSE 0.0 END
              + CASE WHEN len(list_distinct(t))::DOUBLE / len(t) >= 0.3 THEN 0.3 ELSE 0.0 END
              + CASE WHEN len(list_filter(t, x -> x IN {_SW_DUCK}))::DOUBLE / len(t)
                     BETWEEN 0.01 AND 0.5 THEN 0.3 ELSE 0.0 END
         FROM (SELECT {DUCK_TOKENS_SQL} AS t)) AS quality
      FROM documents),
    e AS (SELECT vec_id, embedding FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             ROUND(list_sum(list_transform(range(1, len(a.embedding) + 1),
                     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                   / (sqrt(list_sum(list_transform(a.embedding, v -> v::DOUBLE * v::DOUBLE)))
                    * sqrt(list_sum(list_transform(b.embedding, v -> v::DOUBLE * v::DOUBLE)))), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
                     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
            / (sqrt(list_sum(list_transform(a.embedding, v -> v::DOUBLE * v::DOUBLE)))
             * sqrt(list_sum(list_transform(b.embedding, v -> v::DOUBLE * v::DOUBLE)))) >= 0.4)
    SELECT p.doc_a, p.doc_b, p.cos_sim,
           CASE WHEN qa.quality > qb.quality THEN p.doc_a
                WHEN qb.quality > qa.quality THEN p.doc_b
                ELSE LEAST(p.doc_a, p.doc_b) END AS keeper_doc_id
    FROM pairs p
    JOIN q qa ON qa.doc_id = p.doc_a
    JOIN q qb ON qb.doc_id = p.doc_b
    """,
)
def pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal semantic dedup: embedding cosine decides *duplicate*
    (pairs ≥ 0.4 from the BLAS-blocked ``dedup_embedding_cosine``), text
    quality decides *keeper* (higher heuristic quality wins, ties to the
    lower doc_id) — the policy real corpus builds use, where the survivor
    of a near-dup pair should be the better-written copy, not an
    arbitrary id.

    Composition across BOTH modal tables (documents ⋈ embeddings on
    doc_id = vec_id): the pair table is near-dup-sized (tiny), so the two
    quality lookups are hash joins keyed by doc id against a narrow
    per-doc projection — the corpus text is scanned once, never
    shuffled.  Quality scores are identical IEEE sums of the same
    constants in both engines, so the keeper choice hash-matches
    exactly."""
    from dataframework_spark.operators.dedup import dedup_embedding_cosine

    pairs = dedup_embedding_cosine(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    t = docs.withColumn("toks", tokens())
    n = F.size("toks").cast("double")
    ttr = F.size(F.array_distinct("toks")) / n
    swr = F.expr(f"size(filter(toks, t -> array_contains({_SW_ARRAY}, t)))") / n
    q = t.select(
        "doc_id",
        (
            F.when(F.size("toks").between(30, 400), F.lit(0.4)).otherwise(0.0)
            + F.when(ttr >= 0.3, F.lit(0.3)).otherwise(0.0)
            + F.when(swr.between(0.01, 0.5), F.lit(0.3)).otherwise(0.0)
        ).alias("quality"),
    )
    qa = q.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("quality", "qa")
    qb = q.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("quality", "qb")
    keeper = (
        F.when(F.col("qa") > F.col("qb"), F.col("doc_a"))
        .when(F.col("qb") > F.col("qa"), F.col("doc_b"))
        .otherwise(F.least("doc_a", "doc_b"))
    )
    return (
        pairs.withColumnRenamed("vec_a", "doc_a")
        .withColumnRenamed("vec_b", "doc_b")
        .join(qa, "doc_a")
        .join(qb, "doc_b")
        .select("doc_a", "doc_b", "cos_sim", keeper.alias("keeper_doc_id"))
    )
