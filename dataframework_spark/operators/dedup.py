"""Deduplication operators: exact + near-dup families (SURVEY.md §2.10).

No reference counterpart (Alrash/DataFramework has no string data at all —
SURVEY.md §2.9); these are the dedup primitives of a pretraining-data
pipeline, each expressed as declarative DataFrame plans with DuckDB oracle
twins.

Scale design (the part that must survive 100 TB):

* **Exact dedup** is a hash-groupBy on a 16-byte digest — the shuffle
  carries (digest, doc_id), never the text.
* **N-gram Jaccard** uses an *inverted-index join* (explode shingles →
  self-join on shingle → count per pair), NOT an O(n²) cross join.  The
  shuffle key is the shingle; frequency-capping drops degenerate shingles
  that would create quadratic hot keys (classic skew control).
* **MinHash+LSH** banding makes candidate generation O(n · bands): docs
  collide only when a band signature matches.  Verification runs only on
  candidates.  The token dictionary (global ``row_number``) exists so the
  DuckDB oracle can replay the exact permutations; the cluster-scale
  variant would hash shingles directly with ``xxhash64`` and skip the
  dictionary entirely (noted per-op).
* **SimHash** reduces each doc to one 16-bit signature (groupBy doc) and
  buckets on signature equality.
* **Embedding near-dup** is brute-force pairwise here (correctness
  baseline); the LSH-bucketed scale path is ``sim_lsh_topk`` in
  ``similarity.py``.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataframework_spark.catalog import load_table
from dataframework_spark.functions.arrays import (
    DUCK_TOKENS_SQL,
    TOKENS_SQL,
    as_double,
    cosine_sql,
    duck_cosine_sql,
    duck_shingles_sql,
    shingles_sql,
    tokens,
)
from dataframework_spark.registry import register

# ---------------------------------------------------------------------------
# D1 — exact dedup (hash groupBy on normalized text)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=r"""
    WITH h AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      FROM documents)
    SELECT fp,
           COUNT(*)    AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM h GROUP BY fp HAVING COUNT(*) >= 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via md5 of whitespace/case-normalized text.

    The shuffle carries only (16-byte digest, doc_id); keeper = min doc_id
    per cluster.  This is the canonical first pass at any scale — at
    100 TB it is one scan + one digest-keyed exchange."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return (
        docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


# ---------------------------------------------------------------------------
# D2 — n-gram Jaccard near-dup via inverted-index join
# ---------------------------------------------------------------------------

_JACCARD_THRESHOLD = 0.8  # the synthetic corpus plants 25 pairs at ≥ 0.9


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id, {duck_shingles_sql('toks')} AS sh FROM t),
    sz AS (SELECT doc_id, len(sh) AS n FROM s),
    inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    pair AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT p.doc_a, p.doc_b,
           ROUND(p.inter::DOUBLE / (sa.n + sb.n - p.inter), 4) AS jaccard
    FROM pair p
    JOIN sz sa ON sa.doc_id = p.doc_a
    JOIN sz sb ON sb.doc_id = p.doc_b
    WHERE p.inter::DOUBLE / (sa.n + sb.n - p.inter) >= {_JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram shingle Jaccard ≥ 0.8, via inverted index.

    explode(shingles) → self-join on shingle → per-pair intersection count
    → join tiny per-doc sizes → Jaccard.  Never materializes the O(n²)
    pair space: only docs sharing ≥ 1 shingle meet.  At 100 TB the skew
    control is a shingle-frequency cap (drop shingles appearing in > X
    docs — they carry no dedup signal and create hot keys); at this
    corpus' vocabulary every shingle is informative, so no cap is applied
    and the oracle stays exact."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    s = docs.withColumn("toks", tokens()).select(
        "doc_id", F.expr(shingles_sql("toks")).alias("sh")
    )
    sizes = s.select("doc_id", F.size("sh").alias("n"))
    inv = s.select("doc_id", F.explode("sh").alias("shingle"))
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("inter") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# D3 — MinHash + LSH banding
# ---------------------------------------------------------------------------

# 16 universal-hash permutations h_i(x) = (a_i·x + b_i) mod P, banded 4×4.
# Fixed seed ⇒ identical constants are baked into the Spark plan AND the
# oracle SQL, so both engines compute bit-identical signatures.
_MH_P = 2_147_483_647
_MH_K = 16
_MH_BANDS = 4
_MH_ROWS = _MH_K // _MH_BANDS
_rng = random.Random(42)
_MH_PARAMS = [(_rng.randrange(1, _MH_P), _rng.randrange(0, _MH_P)) for _ in range(_MH_K)]


def _mh_exprs_spark() -> list[str]:
    return [
        f"min(pmod({a} * cast(tid as bigint) + {b}, {_MH_P})) as h{i}"
        for i, (a, b) in enumerate(_MH_PARAMS)
    ]


def _mh_exprs_duck() -> str:
    return ",\n      ".join(
        f"min(({a} * tid::BIGINT + {b}) % {_MH_P}) AS h{i}"
        for i, (a, b) in enumerate(_MH_PARAMS)
    )


def _band_cols() -> list[str]:
    return [
        "concat_ws(',', " + ", ".join(f"h{band * _MH_ROWS + r}" for r in range(_MH_ROWS)) + ")"
        for band in range(_MH_BANDS)
    ]


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id, {duck_shingles_sql('toks')} AS sh FROM t),
    sz AS (SELECT doc_id, len(sh) AS n FROM s),
    feat AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    dict AS (SELECT shingle, row_number() OVER (ORDER BY shingle) AS tid
             FROM (SELECT DISTINCT shingle FROM feat)),
    ft AS (SELECT f.doc_id, d.tid FROM feat f JOIN dict d USING (shingle)),
    sig AS (SELECT doc_id, {_mh_exprs_duck()} FROM ft GROUP BY doc_id),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {band} AS bk, {i} AS band FROM sig" for i, band in enumerate(_band_cols()))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
    ver AS (
      SELECT c.doc_a, c.doc_b, len(list_intersect(sa.sh, sb.sh)) AS inter,
             sza.n + szb.n AS tot
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a JOIN s sb ON sb.doc_id = c.doc_b
      JOIN sz sza ON sza.doc_id = c.doc_a JOIN sz szb ON szb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, ROUND(inter::DOUBLE / (tot - inter), 4) AS jaccard
    FROM ver WHERE inter::DOUBLE / (tot - inter) >= {_JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 perms) + LSH banding (4 bands × 4 rows) near-dedup.

    Candidate generation is O(docs × bands) — docs meet only on equal band
    signatures — then exact Jaccard verifies candidates.  At Jaccard 0.9
    the banding catches a pair with p ≈ 0.986; both engines compute the
    same signatures, so the oracle is still exact.

    The shingle dictionary (global ``row_number`` over distinct shingles)
    exists purely for cross-engine replay; the 100 TB variant replaces it
    with ``xxhash64(shingle)`` — no global sort, same banding math."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    s = docs.withColumn("toks", tokens()).select(
        "doc_id", F.expr(shingles_sql("toks")).alias("sh")
    )
    s.cache()  # reused for candidates AND verification
    feat = s.select("doc_id", F.explode("sh").alias("shingle"))
    dict_df = (
        feat.select("shingle")
        .distinct()
        .withColumn("tid", F.row_number().over(Window.orderBy("shingle")))
    )
    ft = feat.join(dict_df, "shingle").select("doc_id", "tid")
    sig = ft.groupBy("doc_id").agg(*[F.expr(e) for e in _mh_exprs_spark()])
    bands = None
    for i, band in enumerate(_band_cols()):
        piece = sig.select("doc_id", F.expr(band).alias("bk"), F.lit(i).alias("band"))
        bands = piece if bands is None else bands.unionByName(piece)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    ver = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("tot", F.size("sh_a") + F.size("sh_b"))
    )
    jac = F.col("inter") / (F.col("tot") - F.col("inter"))
    return ver.where(jac >= _JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# D4 — SimHash (16-bit) signature buckets
# ---------------------------------------------------------------------------

_SH_BITS = 16
_SH_MUL = 2_654_435_761
_SH_ADD = 104_729
_SH_MOD = 4_294_967_296  # 2^32


@register(
    "dedup_simhash",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS_SQL} AS toks FROM documents),
    feat AS (SELECT doc_id, unnest(toks) AS token FROM t),
    dict AS (SELECT token, row_number() OVER (ORDER BY token) AS tid
             FROM (SELECT DISTINCT token FROM feat)),
    ft AS (SELECT f.doc_id, ({_SH_MUL}::BIGINT * d.tid + {_SH_ADD}) % {_SH_MOD} AS g
           FROM feat f JOIN dict d USING (token)),
    sig AS (
      SELECT doc_id,
        {" + ".join(f"(CASE WHEN SUM(CASE WHEN (g >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END) * {1 << j}" for j in range(_SH_BITS))}
        AS simhash
      FROM ft GROUP BY doc_id)
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id
    FROM sig GROUP BY simhash HAVING COUNT(*) > 1
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over token multisets; buckets with > 1 doc are dup
    candidates (equal-signature LSH).

    Each doc reduces to one small integer — the groupBy(doc) shuffle
    carries (doc_id, token-hash) and the bucket join is on a 2-byte key.
    Token weights are multiset counts (duplicated tokens count), which is
    what makes shuffled near-copies collide.  Dictionary note as in
    ``dedup_minhash_lsh``: cluster-scale uses ``xxhash64(token)``."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    feat = docs.select("doc_id", F.explode(tokens()).alias("token"))
    dict_df = (
        feat.select("token")
        .distinct()
        .withColumn("tid", F.row_number().over(Window.orderBy("token")))
    )
    ft = feat.join(dict_df, "token").select(
        "doc_id",
        F.expr(f"pmod({_SH_MUL}L * tid + {_SH_ADD}, {_SH_MOD})").alias("g"),
    )
    bit_sum = [
        F.sum(F.when(F.expr(f"(g >> {j}) & 1 = 1"), 1).otherwise(-1)).alias(f"s{j}")
        for j in range(_SH_BITS)
    ]
    sig = ft.groupBy("doc_id").agg(*bit_sum)
    simhash = None
    for j in range(_SH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return (
        sig.select("doc_id", simhash.alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# D5 — embedding-cosine near-dup (brute-force correctness baseline)
# ---------------------------------------------------------------------------

_COS_THRESHOLD = 0.4  # calibrated: synthetic embeddings max-cos ≈ 0.51


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({duck_cosine_sql('a.embedding', 'b.embedding')}, 4) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {duck_cosine_sql('a.embedding', 'b.embedding')} >= {_COS_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: pairwise cosine ≥ 0.4 (threshold
    calibrated to the synthetic corpus, which has no true vector dups).

    Brute-force O(n²) pair generation — the *correctness baseline*; the
    scale path is LSH bucketing (``sim_lsh_topk``), which prunes the pair
    space before the exact cosine.  Math is double-precision expression-
    only (zip_with/aggregate), fully inside codegen."""
    e = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]).select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = F.expr(cosine_sql("va", "vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(cos >= _COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cos_sim"))
    )
