"""End-to-end pretraining-corpus preparation on the engine's operators.

The north-star use case (BASELINE.json): take a raw document corpus and
produce training-ready packed sequences, with every stage built from
operators this engine registers and oracle-checks.  Runnable as-is
(about a minute on local[4]):

    python examples/corpus_pipeline.py

Stage map (registered query in parentheses — each is independently
hash-verified against DuckDB by the driver gate):

1. quality filtering — per-doc token statistics (``text_token_stats``)
   gated with the same bands ``text_quality_score`` rolls up, plus the
   Gopher repetition signal (``text_repetition_stats``): drop docs with
   > 20% duplicated bigrams.
2. near dedup — MinHash/LSH pairs resolved to connected components;
   keep one doc per cluster (``dedup_clusters``'s ``is_keeper``).
3. pack accounting — greedy context-window packing per language
   (``text_pack_sequences``), reported for the surviving languages.

Scale notes: every stage is a narrow pass or a single keyed exchange
(see SCALE.md "Corpus prep"); stages compose lazily, so Catalyst sees ONE
plan per action and prunes the documents scan to the columns each branch
needs.  At 100 TB the same composition runs unchanged — the stage list is
the pipeline, not a scheduler.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataframework_spark.catalog import load_table
from dataframework_spark.operators.corpus import text_pack_sequences, text_repetition_stats
from dataframework_spark.operators.dedup import dedup_clusters
from dataframework_spark.operators.text import text_token_stats
from dataframework_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="corpus-pipeline-example", cpus=4)

    # 1. per-doc quality bands (length / diversity / stopwords) + repetition
    stats = text_token_stats(spark, SF_DIR)
    quality_ok = (
        F.col("n_tokens").between(30, 400)
        & (F.col("type_token_ratio") >= 0.3)
        & F.col("stopword_ratio").between(0.01, 0.5)
    )
    repetition = text_repetition_stats(spark, SF_DIR).select("doc_id", "dup_bigram_frac")
    gated = (
        stats.where(quality_ok)
        .join(repetition, "doc_id")
        .where(F.col("dup_bigram_frac") <= 0.2)
        .select("doc_id")
    )
    n_gated = gated.count()

    # 2. near-dup clusters → drop every clustered doc except its keeper
    #    (docs in no cluster have no near-dup and survive untouched)
    drops = dedup_clusters(spark, SF_DIR).where(F.col("is_keeper") == 0).select("doc_id")
    survivors = gated.join(drops, "doc_id", "left_anti")
    n_survivors = survivors.count()

    # 3. packing accounting for languages that still have surviving docs
    langs = (
        survivors.join(load_table(spark, SF_DIR, "documents", columns=["doc_id", "lang"]), "doc_id")
        .select("lang")
        .distinct()
    )
    packs = text_pack_sequences(spark, SF_DIR).join(langs, "lang", "left_semi")
    summary = packs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("pack_tokens").alias("tokens"),
        F.round(F.avg("fill_ratio"), 3).alias("avg_fill"),
    )

    print(f"quality+repetition gate: {n_gated} docs pass")
    print(f"after near-dup keeper policy: {n_survivors} docs")
    for row in summary.orderBy("lang").collect():
        print(f"  {row['lang']}: {row['n_packs']} packs, {row['tokens']} tokens, fill {row['avg_fill']}")
    spark.stop()


if __name__ == "__main__":
    main()
