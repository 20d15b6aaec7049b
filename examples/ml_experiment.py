"""The reference's END USE, completed on Spark: a CV grid-search experiment.

Alrash/DataFramework exists to feed ML experiments — its README workflow
is load → split/fold → center → iterate a hyperparameter grid
(``/root/reference/DFW/preprocess.py:44-96,482-517``), with the actual
training left to the user's NumPy code.  This example closes that loop
the Spark-native way: the facade's split/fold/grid plans drive
``pyspark.ml`` LogisticRegression, so a reference user sees their whole
experiment — not just the prep — on the engine.

Runnable as-is (about a minute on local[4]):

    python examples/ml_experiment.py

Expected output: cv/test accuracy ≈ 0.08–0.13 against a 0.10 random
baseline for 10 classes — the synthetic embeddings are near-isotropic
noise with little label signal (see the flat-spectrum note in
``tests/test_properties.py``), so the interesting part is the machinery,
not the score.

Scale notes: each fold's train slice is a lazy filter on ONE planned
DataFrame (no data copies, unlike the reference's per-fold index
slicing); the grid is iterated on the driver because the grid is small by
construction — the DATA never leaves executors.  At cluster scale the
same loop parallelizes across folds/params with Spark ML's
``CrossValidator(parallelism=...)``; this script keeps the explicit loop
so the correspondence to the reference's ``get_cv_data`` workflow stays
readable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from dataframework_spark.facade import ParamGrid, PreProcessEngine
from dataframework_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
CV = 3


def main() -> None:
    spark = get_spark(app_name="ml-experiment-demo", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    # reference: PreProcessTransfer(config) → generator() → per-fold slices
    pp = PreProcessEngine(
        spark,
        {
            "database": {"name": "embeddings", "root": SF_DIR},
            "process": {"cv": CV, "train": 0.7, "extend": False, "center": False},
        },
    )
    train_df, test_df = pp.generator(train_setting=0.7, database="embeddings", no=0)
    prep = lambda df: df.select(  # noqa: E731
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        "fold",
    )
    train_df, test_df = prep(train_df).cache(), prep(test_df).cache()

    # reference: Lambda({'lambda': [...], ...}) grid (preprocess.py:482-517)
    grid = ParamGrid(spark, {"regParam": [0.01, 0.1], "elasticNetParam": [0.0, 0.5]})
    evaluator = MulticlassClassificationEvaluator(metricName="accuracy")

    best = None
    for row in grid.df.collect():  # the grid is small by construction
        accs = []
        for fold in range(CV):
            cv_train = train_df.where(F.col("fold") != fold)
            cv_val = train_df.where(F.col("fold") == fold)
            model = LogisticRegression(
                maxIter=30, regParam=row["regParam"], elasticNetParam=row["elasticNetParam"]
            ).fit(cv_train)
            accs.append(evaluator.evaluate(model.transform(cv_val)))
        mean_acc = sum(accs) / len(accs)
        print(
            f"regParam={row['regParam']:<5} elasticNet={row['elasticNetParam']:<4} "
            f"cv-accuracy={mean_acc:.4f}"
        )
        if best is None or mean_acc > best[0]:
            best = (mean_acc, row)

    _, row = best
    final = LogisticRegression(
        maxIter=30, regParam=row["regParam"], elasticNetParam=row["elasticNetParam"]
    ).fit(train_df)
    test_acc = evaluator.evaluate(final.transform(test_df))
    print(
        f"best: regParam={row['regParam']} elasticNet={row['elasticNetParam']} "
        f"→ held-out test accuracy {test_acc:.4f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
