"""Side-by-side migration guide: Alrash/DataFramework → this engine.

Every step shows the reference call (left, cited into
``/root/reference/DFW/``) and its equivalent here.  Runnable as-is:

    python examples/reference_migration.py

The key semantic upgrades (documented in SURVEY.md §1.4/§7):

* databases are parquet tables, not ``.mat`` files — columnar scans with
  projection/filter pushdown replace whole-file ``scipy.io.loadmat``;
* class labels are an explicit column, not the array index;
* permutation replications are seeded md5-prefix hash orderings
  (portable across engines), not stored ``r`` matrices — replication
  ``no`` folds into the seed;
* everything below is LAZY until an action; ``pp.train = ...`` re-plans
  for free (the reference recomputes index arrays eagerly,
  ``preprocess.py:244-267``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframework_spark.facade import ParamGrid, PreProcessEngine
from dataframework_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="reference-migration-demo", cpus=4)

    # ------------------------------------------------------------------
    # reference:  pp = PreProcessTransfer({'database': {...}, 'process': {...}})
    #             (preprocess.py:24-42 — load .mat files eagerly, plan splits)
    # here:       same two-part config, same broadcast semantics
    #             (scalar / positional list / dict-with-'default'), but the
    #             scans are lazy parquet DataFrames.
    # ------------------------------------------------------------------
    pp = PreProcessEngine(
        spark,
        {
            "database": {"name": "embeddings", "root": SF_DIR},
            "process": {"cv": 5, "train": 0.7, "extend": True, "center": True},
        },
    )

    # reference:  x['x'].shape[-1]  (class count, preprocess.py:120,280-281)
    print("class_num:", pp.class_num("embeddings"))

    # ------------------------------------------------------------------
    # reference:  train, train_y, test, test_y = pp.generator(0.7, 'db', no=0)
    #             (preprocess.py:44-89 — permute, extend, split, center)
    # here:       one lazy plan; labels are already columns, so the
    #             (X, y) pair is one DataFrame per side.
    # ------------------------------------------------------------------
    train, test = pp.generator(train_setting=0.7, database="embeddings", no=0)
    print("train/test rows:", train.count(), test.count())

    # reference:  cv_train, cv_test = pp.get_cv_data(cv=2)  (preprocess.py:91-96)
    cv_train, cv_test = pp.get_cv_data(fold=2)
    print("fold 2 train/test rows:", cv_train.count(), cv_test.count())

    # reference:  pp.train = 10  → re-plans all split indices eagerly
    #             (preprocess.py:292-298)
    # here:       plans are lazy; the setter just records the new rule
    #             (int rule: min(10, n) per class, preprocess.py:162-173).
    pp.train = 10
    train10, _ = pp.generator(database="embeddings", no=1)  # replication no=1
    print("train rows with train=10:", train10.count())

    # ------------------------------------------------------------------
    # reference:  lmd = Lambda({'lr': [...], 'reg': [...]}) → kron matrix
    #             (preprocess.py:482-517)
    # here:       ParamGrid — same Cartesian product, same kron row order.
    # ------------------------------------------------------------------
    grid = ParamGrid(spark, {"lr": [0.1, 0.01, 0.001], "reg": [1, 10]})
    print("grid size:", len(grid), "row(3):", grid.row(3))

    spark.stop()


if __name__ == "__main__":
    main()
