"""Streaming-specific behavior tests (beyond the oracle hash checks).

The oracle proves final results; these prove the *streaming* properties:
state genuinely accumulates across microbatches, and the update stream
contains multiple emissions per key when input arrives in multiple
triggers.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from dataframework_spark.streaming import (
    _N_SPLIT_FILES,
    _STATE_SCHEMA,
    _USER_TOTALS_SCHEMA,
    _run_to_table,
    _split_events_stream,
    _user_totals,
)


def test_stateful_updates_span_multiple_microbatches(spark, sf_dir):
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = _split_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    totals = ev.groupBy("user_id").applyInPandasWithState(
        _user_totals,
        outputStructType=_USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    updates = _run_to_table(totals, spark, mode="update")
    n_users = updates.select("user_id").distinct().count()
    n_updates = updates.count()
    # one file per trigger ⇒ most users are updated several times; if state
    # or triggering collapsed to one batch, n_updates == n_users
    assert n_updates > n_users, (n_updates, n_users)
    # per-user update counts are bounded by the number of microbatches
    per_user_max = updates.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    assert per_user_max <= _N_SPLIT_FILES
    # running counts are strictly increasing per user (real accumulation,
    # not per-batch resets): the max update equals the user's total events
    final = updates.groupBy("user_id").agg(F.max("n_events").alias("n"))
    from dataframework_spark.catalog import load_table

    batch = load_table(spark, sf_dir, "events").groupBy("user_id").count()
    diff = final.join(batch, "user_id").where(F.col("n") != F.col("count")).count()
    assert diff == 0
