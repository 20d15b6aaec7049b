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


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark must DROP events that
    arrive after the watermark has passed their window — the state-bounding
    contract.  Batch 1 advances event time to 12:00 (watermark 11:50 after
    the 10-min delay); batch 2 replays an event at 10:00 — its window
    [10:00, 10:05) is long finalized, so it must not change the result."""
    import pandas as pd

    b1 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 12:00"]), "v": [1.0, 2.0]})
    b2 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 10:00"]), "v": [100.0]})  # LATE
    d = tmp_path / "late_events"
    d.mkdir()
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(str(d))

    sdf = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .select(F.col("window.start").alias("w"), "n", "s")
    )
    q = (
        agg.writeStream.format("memory").queryName("late_test")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark advances past 10:05
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(str(d))
        q.processAllAvailable()  # batch 2: the late event must be dropped
    finally:
        q.stop()
        q.awaitTermination()
    rows = {r.w.strftime("%H:%M"): (r.n, r.s) for r in spark.table("late_test").collect()}
    # the 10:00 window was emitted once the watermark passed it, WITHOUT
    # the late replay (n=1, s=1.0); the 12:00 window stays open (absent)
    assert rows.get("10:00") == (1, 1.0), rows
    assert "12:00" not in rows
