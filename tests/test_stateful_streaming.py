"""Stateful streaming: per-group HLL distinct counts over a rate
stream via applyInPandasWithState, plus a watermarked windowed agg."""

import time

import pyspark.sql.functions as F


def test_stateful_hll_distinct_stream(spark, tmp_path):
    from libfilter_spark.streaming.stateful import stream_distinct_counts
    from libfilter_spark.spark.keys import with_content_key_bin

    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", "3000").load()
              .withColumn("grp", (F.col("value") % 3).cast("long"))
              .withColumn("content", F.col("value").cast("string")))
    keyed = with_content_key_bin(stream, "content").select("grp", "key")
    writer = stream_distinct_counts(keyed, "grp", "key", p=12)
    q = (writer.format("memory").queryName("hll_stream").start())
    try:
        deadline = time.time() + 90
        ok = False
        while time.time() < deadline:
            rows = spark.sql(
                "select grp, max(n_rows) n, max(distinct_estimate) est "
                "from hll_stream group by grp").collect()
            if len(rows) == 3 and all(r["n"] >= 2000 for r in rows):
                # rate values are unique → distinct ≈ n_rows per group
                for r in rows:
                    err = abs(r["est"] - r["n"]) / r["n"]
                    assert err < 0.1, (r, err)
                ok = True
                break
            time.sleep(2)
    finally:
        q.stop()
    assert ok, "stream never reached 2000 rows per group"


def test_watermarked_windowed_counts(spark, tmp_path):
    """Watermark + tumbling-window agg (late-data handling shape)."""
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", "2000").load())
    windowed = (stream
                .withWatermark("timestamp", "5 seconds")
                .groupBy(F.window("timestamp", "2 seconds"),
                         (F.col("value") % 2).alias("par"))
                .agg(F.count(F.lit(1)).alias("n")))
    q = (windowed.writeStream.outputMode("append")
         .format("memory").queryName("win_stream").start())
    try:
        deadline = time.time() + 90
        total = 0
        while time.time() < deadline:
            rows = spark.sql("select * from win_stream").collect()
            total = sum(r["n"] for r in rows)
            # appended (finalized) windows only appear past the watermark
            if len(rows) >= 4 and total >= 4000:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert total >= 4000
