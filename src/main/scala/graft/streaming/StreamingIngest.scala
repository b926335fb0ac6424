package graft.streaming

import graft.catalog.KuduLikeCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming ingest (SURVEY.md §2.9).
  *
  * The reference has no streaming surface; Kudu's role there is the mutable
  * serving store for fast-changing data. The idiomatic Spark re-expression is
  * Structured Streaming: watermarked event-time windows for aggregation, and
  * `foreachBatch` feeding the keyed table's duplicate-ignoring insert
  * (reference semantics: HiveKuduTableOutputFormat.java:98-101) so replayed /
  * duplicate events cannot double-insert — exactly-once-per-key materialized
  * state without a transactional sink.
  *
  * Scale design: the windowed aggregation state is bounded by the watermark
  * horizon × key cardinality and lives in the state store (RocksDB on a real
  * cluster); the foreachBatch insert reuses the catalog's key-partitioned
  * anti-join, so each micro-batch costs one shuffle of the batch, not of the
  * table.
  */
object StreamingIngest {

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Stream → keyed table with dup-ignore semantics via foreachBatch.
    * Each micro-batch is inserted through [[KuduLikeCatalog.insert]]; rows
    * whose key already landed (including replays of earlier batches) are
    * silently dropped, mirroring the reference's insert sink.
    */
  def ingestInto(
      stream: DataFrame,
      catalog: KuduLikeCatalog,
      table: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        catalog.insert(table, batch): Unit
      }
      .trigger(Trigger.AvailableNow())

  def runToCompletion(w: DataStreamWriter[Row]): Unit = {
    val q: StreamingQuery = w.start()
    q.awaitTermination()
  }
}
