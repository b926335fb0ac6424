package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import graft.streaming.{StreamingIngest, UserSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class StreamDoc(doc_id: Long, text: String)

/** Structured Streaming ingest (SURVEY.md §2.9): watermarked windowed aggs
  * equal their batch counterpart; foreachBatch insert keeps dup-ignore
  * semantics across replayed micro-batches.
  */
class StreamingSpec extends SparkSpec {

  private def fixtureEvents(): Seq[Ev] = {
    Tables.load(spark, sf, "events").limit(400)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
  }

  test("windowed aggregation over a stream equals the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents()
    val stream = MemoryStream[Ev]
    stream.addData(events)

    val agg = StreamingIngest.windowedCounts(stream.toDF(), "10 minutes", "5 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("win_out")
      .select("win_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = spark.createDataset(events).toDF()
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch range join across a batch cut") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents()
    val views = events.filter(_.event_type == "view")
    val buys = events.filter(_.event_type == "purchase")

    val vs = MemoryStream[Ev]
    val ps = MemoryStream[Ev]
    val joined = StreamingIngest.intervalJoinStreams(vs.toDF(), ps.toDF())
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    // split each side across two REAL micro-batches (processAllAvailable
    // between adds — data queued before the first trigger would land in one
    // batch): matches spanning the cut must come from the state store
    vs.addData(views.take(views.size / 2)); ps.addData(buys.take(buys.size / 2))
    q.processAllAvailable()
    vs.addData(views.drop(views.size / 2)); ps.addData(buys.drop(buys.size / 2))
    q.processAllAvailable(); q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))
    val streamed = spark.table("ssj_out").collect().map(key).toSeq.sorted
    val batch = spark.createDataset(views).toDF()
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .join(spark.createDataset(buys).toDF()
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"), col("value")),
        col("v_user") === col("b_user") && col("b_ts") > col("v_ts") &&
          col("b_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTE"))
      .select(col("v_user").as("user_id"), col("v_ts"), col("b_ts"))
      .collect().map(key).toSeq.sorted
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming decontamination equals the batch operator, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val evalDocs = docs.filter(col("doc_id") % 20 === 0)

    val trainRows = train.select("doc_id", "text").limit(200)
      .collect().map(r => StreamDoc(r.getLong(0), r.getString(1))).toSeq
    val stream = MemoryStream[StreamDoc]
    val cleaned = StreamingIngest.decontaminateStream(stream.toDF(), evalDocs, "text", n = 4)
    val q = cleaned.writeStream.outputMode("append")
      .format("memory").queryName("decon_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    // two REAL micro-batches (trigger between the adds): per-batch filtering
    // must not depend on where the batch cut falls
    stream.addData(trainRows.take(97))
    q.processAllAvailable()
    stream.addData(trainRows.drop(97))
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("decon_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val batchDf = spark.createDataset(trainRows).toDF()
    val batch = graft.operators.Dedup.decontaminate(batchDf, evalDocs, "text", "doc_id", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batch)
    assert(streamed.size < trainRows.size, "expected some contamination to be dropped")
  }

  test("sessionize: gap-based sessions match a hand computation, streaming == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: two sessions (gap 10s breaks at t=100s); user 2: one session
    val rows = Seq(
      (1L, 1000L, 1.0), (1L, 3000L, 2.0), (1L, 100000L, 5.0),
      (2L, 500L, 7.0), (2L, 9000L, 1.0))
    val gap = 10000L

    // batch path
    val batch = StreamingIngest.sessionize(
      spark, spark.createDataset(rows), gap).collect().sortBy(s => (s.user_id, s.start_ms))
    assert(batch.toSeq === Seq(
      UserSession(1L, 1000L, 3000L, 2, 3.0),
      UserSession(1L, 100000L, 100000L, 1, 5.0),
      UserSession(2L, 500L, 9000L, 2, 8.0)))

    // streaming path over a MemoryStream, all data in one batch
    val stream = MemoryStream[(Long, Long, Double)]
    stream.addData(rows)
    val q = StreamingIngest.sessionize(spark, stream.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_out").as[UserSession]
      .collect().sortBy(s => (s.user_id, s.start_ms))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("watermark drops events later than the horizon in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, minute: Int) = Ev(id,
      Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), 1L, "view", 1.0)
    val stream = MemoryStream[Ev]
    val agg = StreamingIngest.windowedCounts(stream.toDF(), "10 minutes", "5 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    // batch 1 advances event time to 10:40 → watermark 10:30
    stream.addData(Seq(ev(1, 0), ev(2, 2), ev(3, 40)))
    q.processAllAvailable()
    // batch 2: an event at 10:01 is far behind the watermark → dropped;
    // one at 10:41 is live
    stream.addData(Seq(ev(4, 1), ev(5, 41)))
    q.processAllAvailable()
    // batch 3 pushes the watermark past all open windows so they emit
    stream.addData(Seq(ev(6, 59)))
    q.processAllAvailable(); q.stop()
    val counts = spark.table("late_out")
      .select(col("win_start"), col("n")).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // the 10:00 window emitted with only the two on-time events — the late
    // ev(4, 10:01) was dropped by the watermark
    assert(counts("2024-01-01 10:00:00.0") === 2L)
    // both 10:40 and 10:41 landed in the 10:40 window
    assert(counts("2024-01-01 10:40:00.0") === 2L)
  }

  test("streaming dedup drops within-watermark duplicates with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, minute: Int) = Ev(id,
      Timestamp.valueOf(f"2024-01-01 11:$minute%02d:00"), 1L, "view", 1.0)
    val stream = MemoryStream[Ev]
    val deduped = StreamingIngest.dedupStream(stream.toDF(), Seq("event_id"), "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    stream.addData(Seq(ev(1, 0), ev(1, 1), ev(2, 2)))   // in-batch dup of id 1
    q.processAllAvailable()
    stream.addData(Seq(ev(2, 3), ev(3, 4)))             // cross-batch dup of id 2
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("foreachBatch ingest into keyed table ignores replayed duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents().take(100)
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_stream_"))
    val schema = spark.createDataset(events).toDF().schema
    cat.createTable(TableDef("events_k", schema, Seq("event_id")))

    val stream = MemoryStream[Ev]
    stream.addData(events)
    stream.addData(events.take(50)) // replay half — must be ignored
    StreamingIngest.runToCompletion(
      StreamingIngest.ingestInto(stream.toDF(), cat, "events_k"))

    assert(cat.table("events_k").count() === 100)
    // second full replay in a fresh stream: still no growth
    val stream2 = MemoryStream[Ev]
    stream2.addData(events)
    StreamingIngest.runToCompletion(
      StreamingIngest.ingestInto(stream2.toDF(), cat, "events_k"))
    assert(cat.table("events_k").count() === 100)
  }

  test("streaming graft sink: writeStream upserts per epoch, insert mode dup-ignores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft_sink_")
    val cat = new KuduLikeCatalog(spark, root)
    def df(rows: Seq[(Long, Double, String)]) = rows.toDF("id", "v", "tag")
    cat.createTable(TableDef("tk", df(Seq((0L, 0.0, "x"))).schema, Seq("id"), buckets = 2))

    // upsert (default): overlapping keys across epochs resolve last-wins;
    // the stream's column ORDER differs from the table's — by-name align
    val s1 = MemoryStream[(String, Long, Double)]
    val q1 = s1.toDF().toDF("tag", "id", "v")
      .writeStream.format("graft")
      .option("root", root).option("checkpointLocation", tmpDir("graft_sink_cp1_"))
      .trigger(Trigger.ProcessingTime(0)).start("tk")
    s1.addData((0L until 10L).map(i => ("a", i, i * 1.0)))
    q1.processAllAvailable()
    s1.addData((5L until 15L).map(i => ("b", i, i * -1.0)))
    q1.processAllAvailable(); q1.stop()
    val state = cat.table("tk").collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(state.size === 15)
    assert(state(3L) === (3.0, "a") && state(7L) === (-7.0, "b") && state(14L) === (-14.0, "b"))

    // operation=insert: replayed keys are silently dropped (dup-ignore)
    val s2 = MemoryStream[(String, Long, Double)]
    val q2 = s2.toDF().toDF("tag", "id", "v")
      .writeStream.format("graft").option("operation", "insert")
      .option("root", root).option("checkpointLocation", tmpDir("graft_sink_cp2_"))
      .trigger(Trigger.ProcessingTime(0)).start("tk")
    s2.addData(Seq(("ins", 3L, 999.0), ("ins", 100L, 100.0)))
    q2.processAllAvailable(); q2.stop()
    val after = cat.table("tk").collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(after(3L) === (3.0, "a"), "existing key must survive insert mode")
    assert(after(100L) === (100.0, "ins"))

    // a stream missing a table column fails loudly (no silent nulls)
    val s3 = MemoryStream[(Long, Double)]
    val q3 = s3.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("root", root).option("checkpointLocation", tmpDir("graft_sink_cp3_"))
      .trigger(Trigger.ProcessingTime(0)).start("tk")
    s3.addData(Seq((1L, 1.0)))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    assert(ex.getMessage.contains("missing column") || ex.getCause != null)
    q3.stop()
  }

  test("graft→graft CDC replication: changelog source into changelog sink, deletes included") {
    import spark.implicits._
    val root = tmpDir("graft_repl_")
    val cat = new KuduLikeCatalog(spark, root)
    def df(rows: Seq[(Long, Double, String)]) = rows.toDF("id", "v", "tag")
    val schema = df(Seq((0L, 0.0, "x"))).schema
    cat.createTable(TableDef("src", schema, Seq("id"), buckets = 2))
    cat.createTable(TableDef("dst", schema, Seq("id"), buckets = 2))

    // bootstrap: replica starts from the source's base snapshot (base
    // appends are not changelog events — same discipline as the source)
    cat.insert("src", df((0L until 50L).map(i => (i, i * 1.0, "base"))))
    cat.insert("dst", cat.table("src"))

    // mutations on src: update, delete, re-update + new key — the replica
    // must apply them in version order, including the tombstones
    cat.upsert("src", df((0L until 10L).map(i => (i, i * -1.0, "upd1"))))
    cat.delete("src", col("id") % 7 === 0)
    cat.upsert("src", df(Seq((3L, 333.0, "upd2"), (60L, 60.0, "new"))))

    val q = spark.readStream.format("graft")
      .option("root", root).option("changelog", "true").load("src")
      .writeStream.format("graft")
      .option("root", root).option("changelog", "true")
      .option("checkpointLocation", tmpDir("graft_repl_cp_"))
      .trigger(Trigger.ProcessingTime(0)).start("dst")
    q.processAllAvailable(); q.stop()

    def snap(t: String) = cat.table(t).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(snap("dst") === snap("src"),
      "replica must equal source after changelog replay (deletes included)")
    // sanity on the interesting keys: 7 deleted, 3 re-updated past its
    // layer-1 value, 60 inserted
    assert(!snap("dst").contains(7L))
    assert(snap("dst")(3L) === (333.0, "upd2"))
    assert(snap("dst")(60L) === (60.0, "new"))
  }

  test("changelog stream: replaying upserts/deletes reconstructs the batch table state") {
    import spark.implicits._
    val root = tmpDir("graft_cdc_")
    val cat = new KuduLikeCatalog(spark, root)
    def df(rows: Seq[(Long, Double, String)]) = rows.toDF("id", "v", "tag")
    cat.createTable(TableDef("t",
      df(Seq((0L, 0.0, "x"))).schema, Seq("id"), buckets = 2))

    // bootstrap: base snapshot (base appends are NOT changelog events)
    cat.insert("t", df((0L until 50L).map(i => (i, i * 1.0, "base"))))
    val snapshot = scala.collection.mutable.Map[Long, (Double, String)](
      cat.table("t").collect().map(r =>
        r.getLong(0) -> (r.getDouble(1), r.getString(2))).toIndexedSeq: _*)

    // three mutation layers: update, delete, insert-new + re-update (the
    // re-update of id 3 must win over layer 1 by version order)
    cat.upsert("t", df((0L until 10L).map(i => (i, i * -1.0, "upd1"))))
    cat.delete("t", col("id") % 7 === 0)
    cat.upsert("t", df(Seq((3L, 333.0, "upd2"), (60L, 60.0, "new"))))

    // stream the changelog and replay it onto the bootstrap snapshot
    val q = spark.readStream.format("graft")
      .option("root", root).option("changelog", "true").load("t")
      .writeStream.format("memory").queryName("cdc_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cdc_out").collect()
      .map(r => (r.getInt(4), r.getString(3), r.getLong(0), r.getDouble(1), r.getString(2)))
      .sortBy(_._1) // replay in version order
    assert(streamed.map(_._1).distinct.length === 3, "three delta layers expected")
    streamed.foreach {
      case (_, "upsert", id, v, tag) => snapshot(id) = (v, tag)
      case (_, "delete", id, _, _)   => snapshot.remove(id): Unit
      case (_, op, _, _, _)          => fail(s"unexpected changelog op $op")
    }
    val batchState = cat.table("t").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(snapshot.toMap === batchState,
      "changelog replay must reconstruct the table state")

    // the batch face of the changelog sees the same events as the stream
    val batchCl = spark.read.format("graft")
      .option("root", root).option("changelog", "true").load("t")
      .collect()
      .map(r => (r.getInt(4), r.getString(3), r.getLong(0), r.getDouble(1), r.getString(2)))
      .sortBy(_._1)
    assert(batchCl.toSeq === streamed.toSeq)

    // compaction folds the layers: a FRESH stream starts at the new floor
    // and sees an empty changelog (nothing pending), while the table state
    // is unchanged
    cat.compact("t")
    val q2 = spark.readStream.format("graft")
      .option("root", root).option("changelog", "true").load("t")
      .writeStream.format("memory").queryName("cdc_out2")
      .trigger(Trigger.ProcessingTime(0)).start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("cdc_out2").count() === 0)
    assert(cat.table("t").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap === batchState)
  }

  test("left-outer interval join: unmatched views emit with nulls at the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents()
    val views = events.filter(_.event_type == "view")
    val buys = events.filter(_.event_type == "purchase")

    val vs = MemoryStream[Ev]
    val ps = MemoryStream[Ev]
    val joined = StreamingIngest.intervalLeftJoinStreams(vs.toDF(), ps.toDF())
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_left_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    vs.addData(views.take(views.size / 2)); ps.addData(buys.take(buys.size / 2))
    q.processAllAvailable()
    vs.addData(views.drop(views.size / 2)); ps.addData(buys.drop(buys.size / 2))
    q.processAllAvailable()
    // advance both watermarks far past every event so ALL outer verdicts
    // become final and flush
    val flushV = views.maxBy(_.ts.getTime)
    val flushB = buys.maxBy(_.ts.getTime)
    def bump(e: Ev, ms: Long) = e.copy(
      event_id = -1L, ts = new java.sql.Timestamp(e.ts.getTime + ms))
    vs.addData(bump(flushV, 10L * 3600 * 1000)); ps.addData(bump(flushB, 10L * 3600 * 1000))
    q.processAllAvailable(); q.stop()

    val out = spark.table("ssj_left_out").collect()
      .filterNot(_.getLong(0) == -1L) // drop the watermark-bump sentinels
    val batch = spark.createDataset(views).toDF()
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .join(spark.createDataset(buys).toDF()
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"), col("value")),
        col("v_user") === col("b_user") && col("b_ts") > col("v_ts") &&
          col("b_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTE"),
        "left_outer")
      .select(col("v_user").as("user_id"), col("v_ts"), col("b_ts"))
      .collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getTimestamp(2))
    assert(out.exists(_.isNullAt(2)), "some views must be unmatched")
    assert(out.map(key).toSeq.map(_.toString).sorted ===
      batch.map(key).toSeq.map(_.toString).sorted)
  }

  test("streaming heavy hitters: MG sketch over micro-batches keeps the batch guarantee") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the mergeable Misra–Gries Aggregator rides Structured Streaming's
    // partial/merge state machinery unchanged — the same property that
    // makes it safe across shuffle partials makes it safe across epochs
    val docs = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t")).as[String]
      .collect().toSeq
    val k = 16
    val stream = MemoryStream[String]
    val q = stream.toDS().select(
      new graft.functions.HeavyHittersAggregator(k).toColumn.name("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    // three uneven micro-batches — state must merge across epochs
    docs.grouped((docs.size / 3).max(1)).foreach { chunk =>
      stream.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val sketch = spark.table("hh_out").as[Map[String, Long]].head()
    assert(sketch.size <= k)
    val n = docs.size.toLong
    val exact = docs.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
    val bound = n.toDouble / (k + 1)
    exact.foreach { case (t, c) =>
      if (c > bound) assert(sketch.contains(t), s"heavy hitter '$t' lost across epochs")
    }
    sketch.foreach { case (t, c) =>
      assert(c <= exact(t), s"'$t' overcounted after epoch merges")
      assert(exact(t) - c <= bound, s"'$t' undercount beyond the MG bound")
    }
  }

  test("streaming trainer feed: chunking is stateless per-row — stream == batch " +
    "regardless of micro-batch cuts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, (0 until 40).map(i => s"a$i").mkString(" ")),
      (2L, (0 until 25).map(i => s"b$i").mkString(" ")),
      (3L, "x y z"))
    val stream = MemoryStream[(Long, String)]
    def chunked(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Chunker.slidingWindow(
        df.toDF("doc_id", "text"), "text", window = 16, stride = 12)
    val q = chunked(stream.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("chunk_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    // two uneven micro-batches: a narrow per-row op must not care
    stream.addData(docs.take(1)); q.processAllAvailable()
    stream.addData(docs.drop(1)); q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(3), r.getString(4))
    val streamed = spark.table("chunk_out")
      .select("doc_id", "chunk_idx", "tok_start", "n_tok", "chunk_hash")
      .collect().map(key).toSet
    val batch = chunked(docs.toDF("doc_id", "text"))
      .select("doc_id", "chunk_idx", "tok_start", "n_tok", "chunk_hash")
      .collect().map(key).toSet
    assert(streamed === batch && streamed.nonEmpty)
  }

  /** Corpus for the streaming near-dup filter: 1↔2 and 5↔6 are heavy
    * near-dups (one token changed out of 20), the rest pairwise distinct.
    */
  private def nearDupDocs(): Seq[StreamDoc] = {
    def words(tag: String) = (0 until 20).map(i => s"$tag$i")
    Seq(
      StreamDoc(1L, words("a").mkString(" ")),
      StreamDoc(2L, (words("a").dropRight(1) :+ "CHANGED").mkString(" ")),
      StreamDoc(3L, words("q").mkString(" ")),
      StreamDoc(4L, words("r").mkString(" ")),
      StreamDoc(5L, words("s").mkString(" ")),
      StreamDoc(6L, (words("s").dropRight(1) :+ "OTHER").mkString(" ")))
  }

  private def runNearDup(batches: Seq[Seq[StreamDoc]], name: String): Map[Long, Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamDoc]
    val filtered = StreamingIngest.nearDupFilterStream(
      stream.toDF(), "text", "doc_id", numHashes = 16, bands = 4, tau = 0.5)
    val q = filtered.toDF().writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    // doc → matched representative (min across its bands), dups only
    spark.table(name).where(col("matched"))
      .groupBy("doc_id").agg(min("rep").as("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("streaming near-dup filter: catches within- and cross-batch dups, passes novel docs") {
    val docs = nearDupDocs()
    // 1 and 5 arrive first (admitted); 2 dups 1 cross-batch, 6 dups 5 in-batch
    val dups = runNearDup(
      Seq(Seq(docs(0), docs(2)), Seq(docs(1), docs(3)), Seq(docs(4), docs(5))),
      "neardup_out")
    assert(dups === Map(2L -> 1L, 6L -> 5L))
  }

  test("streaming near-dup filter: micro-batch cuts cannot change verdicts") {
    val docs = nearDupDocs()
    val oneBatch = runNearDup(Seq(docs), "neardup_one")
    val threeBatch = runNearDup(docs.grouped(2).toSeq, "neardup_three")
    assert(oneBatch === threeBatch && oneBatch === Map(2L -> 1L, 6L -> 5L))
    // ground truth: every flagged pair really is signature-similar, and
    // estimated Jaccard of the flagged pairs clears tau in BATCH too
    import spark.implicits._
    val sig = (0 until 16).map(i =>
      graft.functions.TextFunctions.minhash(col("text"), i))
    val sigs = docs.toDF("doc_id", "text")
      .select(col("doc_id"), array(sig: _*).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    oneBatch.foreach { case (d, r) =>
      val est = sigs(d).zip(sigs(r)).count { case (a, b) => a == b } / 16.0
      assert(est >= 0.5, s"flagged pair ($d,$r) must be truly similar, est=$est")
    }
    val novel = Seq(3L, 4L)
    novel.foreach(d => assert(!oneBatch.contains(d), s"doc $d is novel"))
  }

  test("incremental-crawl pipeline: near-dup filter feeds the keyed dup-ignore ingest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = nearDupDocs()
    val root = tmpDir("graft_crawl_")
    val cat = new KuduLikeCatalog(spark, root)
    cat.createTable(TableDef("admitted",
      Seq((0L, 0L)).toDF("doc_id", "n_bands").schema, Seq("doc_id")))

    val stream = MemoryStream[StreamDoc]
    val verdicts = StreamingIngest.nearDupFilterStream(
      stream.toDF(), "text", "doc_id", numHashes = 16, bands = 4, tau = 0.5)
    // a doc's bands all ride one input row, so each micro-batch carries
    // every verdict for its docs: novel = no matched band in this batch
    val q = verdicts.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val novel = batch.groupBy("doc_id")
          .agg(max(col("matched")).as("dup"), count(lit(1)).as("n_bands"))
          .where(!col("dup")).select("doc_id", "n_bands")
        cat.insert("admitted", novel): Unit
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(Seq(docs(0), docs(2))); q.processAllAvailable()
    stream.addData(Seq(docs(1), docs(3))); q.processAllAvailable()
    stream.addData(Seq(docs(4), docs(5))); q.processAllAvailable()
    // a replayed batch must not double-admit (the keyed insert dup-ignores)
    stream.addData(Seq(docs(3))); q.processAllAvailable()
    q.stop()

    val admitted = cat.table("admitted").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(admitted === Seq(1L, 3L, 4L, 5L), "dups 2 and 6 filtered, novels admitted once")
  }

  // ---- streaming SemDeDup (semantic near-dup filter over embeddings) ----

  private val semCents: Seq[Seq[Float]] =
    Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))

  // planted geometry (tau = 0.9): 1 admits cell 0; 2 ~ 1 (cos .998) drops;
  // 3 admits cell 1; 4 ~ 3 (cos .999) drops; 5 lands cell 0 (distance tie →
  // lowest cell) but cos(5,1) = .707 < tau → admits; 7 ~ 5 (cos .9999)
  private def semVecs(): Seq[SemVec] = Seq(
    SemVec(1L, Seq(1f, 0f, 0f, 0f)),
    SemVec(2L, Seq(0.9f, 0.05f, 0f, 0f)),
    SemVec(3L, Seq(0.1f, 1f, 0f, 0f)),
    SemVec(4L, Seq(0.05f, 0.9f, 0f, 0f)),
    SemVec(5L, Seq(0.7f, 0.7f, 0f, 0f)),
    SemVec(7L, Seq(0.72f, 0.7f, 0f, 0f)))

  private def runSemDedup(batches: Seq[Seq[SemVec]], name: String,
      maxReps: Int = 1024): Map[Long, (Long, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SemVec]
    val verdicts = StreamingIngest.semanticDedupStream(
      stream.toDF(), "vec_id", "embedding", semCents, tau = 0.9,
      maxRepsPerCell = maxReps)
    val q = verdicts.toDF().writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).select("vec_id", "rep", "dropped")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
  }

  test("streaming SemDeDup: cell-local greedy prune, batch-cut-invariant, " +
    "matches the batch operator on chain-free data") {
    val vecs = semVecs()
    val expected = Map(
      1L -> (1L, false), 2L -> (1L, true), 3L -> (3L, false),
      4L -> (3L, true), 5L -> (5L, false), 7L -> (5L, true))
    val oneBatch = runSemDedup(Seq(vecs), "semdedup_one")
    val threeBatch = runSemDedup(vecs.grouped(2).toSeq, "semdedup_three")
    assert(oneBatch === expected, "greedy verdicts with planted geometry")
    assert(threeBatch === oneBatch, "micro-batch cuts cannot change verdicts")

    // chain-free data (every dropped doc matches an ADMITTED rep, so the
    // batch any-lower-id rule and the streaming kept-set rule coincide)
    import spark.implicits._
    val batch = graft.operators.Dedup.semanticDedup(
      vecs.toDF(), "vec_id", "embedding", semCents, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(batch === oneBatch.map { case (id, (_, d)) => id -> d },
      "stream == batch dropped set on chain-free input")
  }

  private def chunkDocs(): Seq[StreamDoc] = {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    def unique(d: Int) = (1 to 10).map(i => s"u${d}_$i").mkString(" ")
    Seq(
      StreamDoc(1L, s"$boiler ${unique(1)}"), // claims the boilerplate chunk
      StreamDoc(2L, s"$boiler ${unique(2)}"), // loses it (cross- or in-batch)
      StreamDoc(3L, boiler),                  // all boilerplate: 0 kept
      StreamDoc(4L, unique(4)))               // fully novel
  }

  private def runChunkDedup(batches: Seq[Seq[StreamDoc]],
      name: String): Map[Long, (Int, Int)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamDoc]
    val verdicts = StreamingIngest.chunkDedupStream(
      stream.toDF(), "text", "doc_id", width = 10)
    val q = verdicts.toDF().writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).groupBy("doc_id")
      .agg(count(lit(1)).as("total"),
        sum(when(col("kept"), 1).otherwise(0)).as("kept"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1).toInt, r.getLong(2).toInt))
      .toMap
  }

  test("streaming chunk dedup: first-occurrence-wins across batches, equals the " +
    "batch operator for id-ordered arrival") {
    val docs = chunkDocs()
    val expected = Map( // (total chunks, kept chunks) per doc
      1L -> (2, 2), 2L -> (2, 1), 3L -> (1, 0), 4L -> (1, 1))
    val oneBatch = runChunkDedup(Seq(docs), "chunkdedup_one")
    val perBatch = runChunkDedup(docs.map(Seq(_)), "chunkdedup_four")
    assert(oneBatch === expected, "planted boilerplate truth table")
    assert(perBatch === oneBatch, "id-ordered cuts cannot change verdicts")
    // the batch face computes identical counts on the same corpus
    import spark.implicits._
    val batch = graft.operators.Dedup.chunkDedup(
        docs.toDF("doc_id", "text"), "text", "doc_id", width = 10)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(batch === oneBatch, "stream == batch for id-ordered arrival")
  }

  test("streaming SemDeDup: out-of-order arrival is first-writer-wins — " +
    "batch cuts pick WHICH of a near-dup pair survives, never both") {
    // Vectors 1 and 2 are symmetric near-dups (cos .998 >= tau). Arriving
    // together (any order), the in-batch vec_id sort admits 1 and drops 2;
    // arriving as [2] then [1], 2 is admitted first and 1 drops against it.
    // This is the documented delta from the id-ordered invariant: exactly
    // one survivor either way, identity decided by the cut.
    val pair = semVecs().take(2)
    val together = runSemDedup(Seq(pair.reverse), "semdedup_ooo_one")
    assert(together === Map(1L -> (1L, false), 2L -> (1L, true)),
      "single batch sorts by vec_id regardless of arrival order")
    val split = runSemDedup(pair.reverse.map(Seq(_)), "semdedup_ooo_split")
    assert(split === Map(2L -> (2L, false), 1L -> (2L, true)),
      "cut before the lower id: the earlier arrival wins the cell")
    // invariant that DOES hold under any cut: one survivor per dup pair
    Seq(together, split).foreach { m =>
      assert(m.values.count(!_._2) === 1 && m.values.count(_._2) === 1)
    }
  }

  test("streaming SemDeDup: the rep cap bounds state and is an honest " +
    "approximation (past-cap admissions stop deduping later arrivals)") {
    val vecs = semVecs()
    val capped = runSemDedup(Seq(vecs), "semdedup_cap", maxReps = 1)
    // cell 0 keeps only rep 1; 5 is still admitted (novel vs rep 1) but not
    // retained, so 7 — a near-dup of 5, not of 1 — is admitted too
    assert(capped(5L) === (5L, false))
    assert(capped(7L) === (7L, false),
      "past-cap arrival must pass (documented bounded-state approximation)")
    assert(capped(2L) === (1L, true), "the retained rep still dedupes")
  }

  private def runDomainQuota(batches: Seq[Seq[QuotaDoc]],
      name: String): Map[Long, (Long, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[QuotaDoc]
    val verdicts = StreamingIngest.domainQuotaStream(
      stream.toDF(), "domain", "doc_id", cap = 2)
    val q = verdicts.toDF().writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).select("doc_id", "rank", "admitted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
  }

  test("streaming domain quota: first-cap-by-arrival, id-ordered cuts " +
    "cannot change verdicts, counter survives across batches") {
    val docs = Seq(QuotaDoc(1L, "a"), QuotaDoc(2L, "a"), QuotaDoc(3L, "a"),
      QuotaDoc(4L, "b"), QuotaDoc(5L, "b"))
    val expected = Map(
      1L -> (1L, true), 2L -> (2L, true), 3L -> (0L, false),
      4L -> (1L, true), 5L -> (2L, true))
    val oneBatch = runDomainQuota(Seq(docs), "quota_one")
    val perDoc = runDomainQuota(docs.map(Seq(_)), "quota_five")
    assert(oneBatch === expected, "planted quota truth table")
    assert(perDoc === oneBatch, "id-ordered cuts cannot change verdicts")
  }

  test("streaming domain quota: out-of-order arrival is first-writer-wins " +
    "on the slots — exactly cap admitted per domain either way") {
    val docs = Seq(QuotaDoc(3L, "a"), QuotaDoc(1L, "a"), QuotaDoc(2L, "a"))
    // single batch: the in-batch doc_id sort admits 1,2 and rejects 3
    val together = runDomainQuota(Seq(docs), "quota_ooo_one")
    assert(together === Map(1L -> (1L, true), 2L -> (2L, true), 3L -> (0L, false)))
    // cut before the lower ids: 3 claims the first slot
    val split = runDomainQuota(docs.map(Seq(_)), "quota_ooo_split")
    assert(split === Map(3L -> (1L, true), 1L -> (2L, true), 2L -> (0L, false)))
    Seq(together, split).foreach { m =>
      assert(m.values.count(_._2) === 2, "exactly cap admitted under any cut")
    }
  }
}

case class QuotaDoc(doc_id: Long, domain: String)

case class SemVec(vec_id: Long, embedding: Seq[Float])
