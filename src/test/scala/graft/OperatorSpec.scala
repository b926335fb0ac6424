package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{AsOfJoin, Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Operator-level behaviors with no SQL oracle: as-of join vs brute force,
  * LSH candidate generation, ANN recall, approx-agg tolerance (SURVEY.md A5,
  * D2-LSH, J9, §2.8).
  */
class OperatorSpec extends SparkSpec {

  test("J9: AsOfJoin.backward matches brute-force join+max formulation") {
    val e = Tables.load(spark, sf, "events")
    val purchases = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click").select("user_id", "ts")

    val viaOperator = AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts",
      Seq("ts" -> "click_ts"))
      .select(col("event_id"), col("click_ts"))

    val brute = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max(col("c.ts")).as("click_ts"))

    assert(viaOperator.count() === purchases.count())
    assert(viaOperator.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(viaOperator).count() === 0)
  }

  test("J9: null timestamps — identical semantics in both variants, no NPE") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val nullTs = null.asInstanceOf[java.sql.Timestamp]
    val left = Seq(
      (1L, "k1", t("2024-01-01 10:00:00")),
      (2L, "k1", nullTs), // null left ts → null payload (no row ≤ unknown time)
      (3L, "k2", t("2024-01-01 10:00:00"))).toDF("event_id", "k", "ts")
    val right = Seq(
      ("k1", t("2024-01-01 09:00:00"), 7.0),
      ("k1", nullTs, 99.0), // null right ts → never "most recent ≤ ts"
      ("k2", nullTs, 42.0)).toDF("k", "ts", "v")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Any)] =
      df.select("event_id", "pay").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
        .toSet[(Long, Any)]
    val expected = Set[(Long, Any)]((1L, 7.0), (2L, null), (3L, null))
    assert(norm(AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("v" -> "pay"))) === expected)
    assert(norm(AsOfJoin.backwardBroadcast(left, right, "k", "ts", "ts", Seq("v" -> "pay"))) === expected)
  }

  test("J9 broadcast variant: identical to the window formulation, no left shuffle") {
    val e = Tables.load(spark, sf, "events")
    val purchases = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click").select("user_id", "ts")
    val windowed = AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts",
      Seq("ts" -> "click_ts")).select("event_id", "click_ts")
    val broadcasted = AsOfJoin.backwardBroadcast(purchases, clicks, "user_id", "ts", "ts",
      Seq("ts" -> "click_ts")).select("event_id", "click_ts")
    assert(broadcasted.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(broadcasted).count() === 0)
    // the broadcast plan has no Exchange on the left path
    assert(!broadcasted.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("D1: exact dedup keeps lowest id and is idempotent") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val withDups = docs.unionAll(docs.select((col("doc_id") + 5000).as("doc_id"), col("text")))
    val deduped = Dedup.exact(withDups, "text", "doc_id")
    assert(deduped.count() === docs.count())
    assert(deduped.agg(max("doc_id")).head().getLong(0) < 5000)
    assert(Dedup.exact(deduped, "text", "doc_id").count() === deduped.count())
  }

  test("staged-cache slot swap is atomic under concurrent operator calls") {
    // Dedup.stage() keys an internal persisted-frame cache by operator slot;
    // concurrent calls on the same slot must serialize the
    // unpersist-old/persist-new swap (ConcurrentHashMap.compute) — the old
    // remove→persist→put sequence could interleave two callers and leak a
    // persisted frame nobody tracks. Correctness under the race: every call
    // still returns exact results, no call throws.
    val docs = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val expected = Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau = 0.3).count()
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new Callable[Long] {
          override def call(): Long =
            Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau = 0.3).count()
        })
      }
      futures.foreach(f => assert(f.get(120, TimeUnit.SECONDS) === expected))
    } finally { pool.shutdownNow(); () }
  }

  test("CC: connectedComponents equals driver union-find; chains collapse in log rounds") {
    import spark.implicits._
    // mixed shapes: a chain (worst case for naive propagation), a star, a
    // triangle with a pendant, an isolated pair
    val chain = (0 until 40).map(i => (i.toLong, (i + 1).toLong))
    val star = (1 to 5).map(i => (100L, 100L + i))
    val tri = Seq((200L, 201L), (201L, 202L), (200L, 202L), (202L, 203L))
    val pair = Seq((300L, 301L))
    val edges = chain ++ star ++ tri ++ pair
    val cc = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver union-find truth: roots attach max-under-min, so the root of
    // every set IS its min id
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(cc === nodes.map(n => n -> find(n)).toMap)
    // pointer doubling: a 200-link chain converges within 10 rounds where
    // naive min-propagation would need 200
    val longChain = (0 until 200).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val cc2 = Dedup.connectedComponents(longChain, "a", "b", maxRounds = 10)
    assert(cc2.agg(max(col("comp"))).head().getLong(0) === 0L)
    assert(cc2.count() === 201L)
  }

  test("D2-LSH: banded candidates find identical and near-identical docs") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    // plant: 1000+i = exact copy of doc i (i<10); 2000+i = copy with one token appended
    val copies = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val nearCopies = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 2000).as("doc_id"), concat(col("text"), lit(" zzz")).as("text"))
    val corpus = docs.unionAll(copies).unionAll(nearCopies)
    val cand = Dedup.minhashLshCandidates(corpus, "text", "doc_id", numHashes = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 10 exact-copy pairs must be candidates (identical signatures)
    (0 until 10).foreach { i => assert(cand.contains((i.toLong, i + 1000L)), s"exact copy pair $i missing") }
    // near-copies: banded LSH should catch most single-token edits
    val nearFound = (0 until 10).count(i => cand.contains((i.toLong, i + 2000L)))
    assert(nearFound >= 7, s"only $nearFound/10 near-dup pairs found")
  }

  test("SimHash: identical docs share signature; signature is 16-bit") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val sh = docs.select(col("doc_id"), TextFunctions.simhash16(col("text")).as("s")).collect()
    assert(sh.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 65536))
    val clusters = Dedup.simhashClusters(
      docs.select("doc_id", "text")
        .unionAll(docs.select((col("doc_id") + 500).as("doc_id"), col("text"))),
      "text", "doc_id")
    // every planted copy's rep equals the original's rep
    val reps = clusters.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    reps.keys.filter(_ >= 500).foreach { id => assert(reps(id) === reps(id - 500)) }
  }

  test("SimHash64 banding: candidate recall at Hamming<=3 is EXACT vs the quadratic truth") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      TextFunctions.simhash64(col("text")).as("sh"))
    val banded = Dedup.simhash64Pairs(sig, "doc_id", k = 3, blocks = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s = sig.collect().map(r => (r.getLong(0), r.getLong(1)))
    val quadratic = (for {
      (ia, sa) <- s; (ib, sb) <- s
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    // pigeonhole guarantee: <=3 differing bits touch <=3 of 6 blocks, so the
    // table keyed on the 3 intact blocks matches — banded == quadratic, not ⊆
    assert(banded === quadratic,
      s"banded=${banded.size} quadratic=${quadratic.size} " +
        s"missed=${(quadratic -- banded).take(5)} extra=${(banded -- quadratic).take(5)}")
  }

  test("SimHash64 near-dup reps match the quadratic truth on a dup-heavy " +
    "corpus (signature-collapse fast path is semantics-invariant)") {
    import spark.implicits._
    // every doc replicated 10x (the sf10 fixture shape that exposed the
    // multiplicity-quadratic pairing) — reps must equal the per-doc
    // quadratic definition: min id over the Hamming<=3 neighborhood
    val base = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 60)
    val docs = (0 until 10).map(c =>
        base.select((col("doc_id") + c * 1000L).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val got = Dedup.simhash64NearDup(docs, "text", "doc_id", k = 3, blocks = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val s = docs.select(col("doc_id"),
        graft.functions.TextFunctions.simhash64(col("text")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = s.map { case (id, sh) =>
      id -> s.collect {
        case (id2, sh2) if java.lang.Long.bitCount(sh ^ sh2) <= 3 => id2
      }.min
    }.toMap
    assert(got === truth)
  }

  test("ANN: lshTopK returns valid ranks and finds a reasonable share of true neighbors") {
    val e = Tables.load(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, e, k = 5)
    val approx = Similarity.lshTopK(queries, e, k = 5, planes = 4, tables = 4)
    val exactSet = exact.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approxRows = approx.collect()
    // structural invariants
    assert(approxRows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 5))
    assert(approxRows.forall(r => r.getLong(0) != r.getLong(2)))
    // recall against exact top-5 (sign-LSH with 4 planes ≈ coarse buckets)
    val hits = approxRows.count(r => exactSet.contains((r.getLong(0), r.getLong(2))))
    val recall = hits.toDouble / exactSet.size
    assert(recall >= 0.2, s"recall $recall too low")
    // scored cosines must match the exact computation for the same pairs
    val exactCos = exact.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    approxRows.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(2))).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-12))
    }
  }

  test("A5: approx_count_distinct within 5% of exact") {
    val li = Tables.load(spark, sf, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    both.foreach { r =>
      val (exact, approx) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("cosine HOF agrees with a plain Scala computation") {
    val e = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 2)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val a = e(0L).map(_.toDouble); val b = e(1L).map(_.toDouble)
    def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map { case (p, q) => p * q }.sum
    val expected = dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    val pair = Tables.load(spark, sf, "embeddings").filter(col("vec_id") === 0)
      .crossJoin(Tables.load(spark, sf, "embeddings").filter(col("vec_id") === 1)
        .select(col("embedding").as("emb2")))
      .select(VectorFunctions.cosine(col("embedding"), col("emb2")).as("cos"))
      .head().getDouble(0)
    assert(math.abs(pair - expected) < 1e-9)
  }

  test("ExactMedian matches Spark's median() on every group-size parity") {
    import spark.implicits._
    // odd n, even n (two distinct middles), even n (tied middles), single
    // row, duplicate-heavy, a NULL to be skipped, and an all-NULL group
    // (median() keeps the group with a NULL median — so must we)
    val rows = Seq(
      ("odd", Some(1.0)), ("odd", Some(2.0)), ("odd", Some(100.0)),
      ("even", Some(1.0)), ("even", Some(2.0)), ("even", Some(3.0)), ("even", Some(100.0)),
      ("tied", Some(1.0)), ("tied", Some(2.0)), ("tied", Some(2.0)), ("tied", Some(9.0)),
      ("one", Some(7.0)),
      ("dups", Some(5.0)), ("dups", Some(5.0)), ("dups", Some(5.0)), ("dups", Some(5.0)),
      ("nulls", Some(1.0)), ("nulls", None), ("nulls", Some(3.0)),
      ("allnull", None), ("allnull", None)
    ).toDF("g", "v")
    val got = graft.operators.ExactMedian.groupedMedian(rows, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got === Map("odd" -> Some(2.0), "even" -> Some(2.5),
      "tied" -> Some(2.0), "one" -> Some(7.0), "dups" -> Some(5.0),
      "nulls" -> Some(2.0), "allnull" -> None))
    // and against the built-in on arbitrary data (500 rows, 7 skewed groups)
    val rand = spark.range(500)
      .select((col("id") % 7).cast("string").as("g"),
        (hash(col("id")) % 1000).cast("double").as("v"))
    val builtin = rand.groupBy("g").agg(expr("median(v)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ours = graft.operators.ExactMedian.groupedMedian(rand, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours === builtin)
  }

  test("D34: PageRank integer arithmetic matches hand-computed path graph") {
    import spark.implicits._
    // symmetric path 1-2-3; scale 1000, 2 iterations, worked by hand:
    //   deg = (1:1, 2:2, 3:1), base = 150
    //   r1 = (575, 1850, 575); r2 = (936, 1127, 936)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r2 = graft.operators.PageRank
      .pageRankInt(edges, "src", "dst", iterations = 2, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 936L, 2L -> 1127L, 3L -> 936L))
  }

  test("D34: PageRank is partitioning-invariant and retry-deterministic") {
    import spark.implicits._
    val fwd = spark.range(200).select(
      (col("id") % 17).as("src"), (col("id") % 29 + 100).as("dst")).distinct()
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    def run(e: org.apache.spark.sql.DataFrame) =
      graft.operators.PageRank.pageRankInt(e, iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(edges)
    val b = run(edges.repartition(7))
    val c = run(edges.coalesce(1))
    assert(a === b && a === c)
    assert(a.keySet === (0L until 17L).toSet ++ (100L until 129L).toSet)
  }

  test("D35: keepCanonical picks max score, ties to lowest id, under any partitioning") {
    import spark.implicits._
    val members = Seq(
      (1L, 10L, 5L), (2L, 10L, 9L), (3L, 10L, 9L), // tie at 9 → keep id 2
      (4L, 20L, 1L),                                // singleton
      (5L, 30L, 3L), (6L, 30L, 2L)
    ).toDF("id", "component", "score")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.keepCanonical(df, "id", "component", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Set((10L, 2L, 3L), (20L, 4L, 1L), (30L, 5L, 2L))
    assert(run(members) === expect)
    assert(run(members.repartition(5)) === expect)
  }

  test("D34: dangling-free contract — ranks anchor on sources; a pure sink is absent") {
    import spark.implicits._
    val directed = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst") // 2 is a pure sink
    val pr = graft.operators.PageRank
      .pageRankInt(directed, iterations = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sources with no in-edges hold exactly the (1-d) base mass
    assert(pr === Map(1L -> 150L, 3L -> 150L))
  }

  test("D37: int8 quantization — codes bounded, max element saturates, " +
    "error within scale/2, zero vector all-zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: scale 0
      (3L, Array(127.0f, -127.0f, 1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val q = graft.operators.Quantize.int8(df, "embedding")
      .select("vec_id", "scale", "codes", "n_sat", "max_err_e9")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Long](2), r.getLong(3), r.getLong(4)))).toMap
    val (s1, c1, sat1, err1) = q(1L)
    assert(s1 === 1.0 / 127.0)
    assert(c1 === Seq(64L, -127L, 32L, 0L)) // 0.5/(1/127)=63.5 rounds half-up
    assert(sat1 === 1L && c1.forall(c => math.abs(c) <= 127))
    // reconstruction bound: |x - q*scale| <= scale/2 (+1 nano of float noise)
    assert(err1 <= math.ceil(s1 / 2 * 1e9).toLong + 1)
    val (s2, c2, sat2, err2) = q(2L)
    assert(s2 === 0.0 && c2 === Seq(0L, 0L, 0L, 0L) && sat2 === 0L && err2 === 0L)
    val (_, c3, sat3, _) = q(3L)
    assert(c3 === Seq(127L, -127L, 1L, -1L) && sat3 === 2L)
  }

  test("D38: sliding-window chunking — full coverage with exact overlap, " +
    "short doc yields one whole-doc chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (0 until 30).map(i => s"t$i").mkString(" ")), // 30 tokens
      (2L, "a b c"),                                     // shorter than window
      (3L, null.asInstanceOf[String])                    // NULL text: no chunks
    ).toDF("doc_id", "text")
    val rows = graft.operators.Chunker
      .slidingWindow(docs, "text", window = 16, stride = 12, keepText = true)
      .select("doc_id", "chunk_idx", "tok_start", "n_tok", "chunk_text")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,12,24: windows [0,16),[12,28),[24,30) — covers every token,
    // consecutive chunks overlap by window-stride=4
    assert(d1.map(c => (c._3, c._4)) === Seq((0, 16L), (12, 16L), (24, 6L)))
    assert(d1(0)._5.split(" ").takeRight(4).toSeq ===
      d1(1)._5.split(" ").take(4).toSeq)
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.map(c => (c._2, c._3, c._4, c._5)).toSeq ===
      Seq((0, 0, 3L, "a b c")))
    assert(!rows.exists(_._1 == 3L), "NULL text must yield zero chunks")
  }
}
