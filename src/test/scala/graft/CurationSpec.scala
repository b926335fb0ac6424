package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Corpus balancing (operators/Curation): blocklist anti-join, per-domain
  * cap survivorship, and the Hamilton largest-remainder temperature
  * allocation — planted-truth fixtures plus fixture-level invariants. The
  * allocation arithmetic is additionally oracle-gated cross-engine by
  * d49_temperature_mix; the cap by d48_domain_cap.
  */
class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("blocklistFilter drops exactly the blocked domains") {
    import spark.implicits._
    val blocked = Seq("src1", "src3", "not_a_domain").toDF("domain")
    val kept = Curation.blocklistFilter(docs, "source", blocked)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    val all = docs.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(kept === all -- Set("src1", "src3"))
  }

  test("domainCap keeps the top-cap by rank desc with ascending-id ties, " +
    "independent of input partitioning") {
    import spark.implicits._
    val rows = Seq( // (id, domain, score): domain a has a 3-way tie at 9
      (1L, "a", 9L), (2L, "a", 9L), (3L, "a", 9L), (4L, "a", 5L),
      (5L, "b", 1L), (6L, "b", 2L))
      .toDF("doc_id", "domain", "score")
    def surv(parts: Int): Set[Long] =
      Curation.domainCap(rows.repartition(parts), "domain", "score", "doc_id", cap = 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv(1) === Set(1L, 2L, 5L, 6L),
      "ties at the cap boundary resolve by ascending id; b keeps all under cap")
    assert(surv(7) === surv(1), "survivor set must not depend on partitioning")
    val ranks = Curation.domainCap(rows, "domain", "score", "doc_id", cap = 2)
      .select("domain", "keep_rank").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq).toMap
    assert(ranks === Map("a" -> Seq(1, 2), "b" -> Seq(1, 2)))
  }

  test("sqrtTemperatureAllocation matches the hand-computed Hamilton " +
    "apportionment, remainder ties broken by domain name") {
    import spark.implicits._
    // counts 100/25/4/1 -> weights 10/5/2/1 (x1e6), W=18e6, budget 10:
    // bases 5/2/1/0 (sum 8), remainders b:14e6 > a:10e6 = d:10e6 > c:2e6,
    // two leftover seats go to b and (tie, name order) a.
    val rows = (1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 125).map(i => (i.toLong, "b")) ++
      (126 to 129).map(i => (i.toLong, "c")) ++ Seq((130L, "d"))
    val got = Curation.sqrtTemperatureAllocation(
        rows.toDF("doc_id", "domain"), "domain", budget = 10L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      "a" -> (10000000L, 6L), "b" -> (5000000L, 3L),
      "c" -> (2000000L, 1L), "d" -> (1000000L, 0L)))
  }

  test("allocation sums to exactly the budget and is monotone in domain size") {
    val out = Curation.sqrtTemperatureAllocation(docs, "source", budget = 997L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.map(_._3).sum === 997L, "largest-remainder must hit the budget exactly")
    assert(out.forall(_._3 >= 0L))
    for ((_, ni, ai) <- out; (_, nj, aj) <- out if ni > nj)
      assert(ai >= aj, s"bigger domain ($ni docs, $ai) out-allocated by ($nj docs, $aj)")
  }

  test("degenerate budgets: zero allocates nothing, a single domain takes all") {
    import spark.implicits._
    val one = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "domain")
    val zero = Curation.sqrtTemperatureAllocation(one, "domain", budget = 0L)
      .collect().map(_.getLong(3))
    assert(zero.toSeq === Seq(0L))
    val all = Curation.sqrtTemperatureAllocation(one, "domain", budget = 7L)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(all.toSeq === Seq(("a", 7L)), "sole domain must absorb the budget")
  }

  test("blocklistFilter works when the docs column is literally named " +
    "'domain' (no ambiguous-column AnalysisException)") {
    import spark.implicits._
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "domain")
    val blocked = Seq("b").toDF("domain")
    val kept = Curation.blocklistFilter(rows, "domain", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }

  test("NULL-domain rows survive the blocklist and form their own cap group") {
    import spark.implicits._
    val rows = Seq((1L, Some("a"), 9L), (2L, None, 8L), (3L, None, 7L),
      (4L, None, 6L), (5L, Some("a"), 5L))
      .toDF("doc_id", "domain", "score")
    val blocked = Seq("a").toDF("d")
    val afterBlock = Curation.blocklistFilter(rows, "domain", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterBlock === Set(2L, 3L, 4L),
      "NULL === blocked is NULL, so the anti-join must keep NULL domains")
    val capped = Curation.domainCap(rows, "domain", "score", "doc_id", cap = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped === Set(1L, 5L, 2L, 3L),
      "NULL domains compete in one group: top-2 by score = ids 2,3")
  }

  test("salted domainCap is survivor-and-rank identical to the unsalted " +
    "window under planted megadomain skew, for every salt count") {
    import spark.implicits._
    // 1 megadomain with 2000 rows (incl. score ties) + 50 small domains.
    val mega = (0 until 2000).map(i => (i.toLong, "mega", (i % 17).toLong))
    val tail = (0 until 50).flatMap(d =>
      (0 until 5).map(i => (10000L + d * 10 + i, s"dom$d", i.toLong)))
    val rows = (mega ++ tail).toDF("doc_id", "domain", "score").repartition(13)
    def run(salts: Int): Seq[(Long, Int)] =
      Curation.domainCap(rows, "domain", "score", "doc_id", cap = 7, salts = salts)
        .select("doc_id", "keep_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val unsalted = run(1)
    for (s <- Seq(2, 16, 64))
      assert(run(s) === unsalted,
        s"salts=$s must reproduce the exact unsalted survivor set and ranks")
  }

  test("empty blocklist is a no-op") {
    import spark.implicits._
    val blocked = Seq.empty[String].toDF("domain")
    assert(Curation.blocklistFilter(docs, "source", blocked).count() === docs.count())
  }

  test("budget smaller than the domain count starves the weakest remainders") {
    import spark.implicits._
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "domain")
    val got = Curation.sqrtTemperatureAllocation(rows, "domain", budget = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.values.sum === 2L)
    assert(got.values.forall(a => a == 0L || a == 1L),
      s"with budget < |domains| nobody gets 2: $got")
  }

  test("distributed ranking equals the flat driver-computed Hamilton " +
    "allocation on a randomized many-domain table (spans range partitions)") {
    import spark.implicits._
    // 5000 domains with pseudo-random sizes: far more domains than shuffle
    // partitions, so local ranks genuinely need the cross-partition offset
    val sizes = (0 until 5000).map(i => (f"dom$i%05d", (i * 7919 % 97) + 1))
    val docs = sizes.flatMap { case (d, n) => Seq.fill(n)(d) }.toDF("domain")
      .repartition(32)
    val budget = 12345L
    val got = Curation.sqrtTemperatureAllocation(docs, "domain", budget)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    // flat reference Hamilton on the driver (the pre-round-15 semantics)
    val w = sizes.map { case (d, n) => d -> math.floor(math.sqrt(n) * 1e6).toLong }
    val wTot = w.map(_._2).sum
    val base = w.map { case (d, wi) => d -> budget * wi / wTot }.toMap
    val rem = w.map { case (d, wi) => d -> budget * wi % wTot }
    val seats = budget - base.values.sum
    val plusOne = rem.sortBy { case (d, r) => (-r, d) }.take(seats.toInt)
      .map(_._1).toSet
    val want = w.map { case (d, _) =>
      d -> (base(d) + (if (plusOne(d)) 1L else 0L)) }.toMap
    assert(got === want)
    assert(got.values.sum === budget)
  }

  test("the allocation plan has no unpartitioned window (round-15: the " +
    "last single-task stage is gone)") {
    import spark.implicits._
    val docs = (0 until 100).map(i => s"d${i % 10}").toDF("domain")
    val plan = Curation.sqrtTemperatureAllocation(docs, "domain", 50L)
      .queryExecution.executedPlan.toString
    // a Window node prints `Window [fns], [partitionBy], [orderBy]` when
    // partitioned and `Window [fns], [orderBy]` when global — every window
    // in this plan must carry the partition list (three bracket groups)
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty, "expected the local-rank window")
    windowLines.foreach { l =>
      assert(l.sliding(4).count(_ == "], [") >= 2,
        s"unpartitioned (single-task) window survives in: $l")
    }
  }
}
