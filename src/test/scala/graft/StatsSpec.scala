package graft

import graft.catalog.KuduLikeCatalog
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.functions._

/** ANALYZE TABLE / persisted statistics: exactness of the one-pass
  * computation, the fingerprint stale-safety discipline (a stale NDV may
  * cost plan quality, never correctness), and the full DSv2 → Catalyst CBO
  * propagation path (reference analog: Impala COMPUTE STATS feeding the
  * planner for a Kudu table; the reference repo itself delegated all
  * planning to hive-exec, pom.xml:28-31).
  */
class StatsSpec extends SparkSpec {

  private def fresh(): (KuduLikeCatalog, String, String => org.apache.spark.sql.DataFrame) = {
    val root = tmpDir("graft_stats_")
    val cat = new KuduLikeCatalog(spark, root)
    (cat, root, (s: String) => GraftSql.execute(spark, cat, s))
  }

  private def v2Stats(root: String, table: String) = {
    val df = spark.read.format("graft").option("root", root).load(table)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[SupportsReportStatistics]
    }.get
    scan.estimateStatistics()
  }

  test("analyze computes exact rowcount, nullcount, min/max, lengths; HLL ndv sane") {
    val (cat, _, sql) = fresh()
    sql("""CREATE TABLE t (id INT, v DOUBLE, tag STRING, d TIMESTAMP)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    sql("""INSERT INTO t VALUES
          |(1, 1.5, 'aa',   TIMESTAMP'2024-01-01 00:00:00'),
          |(2, 2.5, 'bbbb', TIMESTAMP'2024-02-01 00:00:00'),
          |(3, NULL, 'aa',  NULL),
          |(4, 4.0, NULL,   TIMESTAMP'2024-01-15 00:00:00')""".stripMargin)
    val st = cat.analyze("t")
    assert(st.numRows === 4L)
    val id = st.cols("id")
    assert(id.ndv === 4L && id.nullCount === 0L)
    assert(id.min === Some("1") && id.max === Some("4"))
    val v = st.cols("v")
    assert(v.nullCount === 1L && v.min === Some("1.5") && v.max === Some("4.0"))
    val tag = st.cols("tag")
    assert(tag.nullCount === 1L && tag.ndv === 2L)
    assert(tag.maxLen === Some(4L) && tag.avgLen === Some(3L)) // ceil((2+4+2)/3)
    assert(tag.min.isEmpty && tag.max.isEmpty) // strings: no range stats
    val d = st.cols("d")
    // TIMESTAMP min/max stored catalyst-internal: epoch MICROS (UTC — the
    // suite session zone), so the connector hands them back without
    // timezone or formatting round-trips
    def micros(s: String): String =
      (java.sql.Timestamp.valueOf(s).getTime * 1000L).toString
    assert(d.min === Some(micros("2024-01-01 00:00:00")))
    assert(d.max === Some(micros("2024-02-01 00:00:00")))
    // readback path
    assert(cat.statsOf("t") === Some(st))
  }

  test("any mutation or DDL stales the record; re-analyze refreshes") {
    val (cat, _, sql) = fresh()
    sql("""CREATE TABLE m (id INT, v INT)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    sql("INSERT INTO m VALUES (1, 10), (2, 20)")
    sql("ANALYZE TABLE m COMPUTE STATISTICS")
    assert(cat.statsOf("m").map(_.numRows) === Some(2L))
    // plain insert (no manifest write — version bump must be enough)
    sql("INSERT INTO m VALUES (3, 30)")
    assert(cat.statsOf("m") === None)
    sql("ANALYZE TABLE m COMPUTE STATISTICS")
    assert(cat.statsOf("m").map(_.numRows) === Some(3L))
    // DESCRIBE FORMATTED surfaces the fresh record
    val desc = sql("DESCRIBE FORMATTED m").collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(desc.get("numRows") === Some("3"))
    // DDL (manifest rewrite) stales too
    sql("ALTER TABLE m ADD COLUMN extra STRING")
    assert(cat.statsOf("m") === None)
    val st = cat.analyze("m")
    assert(st.cols.contains("extra") && st.cols("extra").nullCount === 3L)
    // compact (maintenance commit) stales as well
    sql("ANALYZE TABLE m COMPUTE STATISTICS")
    assert(cat.statsOf("m").isDefined)
    cat.compact("m")
    assert(cat.statsOf("m") === None)
  }

  test("connector reports analyzed rowcount + column stats; none once stale or filtered") {
    val (cat, root, sql) = fresh()
    sql("""CREATE TABLE c (id INT, name STRING)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    sql("INSERT INTO c VALUES (1,'x'),(2,'y'),(3,NULL)")
    // before analyze: size-only estimate
    assert(!v2Stats(root, "c").numRows().isPresent)
    sql("ANALYZE TABLE c COMPUTE STATISTICS")
    val st = v2Stats(root, "c")
    assert(st.numRows().getAsLong === 3L)
    val byName = st.columnStats()
    assert(byName.size() === 2)
    import scala.jdk.CollectionConverters._
    val m = byName.asScala.map { case (k, v) => k.describe() -> v }
    assert(m("id").distinctCount().getAsLong === 3L)
    assert(m("id").min().get() === 1 && m("id").max().get() === 3)
    assert(m("name").maxLen().getAsLong === 1L)
    assert(m("name").nullCount().getAsLong === 1L)
    def scanStats(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.scan.asInstanceOf[SupportsReportStatistics]
      }.get.estimateStatistics()
    // a pushed predicate makes the record not describe the scan output...
    val fScan = scanStats(spark.read.format("graft").option("root", root)
      .load("c").where(col("id") > 1))
    assert(!fScan.numRows().isPresent)
    // ...EXCEPT IsNotNull, which the record accounts for exactly: the
    // surviving-row count drops by the column's known null count and the
    // column's reported nullCount becomes 0 (so the residual Filter's
    // selectivity does not double-apply)
    val nnScan = scanStats(spark.read.format("graft").option("root", root)
      .load("c").where(col("name").isNotNull))
    assert(nnScan.numRows().getAsLong === 2L)
    val nnName = nnScan.columnStats().asScala
      .map { case (k, v) => k.describe() -> v }.apply("name")
    assert(nnName.nullCount().getAsLong === 0L)
    // mutation → connector silently falls back to size-only
    sql("INSERT INTO c VALUES (4,'w')")
    assert(!v2Stats(root, "c").numRows().isPresent)
  }

  test("CBO consumes the stats: logical plan rowCount and attribute ndv present") {
    val (_, root, sql) = fresh()
    sql("""CREATE TABLE cb (id INT, grp STRING)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    sql("INSERT INTO cb VALUES (1,'a'),(2,'a'),(3,'b'),(4,'b'),(5,'c')")
    sql("ANALYZE TABLE cb COMPUTE STATISTICS")
    withCbo {
      val df = spark.read.format("graft").option("root", root).load("cb")
      val rel = df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r
      }.get
      val stats = rel.stats
      assert(stats.rowCount === Some(BigInt(5)))
      val ndvById = stats.attributeStats.toSeq.map { case (a, cs) =>
        a.name -> cs.distinctCount
      }.toMap
      assert(ndvById("id") === Some(BigInt(5)))
      assert(ndvById("grp") === Some(BigInt(3)))
    }
  }

  test("SHOW COLUMN STATS lists the record in schema order; refuses stale loudly") {
    val (_, _, sql) = fresh()
    sql("""CREATE TABLE sc (id INT, name STRING)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    sql("INSERT INTO sc VALUES (1,'xx'),(2,'yyyy'),(3,NULL)")
    // never analyzed → loud refusal, not silent emptiness
    val e = intercept[graft.catalog.CatalogException](sql("SHOW COLUMN STATS sc"))
    assert(e.getMessage.contains("no fresh statistics"))
    sql("ANALYZE TABLE sc COMPUTE STATISTICS")
    val rows = sql("SHOW COLUMN STATS sc").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("id", "name")) // schema order
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("id").getLong(2) === 3L && byCol("id").getLong(3) === 0L)
    assert(byCol("id").getString(4) === "1" && byCol("id").getString(5) === "3")
    assert(byCol("name").getLong(3) === 1L) // one NULL
    assert(byCol("name").getString(7) === "4") // max byte length
    // a mutation stales the record → the verb refuses again
    sql("INSERT INTO sc VALUES (4,'w')")
    val e2 = intercept[graft.catalog.CatalogException](sql("SHOW COLUMN STATS sc"))
    assert(e2.getMessage.contains("no fresh statistics"))
  }

  test("CBO join cardinality: ndv-based estimate |A||B|/max(ndv), not a blind product") {
    val (_, root, sql) = fresh()
    sql("""CREATE TABLE fact (id INT, k INT)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    sql("""CREATE TABLE dim (k INT, label STRING)
          |TBLPROPERTIES('kudu.key_columns'='k')""".stripMargin)
    // 50 fact rows over 5 distinct keys; 5 dim rows — HLL is exact at this
    // cardinality, so the estimate is deterministic: 50*5/max(5,5) = 50
    sql("INSERT INTO fact SELECT id, CAST(id % 5 AS INT) AS k FROM " +
      "(SELECT explode(sequence(1, 50)) AS id)")
    sql("INSERT INTO dim SELECT k, concat('v', k) FROM " +
      "(SELECT explode(sequence(0, 4)) AS k)")
    sql("ANALYZE TABLE fact COMPUTE STATISTICS")
    sql("ANALYZE TABLE dim COMPUTE STATISTICS")
    withCbo {
      val fact = spark.read.format("graft").option("root", root).load("fact")
      val dim = spark.read.format("graft").option("root", root).load("dim")
      val joined = fact.join(dim, "k")
      assert(joined.queryExecution.optimizedPlan.stats.rowCount === Some(BigInt(50)))
    }
  }

  test("WITH HISTOGRAM: equi-height record shape, eligibility, and round trip") {
    val (cat, _, sql) = fresh()
    sql("""CREATE TABLE h (id INT, v BIGINT, tag STRING)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    // 90% of v mass at 0, a sparse tail spread over (0, 1000]
    sql("""INSERT INTO h SELECT id,
          |  CAST(CASE WHEN id % 10 = 0 THEN id * 2 ELSE 0 END AS BIGINT) AS v,
          |  concat('t', id % 3) AS tag
          |FROM (SELECT explode(sequence(1, 500)) AS id)""".stripMargin)
    sql("ANALYZE TABLE h COMPUTE STATISTICS WITH HISTOGRAM")
    val st = cat.statsOf("h").get
    val hv = st.cols("v").histogram.get
    assert(hv.bins.length === 32)
    assert(hv.height === 500.0 / 32) // nonNull / bins BY CONSTRUCTION
    // endpoints non-decreasing, spanning exactly [min, max]
    assert(hv.bins.head._1 === 0.0 && hv.bins.last._2 === 1000.0)
    hv.bins.foreach { case (lo, hi, _) => assert(lo <= hi) }
    hv.bins.sliding(2).foreach { case Seq(a, b) => assert(a._2 === b._1); case _ => }
    // the skew is VISIBLE: most bins collapse onto the heavy value 0
    assert(hv.bins.count { case (lo, hi, _) => lo == 0.0 && hi == 0.0 } >= 16)
    // strings never get histograms; the key column does
    assert(st.cols("tag").histogram.isEmpty)
    assert(st.cols("id").histogram.isDefined)
    // plain ANALYZE stays one-pass and histogram-free
    sql("ANALYZE TABLE h COMPUTE STATISTICS")
    assert(cat.statsOf("h").get.cols("v").histogram.isEmpty)
  }

  test("histogram reaches catalyst and sharpens skewed range selectivity") {
    val (cat, root, sql) = fresh()
    sql("""CREATE TABLE sk (id INT, v BIGINT)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    // 900 rows of v=0, 100 rows spread over (0, 1000]: a `v > 500`
    // filter truly keeps ~50 rows; the uniform min/max assumption says 500
    sql("""INSERT INTO sk SELECT id,
          |  CAST(CASE WHEN id % 10 = 0 THEN id ELSE 0 END AS BIGINT) AS v
          |FROM (SELECT explode(sequence(1, 1000)) AS id)""".stripMargin)
    def estimate(): BigInt = withCboEstimate {
      // v > 500 OR v = -1: the Or keeps the predicate OUT of the scan's
      // pushed set (estimateStatistics only reports the record for
      // unfiltered scans), so FilterEstimation sees the full column stats
      val df = spark.read.format("graft").option("root", root).load("sk")
        .filter(col("v") > 500L || col("v") === -1L)
      df.queryExecution.optimizedPlan.stats.rowCount.get
    }
    sql("ANALYZE TABLE sk COMPUTE STATISTICS")
    val uniform = estimate()
    sql("ANALYZE TABLE sk COMPUTE STATISTICS WITH HISTOGRAM")
    // histogram flows through the connector's columnStats
    withCboEstimate {
      val rel = spark.read.format("graft").option("root", root).load("sk")
        .queryExecution.optimizedPlan.collectFirst {
          case r: DataSourceV2ScanRelation => r
        }.get
      val hist = rel.stats.attributeStats.collectFirst {
        case (a, cs) if a.name == "v" => cs.histogram
      }.flatten
      assert(hist.isDefined, "catalyst ColumnStat must carry the histogram")
      assert(hist.get.bins.length === 32)
      BigInt(0)
    }
    val sharpened = estimate()
    // uniform assumption: ~ (1000-500)/1000 of rows ≈ 500; with the
    // histogram the estimate follows the actual mass (~50). Demand a 3x
    // improvement, not exact values — approx percentiles may wobble.
    assert(uniform > sharpened * 3,
      s"histogram must sharpen the skewed estimate: uniform=$uniform hist=$sharpened")
    assert(sharpened < BigInt(200), s"mass-based estimate too high: $sharpened")
  }

  test("ANALYZE stats FLIP a plan: CBO reorders a 3-way join only when stats exist") {
    val (_, root, sql) = fresh()
    // star shape where the WRITTEN order is suboptimal: fact(10k) joins
    // wide dim d1 (1000 rows, FK 1:10 — join keeps all 10k) before
    // selective dim d2 (2 of fact's 10 k2 values — join keeps ~2k).
    sql("""CREATE TABLE fact (id INT, k1 INT, k2 INT)
          |TBLPROPERTIES('kudu.key_columns'='id')""".stripMargin)
    sql("""CREATE TABLE d1 (k1 INT, a STRING)
          |TBLPROPERTIES('kudu.key_columns'='k1')""".stripMargin)
    sql("""CREATE TABLE d2 (k2 INT, b STRING)
          |TBLPROPERTIES('kudu.key_columns'='k2')""".stripMargin)
    sql("INSERT INTO fact SELECT id, CAST(id % 1000 AS INT), CAST(id % 10 AS INT) " +
      "FROM (SELECT explode(sequence(1, 10000)) AS id)")
    sql("INSERT INTO d1 SELECT k1, concat('a', k1) FROM " +
      "(SELECT explode(sequence(0, 999)) AS k1)")
    sql("INSERT INTO d2 SELECT k2, concat('b', k2) FROM " +
      "(SELECT explode(sequence(0, 1)) AS k2)")

    def leafOrder(): Seq[String] = {
      val fact = spark.read.format("graft").option("root", root).load("fact")
      val da = spark.read.format("graft").option("root", root).load("d1")
      val db = spark.read.format("graft").option("root", root).load("d2")
      val q = fact.join(da, "k1").join(db, "k2")
        .groupBy("b").agg(count(lit(1)).as("n"))
      q.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation =>
          // identify the leaf by the scan's own description (column sets
          // are unreliable here — pruning strips non-join columns)
          "table=(\\w+)".r.findFirstMatchIn(r.scan.description())
            .map(_.group(1)).getOrElse("?")
      }
    }

    withCboReorder {
      // stats absent: rowCount is unreported, CostBasedJoinReorder cannot
      // engage, the join tree stays exactly as written — d1 before d2
      val unanalyzed = leafOrder()
      assert(unanalyzed === Seq("fact", "d1", "d2"),
        s"without stats the written order must survive: $unanalyzed")

      sql("ANALYZE TABLE fact COMPUTE STATISTICS")
      sql("ANALYZE TABLE d1 COMPUTE STATISTICS")
      sql("ANALYZE TABLE d2 COMPUTE STATISTICS")

      // stats present: the ndv-based cardinalities (fact⋈d2 ≈ 2k vs
      // fact⋈d1 = 10k) make the selective join cheaper first — the
      // optimizer must REORDER, proving stats change real decisions
      val analyzed = leafOrder()
      assert(analyzed !== unanalyzed,
        s"ANALYZE must flip the join order: still $analyzed")
      assert(analyzed.indexOf("d2") < analyzed.indexOf("d1"),
        s"the selective dim must join first with stats present: $analyzed")
    }
  }

  /** cbo + joinReorder on, both restored after. */
  private def withCboReorder(f: => Unit): Unit = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def withCboEstimate(f: => BigInt): BigInt = {
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try f finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  private def withCbo(f: => Unit): Unit = {
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try f finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }
}
