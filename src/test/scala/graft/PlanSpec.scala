package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the properties that make these queries hold at
  * 100 TB (SURVEY.md §4): projection/predicate pushdown into the parquet
  * scan, broadcast of dimension tables, map-side partial aggregation, and
  * top-k without a total sort. If a refactor regresses one of these, the
  * query still returns correct rows at test scale but stops scaling; these
  * tests make that regression loud.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val q = SparkEntry.all.find(_.name == name).get
    q.fn(spark, sf).queryExecution.explainString(FormattedMode)
  }

  test("S2: column pruning reaches the scan (2 of 6 orders columns read)") {
    val p = planOf("s2_projection_pushdown")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderpriority:string>"), p)
  }

  test("S4: predicate pushdown reaches the parquet scan") {
    val p = planOf("s4_predicate_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(o_totalprice"), p)
  }

  test("S3: key-range predicates push down to row-group pruning") {
    val p = planOf("s3_key_range_scan")
    assert(p.contains("GreaterThanOrEqual(l_orderkey,100)") &&
      p.contains("LessThanOrEqual(l_orderkey,200)"), p)
  }

  test("J2: explicit broadcast of the dimension produces a BroadcastHashJoin") {
    val p = planOf("j2_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("J11: salted join shuffles — the ×salts exploded side is never broadcast") {
    // Salting spreads a SHUFFLE; if Catalyst broadcasts the exploded thin
    // side instead (its pre-explode size estimate looks broadcastable), the
    // salt is pure overhead locally and an OOM at scale. The operator pins
    // SHUFFLE_HASH — assert the pin reaches the physical plan.
    val p = planOf("j11_salted_join")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("J7: star join broadcasts the small dims, never shuffles them as build sides") {
    val p = planOf("j7_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("A2/A3: aggregation is partial (map-side) then final — one exchange") {
    val p = planOf("a3_sum_avg_min_max")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange"), p)
  }

  test("O2: top-k plans TakeOrderedAndProject, not a total sort") {
    val p = planOf("o2_top_k")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("whole-stage codegen covers the scan→filter→project pipeline") {
    val q = SparkEntry.all.find(_.name == "p6_filter_boolean_ops").get
    val p = q.fn(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen"), p.take(500))
  }

  test("S6 insert: existing-keys side of the anti-join reads only key columns") {
    // The anti-join's right side must scan just the key, not whole rows.
    import graft.catalog.{KuduLikeCatalog, TableDef}
    import spark.implicits._
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_plan_"))
    cat.createTable(TableDef("t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))),
      Seq("id")))
    cat.insert("t", Seq((1, "a")).toDF("id", "payload"))
    // capture the plan the second insert builds for its anti-join
    val batch = Seq((1, "x"), (2, "y")).toDF("id", "payload")
    val existingKeys = cat.table("t").select("id")
    val plan = batch.join(existingKeys, Seq("id"), "left_anti")
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("ReadSchema: struct<id:int>"), plan)
  }

  test("J8 range join is an equi-join on the key with a range residual, not a cross product") {
    val p = planOf("j8_range_join")
    // any hash/sort-merge equi join is fine; BroadcastNestedLoopJoin is not
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("J9 as-of join is a single window pass: no join operator at all") {
    val p = planOf("j9_asof_join")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("Q17: part filter pushed to scan; per-part average computed on the semi-restricted slice only") {
    val p = planOf("tpch_q17")
    assert(p.contains("EqualTo(p_brand,Brand#23)") && p.contains("LessThan(p_size,5)"), p)
    // both lineitem passes are cut down by a LeftSemi BEFORE any aggregate —
    // the pre-agg must never run over the whole fact table
    assert("BroadcastHashJoin LeftSemi".r.findAllIn(p).size === 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("Q19: disjunctive brand/size predicate prunes part at the scan; join stays broadcast") {
    val p = planOf("tpch_q19")
    assert(p.contains("Or(And(EqualTo(p_brand,Brand#12)"), p)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("Q22: global average is a broadcast nested-loop of ONE row, then a broadcast anti join") {
    val p = planOf("tpch_q22")
    // the 1-row cross join is the sanctioned BNLJ; the anti join must hash
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin LeftAnti") || p.contains("SortMergeJoin LeftAnti"), p)
  }

  test("D24: decontamination never shuffles training payloads — eval shingles broadcast, one agg exchange") {
    val p = planOf("d24_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // no Window over the training side, and text never appears post-explode:
    // only (doc_id, g) flow into the join
    assert(!p.contains("Window"), p)
  }

  test("D37/D38: quantization and chunking are narrow per-row maps — the " +
    "only exchange is the oracle gate's final ordering") {
    for (name <- Seq("d37_embed_quantize", "d38_chunk_overlap")) {
      val p = planOf(name)
      // no join, no window, no aggregation exchange: the operator itself
      // never shuffles; at 100 TB it is a single pass over the corpus
      assert(!p.contains("Join"), s"$name: $p")
      assert(!p.contains("Window"), s"$name: $p")
      // formatted mode prints each node in the tree AND a details section —
      // count the numbered detail headers, one per physical node
      assert("""\(\d+\) Exchange""".r.findAllIn(p).size === 1,
        s"$name: one sort exchange only\n$p")
    }
    assert(planOf("d38_chunk_overlap").contains("Generate"), "posexplode fan-out")
  }

  test("runtime bloom-filter injection prunes the fact side of a selective shuffle join") {
    // At 100 TB the fact scan of a selective shuffle join is the cost; Spark's
    // InjectRuntimeFilter builds a bloom filter from the filtered (small) side
    // and semi-filters fact rows BEFORE the shuffle. Fixture sizes sit under
    // the production thresholds, so the test pins them down — the assertion is
    // about the rewrite being available to this engine's plans, not about
    // default thresholds.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val ord = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val p = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("might_contain"), p.take(2000))
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("D14: dedup rep-selection is pure aggregation — no window, no join") {
    val p = planOf("d14_clean_corpus_pipeline")
    // round-1 hash-partitioned every payload byte twice through Window; the
    // semi-join variant re-evaluated the upstream scan per join side. The
    // min_by formulation is scan → partial agg → exchange per stage: map-side
    // combine keeps one candidate row per (key, partition), so shuffle volume
    // SHRINKS with duplication
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("min_by"), p)
  }

  test("Q11: the global total rides back as a ONE-row broadcast, never a collect or wide cartesian") {
    val p = planOf("tpch_q11")
    // value > total * 0.001 compares every aggregated row against a scalar;
    // the scalar is a 1-row frame broadcast into a nested-loop join (the
    // no-collect pattern) — a real CartesianProduct here would be quadratic
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // and the nation-restricted supplier set reaches lineitem as a
    // broadcast semi join, not a shuffle
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("S28/S29: LIMIT and TopN reach the connector scan as pushdowns") {
    // the declared queries themselves, not just LimitPushdownSpec's
    // synthetic tables — a regression that silently stops offering the
    // pushdown turns LIMIT 10 back into a full-scan plan at 100 TB
    val p28 = planOf("s28_limit_pushdown")
    assert(p28.contains("PushedLimit: 1000"), p28)
    val p29 = planOf("s29_topn_pushdown")
    assert(p29.contains("PushedTopN: ORDER BY ts ASC LIMIT 50"), p29)
  }

  test("Q21: EXISTS/NOT EXISTS compile to semi/anti joins — no subquery re-scan per row") {
    val p = planOf("tpch_q21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // supplier+nation fold into one broadcast; the wide side shuffles only
    // (orderkey, suppkey)-shaped keys, never payloads
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("A9 exact median: full data meets only a hash aggregate, never a value-buffering agg") {
    val p = planOf("a9_median")
    // the builtin median()/percentile() plans an ObjectHashAggregate whose
    // partials are whole value arrays — one executor's heap per group; the
    // histogram formulation's only full-data operator is a codegen
    // HashAggregate, and the windows run over distinct values per group
    assert(!p.contains("ObjectHashAggregate"), p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Window"), p)
  }

  test("scale-killer sweep: non-equi join operators appear ONLY where documented") {
    // The automated version of the per-round plan audit. A CartesianProduct
    // or BroadcastNestedLoopJoin is the physical shape of a join with no
    // equi-key — O(n*m) work — and is a 100-TB scale killer anywhere except
    // two documented categories:
    //  - bounded brute-force baselines: the exact-answer companions of the
    //    bucketed LSH/IVF scale paths, always over an explicitly bounded
    //    slice (d3/d12/d21/j10 filter vec_id first; j6 IS the J6 cross+theta
    //    operator);
    //  - one-row scalar broadcasts: a global aggregate riding back as a
    //    1-row broadcast instead of a driver collect (tpch_q11/q22 global
    //    thresholds, d27's corpus count for idf, d41's vocabulary size) —
    //    the no-collect pattern the dedicated pins above assert;
    //  - k-row centroid broadcasts: KMeans.assignBySeeds joins every row to
    //    ALL k seed centroids to take an argmin (d43) — k·dim is
    //    metadata-sized by construction, and the per-row k-scan IS the
    //    assignment's intrinsic cost (identical to the literal-centroid
    //    fold), so the BNLJ shape is the correct plan, not an accident.
    // SET EQUALITY (not subset) keeps the list honest in both directions: a
    // new accidental cross join fails loudly, and an entry whose plan stops
    // being non-equi must be removed.
    val documented = Set(
      "j6_cross_theta_join", "d12_knn_bruteforce", "d21_embedding_neardup",
      "d3_cosine_topk", "j10_similarity_self_join", // bounded brute-force
      "tpch_q11", "tpch_q22", "d27_tfidf_topk", // 1-row scalar broadcasts
      "d41_bigram_predictability", // 1-row vocabulary-size broadcast
      "d44_curation_pipeline", // composes d41 → same 1-row vocab broadcast
      "d43_semantic_dedup", // k-row centroid broadcast (argmin assignment)
      "d47_dsir_weights", // 1-row gram-total broadcast onto the 64-row bucket table
      // 1-row totals broadcast (w_tot, seats) + the P^2 triangular offset
      // self-join over the P-row partition summary — round-15's
      // distributed-rank replacement for the unpartitioned window
      "d49_temperature_mix",
      // the same P^2 triangular offset self-join, twice (the shared
      // operators/DistributedRank replaced q49s's two unpartitioned
      // rank() windows in round 16)
      "tpcds_q49s_return_ratio_ranks",
      // broadcast centroid join (cells rows) for query cell assignment +
      // the 1-row totals of the exact-display re-rank
      "d54_standing_embedding_index"
    )
    // the three write-path queries EXECUTE real ingest work inside q.fn
    // (catalog inserts / CTAS / overwrite) before returning the readback
    // frame — running them here just to read a plan string would do three
    // full write workloads per sweep. Their plans are pinned by the
    // dedicated S6/write-path tests; the readback SELECTs cannot introduce
    // a join at all.
    val writePath = Set("s6_insert_dup_ignore", "s12_ctas", "s13_insert_overwrite",
      "s14_dsv2_connector_read", "s15_connector_write")
    val offenders = SparkEntry.all.filterNot(q => writePath(q.name)).map { q =>
      q.name -> q.fn(spark, sf).queryExecution.explainString(FormattedMode)
    }.collect { case (n, p)
      if p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin") => n }.toSet
    assert(offenders === documented,
      s"unexpected non-equi join in: ${(offenders -- documented).toSeq.sorted.mkString(", ")}; " +
        s"stale allowlist entries: ${(documented -- offenders).toSeq.sorted.mkString(", ")}")
  }

  test("DSv2 seam: pushdown survives the connector path (filters + pruned schema in the scan)") {
    // the connector-shaped storage read (graft.sources.GraftDataSource) must
    // keep the same plan properties the path-wired reads are pinned to above
    import org.apache.spark.sql.types._
    val root = tmpDir("graft_plan_dsv2_")
    val cat = new graft.catalog.KuduLikeCatalog(spark, root)
    cat.createTable(graft.catalog.TableDef("t",
      StructType(Seq(StructField("id", LongType), StructField("grp", StringType),
        StructField("v", DoubleType))), Seq("id"), buckets = 4))
    import spark.implicits._
    cat.insert("t", (0 until 100).map(i => (i.toLong, s"g${i % 3}", i * 2.0))
      .toDF("id", "grp", "v"))
    val q = spark.read.format("graft").option("root", root).load("t")
      .filter(col("v") > 50.0).select("id", "v")
    val p = q.queryExecution.explainString(FormattedMode)
    assert(p.contains("GraftScan"), p)
    assert(p.contains("GreaterThan(v,50.0)"), p)
    val read = p.split("ReadSchema: ")(1)
    assert(read.contains("id") && read.contains("v") && !read.contains("grp"), p)
    assert(q.count() === 74)
  }
}
