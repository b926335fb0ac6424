package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties for the storage semantics
  * (SURVEY.md §5.3): dup-ignore insert counts, idempotence, and
  * deterministic survivor over arbitrary keyed batches. (Generators are
  * sampled directly — the scalatest/scalacheck bridge artifact is not
  * among the pinned deps.)
  */
class PropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  private val batchGen: Gen[List[(Int, String)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 19), Gen.alphaStr.map(_.take(6))))

  test("property: as-of join equals brute force on random event sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pairGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 5000L), Gen.choose(0L, 5000L)))
    (1 to 4).foreach { i =>
      val rows = pairGen.apply(Gen.Parameters.default, Seed(99L + i)).get
      val left = rows.take(60).zipWithIndex
        .map { case ((u, t, _), id) => (id.toLong, u, new java.sql.Timestamp(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rows.drop(60)
        .map { case (u, _, t) => (u, new java.sql.Timestamp(t)) }
        .toDF("user_id", "ts")
      val viaOp = graft.operators.AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("ts" -> "m_ts")).select("event_id", "m_ts")
      val brute = left.as("l").join(right.as("r"),
          col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"), "left")
        .groupBy(col("l.event_id").as("event_id"))
        .agg(max(col("r.ts")).as("m_ts"))
      assert(viaOp.exceptAll(brute).count() === 0, s"iteration $i op-extra")
      assert(brute.exceptAll(viaOp).count() === 0, s"iteration $i brute-extra")
    }
  }

  test("property: random mutation sequences match an in-memory model, snapshots included") {
    import spark.implicits._
    (1 to 2).foreach { iter =>
      val cat = new KuduLikeCatalog(spark, tmpDir("graft_model_"))
      cat.createTable(TableDef("t", schema, Seq("id"),
        buckets = if (iter % 2 == 0) 4 else 0))
      val rnd = new scala.util.Random(1234 + iter)
      def batch() = List.fill(8)((rnd.nextInt(12), rnd.nextInt(1000).toString))

      var model = Map.empty[Int, String]
      // the value column's CURRENT name — RENAME COLUMN flips it mid-run,
      // and every later batch must speak the renamed schema
      var vName = "v"
      // tableAsOf(v) is only stable while version numbering is stable —
      // base appends (insert with no pending deltas) and compact() both
      // change what version 0 means, so snapshots re-baseline there
      var deltasExist = false
      val snapshots = scala.collection.mutable.ArrayBuffer[(Int, Map[Int, String])]()

      (1 to 12).foreach { step =>
        rnd.nextInt(11) match {
          case 0 => // INSERT: only keys not live land; in-batch survivor = min v
            val b = batch()
            val newRows = b.groupBy(_._1).collect {
              case (k, vs) if !model.contains(k) => (k, vs.map(_._2).min)
            }
            val n = cat.insert("t", b.toDF("id", vName))
            assert(n === newRows.size, s"iter $iter step $step insert count")
            model ++= newRows
            if (!deltasExist) snapshots.clear() // landed in the base
          case 1 => // UPSERT: every key in the batch replaced
            val b = batch()
            cat.upsert("t", b.toDF("id", vName))
            model ++= b.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }
            deltasExist = true
          case 2 => // DELETE by key predicate
            val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
            val n = cat.delete("t", org.apache.spark.sql.functions.col("id") % m === r)
            val hit = model.keySet.filter(k => k % m == r)
            assert(n === hit.size, s"iter $iter step $step delete count")
            model --= hit
            if (n > 0) deltasExist = true
          case 3 => // COMPACT: state invariant, folds versions away
            cat.compact("t")
            deltasExist = false
            snapshots.clear()
          case 4 => // OVERWRITE: truncate-and-load, in-batch survivor = min v
            val b = batch()
            val n = cat.overwrite("t", b.toDF("id", vName))
            model = b.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }
            assert(n === model.size, s"iter $iter step $step overwrite count")
            deltasExist = false // layers discarded with the old contents
            snapshots.clear() // version numbering re-baselines
          case 5 => // Z-ORDER COMPACT: layout-only, same model effect as compact
            cat.compactZOrdered("t", Seq("id", vName))
            deltasExist = false
            snapshots.clear()
          case 6 => // VACUUM: reclaims dead storage, state invariant
            cat.vacuum("t")
          case 7 => // maybeCompact: compacts iff layers exceed the threshold
            val ran = cat.maybeCompact("t", maxPendingLayers = 1)
            if (ran) { deltasExist = false; snapshots.clear() }
          case 8 => // RENAME COLUMN: state-invariant modulo the name;
            // folds deltas + rewrites the base, so it re-baselines like
            // compact, and every later batch must use the new schema
            val next = if (vName == "v") "w" else "v"
            cat.renameColumn("t", vName, next)
            vName = next
            assert(cat.schemaOf("t").fieldNames.toSeq === Seq("id", vName))
            deltasExist = false
            snapshots.clear()
          case 9 => // RESTORE: truncate history to a recorded stable snapshot —
            // the model rolls back with it; later snapshots become history
            // that never happened
            if (snapshots.nonEmpty) {
              val (v, m) = snapshots(rnd.nextInt(snapshots.size))
              cat.restoreTable("t", v)
              model = m
              snapshots.filterInPlace(_._1 <= v)
              // the restored-to snapshot was recorded with pending deltas,
              // so layers ≤ v survive the truncation
            }
          case 10 => // CLONE: zero-copy branch equals the model; source invariant
            val dst = s"branch_$step"
            cat.cloneTable("t", dst)
            val got = cat.table(dst).collect()
              .map(x => (x.getInt(0), x.getString(1))).toSet
            assert(got === model.toSet, s"iter $iter step $step clone state")
            cat.dropTable(dst)
        }
        if (deltasExist) snapshots += ((cat.currentVersion("t"), model))
        val got = cat.table("t").collect().map(x => (x.getInt(0), x.getString(1))).toSet
        assert(got === model.toSet, s"iter $iter step $step state")
      }
      // every stable snapshot replays exactly
      snapshots.foreach { case (v, m) =>
        val got = cat.tableAsOf("t", v).collect()
          .map(x => (x.getInt(0), x.getString(1))).toSet
        assert(got === m.toSet, s"iter $iter snapshot v$v")
      }
      // the seeded draw may never hit case 8 — exercise rename explicitly
      // (after the snapshot replay: a rename re-baselines version numbering)
      val next = if (vName == "v") "w" else "v"
      cat.renameColumn("t", vName, next)
      vName = next
      val renamed = cat.table("t").collect()
        .map(x => (x.getInt(0), x.getString(1))).toSet
      assert(renamed === model.toSet, s"iter $iter post-rename state")
      assert(cat.schemaOf("t").fieldNames.toSeq === Seq("id", vName))
    }
  }

  test("property: incremental agg tracks random upsert/delete sequences exactly") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    val schema3 = StructType(Seq(
      StructField("id", IntegerType), StructField("grp", StringType),
      StructField("v", DoubleType)))
    (1 to 2).foreach { iter =>
      val cat = new KuduLikeCatalog(spark, tmpDir("graft_iagg_"))
      cat.createTable(TableDef("t", schema3, Seq("id")))
      val rnd = new scala.util.Random(777 + iter)
      def grp() = s"g${rnd.nextInt(4)}"
      // bootstrap lands in the BASE (version 0); only versioned mutations after
      cat.insert("t", List.tabulate(8)(i => (i, grp(), rnd.nextInt(100).toDouble))
        .toDF("id", "grp", "v"))
      var maintained = IncrementalAgg.recompute(cat.table("t"), Seq("grp"), "v")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq // pin the bootstrap so later deltas can't recompute through it
      var prev = cat.currentVersion("t")
      val epoch = cat.baseEpoch("t")
      (1 to 8).foreach { step =>
        if (rnd.nextBoolean()) {
          // upserts move keys between groups and change values
          cat.upsert("t", List.fill(5)((rnd.nextInt(12), grp(), rnd.nextInt(100).toDouble))
            .toDF("id", "grp", "v"))
        } else {
          val m = 2 + rnd.nextInt(3)
          cat.delete("t", org.apache.spark.sql.functions.col("id") % m === rnd.nextInt(m))
        }
        val cur = cat.currentVersion("t")
        val prevDf = maintained.toDF("grp", "n", "total")
        maintained = IncrementalAgg.merge(prevDf,
          IncrementalAgg.delta(cat, "t", prev, cur, epoch, Seq("grp"), "v"), Seq("grp"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        prev = cur
        val truth = IncrementalAgg.recompute(cat.table("t"), Seq("grp"), "v")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        assert(maintained.toSet === truth, s"iter $iter step $step")
      }
      // stale window after compact fails loudly instead of reading empty
      if (prev > 0) {
        cat.compact("t")
        val e = intercept[IllegalArgumentException] {
          IncrementalAgg.delta(cat, "t", 0, prev, epoch, Seq("grp"), "v")
        }
        assert(e.getMessage.contains("re-bootstrap"))
      }
    }
  }

  test("property: insert lands exactly the distinct keys; re-insert adds nothing") {
    import spark.implicits._
    (1 to 6).foreach { i =>
      val batch = batchGen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val cat = new KuduLikeCatalog(spark, tmpDir("graft_prop_"))
      cat.createTable(TableDef("t", schema, Seq("id")))
      val df = batch.toDF("id", "v")
      val inserted = cat.insert("t", df)
      assert(inserted === batch.map(_._1).distinct.size, s"iteration $i")
      assert(cat.insert("t", df) === 0, s"iteration $i re-insert")
      assert(cat.table("t").count() === inserted)
      // survivor per key is deterministic: min by non-key column
      val expect = batch.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }.toSet
      val got = cat.table("t").collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(got === expect, s"iteration $i survivors")
    }
  }
}
