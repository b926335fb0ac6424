package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer contracts: the textbook merge sequence on the Sennrich
  * toy corpus, lossless round-trip, partitioning-independent training,
  * and the column expression's agreement with the driver-side encoder.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the textbook merges on the Sennrich toy corpus") {
    // the ACL-2016 running example: low x5, lower x2, newest x6, widest x3
    val corpus = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).toDF("text")
    val model = Bpe.train(corpus, "text", numMerges = 4, topWords = 100)
    // ('e','s') 9 beats everything; then ('es','t') 9; then ('est','</w>')
    // 9; the next tier is l-o (7) vs lo-w (after l-o merges)
    assert(model.merges.take(3) ===
      Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow)))
    assert(model.merges(3) === ("l", "o"))
    // encoding replays training: 'newest' collapses through est
    assert(model.encodeWord("newest") === Seq("n", "e", "w", "est" + Bpe.Eow)
      || model.encodeWord("newest") === Seq("n", "e", "w", "est", Bpe.Eow))
  }

  test("round-trip: token concat reproduces the word stream") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val model = Bpe.train(docs, "text", numMerges = 150, topWords = 5000)
    val rows = docs.select(col("doc_id"), lower(col("text")).as("t"),
      model.encode(col("text")).as("toks")).collect()
    rows.foreach { r =>
      val expect = r.getString(1).split("\\s+").filter(_.nonEmpty).mkString(" ")
      val got = r.getSeq[String](2).mkString("")
        .replace(Bpe.Eow, " ").trim
      assert(got === expect, s"round-trip failed for doc ${r.getLong(0)}")
    }
  }

  test("training is partitioning-independent (exact histogram, total tie-break)") {
    val docs = Tables.load(spark, sf, "documents").limit(300)
    val m1 = Bpe.train(docs.repartition(1), "text", numMerges = 100, topWords = 3000)
    val m16 = Bpe.train(docs.repartition(16), "text", numMerges = 100, topWords = 3000)
    assert(m1.merges === m16.merges)
  }

  test("column expression agrees with the driver-side encoder") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val model = Bpe.train(docs, "text", numMerges = 80, topWords = 2000)
    val viaCol = docs.select(col("doc_id"), model.encode(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val expected = Bpe.words(r.getString(1)).flatMap(w => model.encodeWord(w)).toSeq
      assert(viaCol(r.getLong(0)) === expected)
    }
  }

  test("more merges means fewer tokens; zero merges is characters") {
    val docs = Tables.load(spark, sf, "documents").limit(100)
    val m0 = Bpe.Model(Seq.empty)
    val m200 = Bpe.train(docs, "text", numMerges = 200, topWords = 5000)
    val counts = docs.select(
      size(m0.encode(col("text"))).as("n0"),
      size(m200.encode(col("text"))).as("n200"))
      .agg(sum("n0").as("n0"), sum("n200").as("n200")).head()
    assert(counts.getLong(1) < counts.getLong(0),
      s"merges did not compress: ${counts.getLong(1)} !< ${counts.getLong(0)}")
  }

  test("token ids: vocab-stable encoding, lossless decode, prefix stability") {
    val docs = Tables.load(spark, sf, "documents").limit(150)
    val model = graft.operators.Bpe.train(docs, "text", numMerges = 120, topWords = 4000)
    assert(model.vocabSize >= 257, "vocab must cover the byte range + Eow")
    val rows = docs.select(col("doc_id"), lower(col("text")).as("t"),
      model.encodeIds(col("text")).as("ids"),
      model.encode(col("text")).as("toks")).collect()
    rows.foreach { r =>
      val ids = r.getSeq[Int](2)
      val toks = r.getSeq[String](3)
      // ids are exactly the tokens mapped through the vocab
      assert(ids === toks.map(t => model.vocab.getOrElse(t, 0)))
      // decode round-trips the word stream
      val expect = r.getString(1).split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(model.decodeIds(ids) === expect, s"decode failed for doc ${r.getLong(0)}")
    }
    // prefix stability: a model with MORE merges keeps every existing id
    val bigger = graft.operators.Bpe.train(docs, "text", numMerges = 160, topWords = 4000)
    assert(bigger.merges.take(120) === model.merges)
    model.vocab.foreach { case (tok, id) =>
      assert(bigger.vocab(tok) === id, s"id of '$tok' drifted under vocab growth")
    }
  }

  test("composition: BPE ids feed sequence packing with real token budgets") {
    // the actual training-prep chain: train tokenizer -> encode ids ->
    // pack per-shard sequences under a REAL token budget (not a regex
    // proxy). Pack boundaries must respect the budget and preserve order.
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val model = graft.operators.Bpe.train(docs, "text", numMerges = 100, topWords = 4000)
    val budget = 512
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = docs
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(model.encodeIds(col("text"))).as("toks"))
      .withColumn("seq",
        floor((sum(col("toks")).over(w) - col("toks")) / lit(budget)))
      .collect()
    assert(packed.nonEmpty)
    // per (shard, seq): the packed tokens before the LAST doc fit the
    // budget (the last doc may overflow into opening the next sequence)
    packed.groupBy(r => (r.getLong(1), r.getLong(3))).foreach { case (_, rs) =>
      val toks = rs.sortBy(_.getLong(0)).map(_.getInt(2))
      assert(toks.init.sum < budget,
        s"a sequence closed over budget: ${toks.mkString(",")}")
    }
    // determinism: same model + data -> same packing under any partitioning
    val again = docs.repartition(7)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(model.encodeIds(col("text"))).as("toks"))
      .withColumn("seq",
        floor((sum(col("toks")).over(w) - col("toks")) / lit(budget)))
      .collect()
    assert(again.map(_.toString).sorted.toSeq === packed.map(_.toString).sorted.toSeq)
  }
}
