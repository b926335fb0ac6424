package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Edge-input robustness for the text operators: unicode (CJK, accents,
  * emoji), empty strings, single tokens, shingle guards — inputs a 100-TB
  * web corpus will definitely contain even though the fixtures don't.
  */
class TextEdgeSpec extends SparkSpec {

  private def textsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private val edgeTexts = Seq(
    "",                       // empty
    "one",                    // single token, shorter than char-8-gram
    "的 是 在 了 的 是",       // CJK tokens (zh stopwords)
    "café naïve übung émigré", // accents / non-ASCII letters
    "a b",                    // below every shingle width
    "x 🙂 y 🙂 z",            // emoji tokens
    ("tok " * 200).trim)      // long doc

  test("token/shingle/fingerprint expressions never throw on edge inputs") {
    val df = textsDf(edgeTexts).select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      TextFunctions.bpeTokenCount(col("text")).as("n_bpe"),
      size(TextFunctions.wordShingles(col("text"), 3)).as("n_sh3"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.simhash16(col("text")).as("sh"),
      TextFunctions.langId(col("text")).as("lang"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length === edgeTexts.length)
    // columns: 0=doc_id 1=n_tok 2=n_bpe 3=n_sh3 4=fp 5=sh 6=lang
    // empty text: split gives one empty token; zero 3-gram shingles
    assert(rows(0).getInt(3) === 0, "empty text must have no trigram shingles")
    assert(rows(4).getInt(3) === 0, "2-token text must have no trigram shingles")
    // CJK text classified zh by the stopword heuristic
    assert(rows(2).getString(6) === "zh")
    // simhash stays in 16-bit range for all inputs
    assert(rows.forall(r => r.getInt(5) >= 0 && r.getInt(5) < 65536))
    // fingerprint of short text falls back to hashing the text itself
    assert(rows(1).getString(4) ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("one".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("native SimHash16Expr equals the declarative HOF spec on fixtures and edges") {
    val fixture = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val edges = textsDf(edgeTexts)
    Seq(fixture, edges).foreach { df =>
      val both = df.select(
        TextFunctions.simhash16(col("text")).as("native"),
        TextFunctions.simhash16Hof(col("text")).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0)
    }
  }

  test("native SimHash64Expr equals the declarative HOF spec on fixtures and edges") {
    val fixture = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val edges = textsDf(edgeTexts)
    Seq(fixture, edges).foreach { df =>
      val both = df.select(
        TextFunctions.simhash64(col("text")).as("native"),
        TextFunctions.simhash64Hof(col("text")).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0)
    }
  }

  test("native MinHashSigExpr equals the declarative HOF spec on fixtures and edges") {
    val fixture = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val edges = textsDf(edgeTexts)
    Seq(fixture, edges).foreach { df =>
      val both = df.select(
        TextFunctions.minhashSignature(col("text"), 4).as("native"),
        TextFunctions.minhashSignatureHof(col("text"), 4).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0)
    }
  }

  test("native FingerprintMd5Expr equals the declarative HOF spec on fixtures and edges") {
    val fixture = Tables.load(spark, sf, "documents").select("doc_id", "text")
    // surrogate-pair emoji exercise the code-point (not UTF-16) shingling
    val edges = textsDf(edgeTexts :+ "🙂🙂🙂🙂🙂🙂🙂🙂🙂 padded out")
    Seq(fixture, edges).foreach { df =>
      val both = df.select(
        TextFunctions.fingerprint(col("text")).as("native"),
        TextFunctions.fingerprintHof(col("text")).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0)
    }
  }

  test("simhash64: small edits stay within Hamming<=3 on long docs (near-dup property)") {
    // one changed token out of 500: each bit's ±1 sum moves by at most 2, so
    // only bits whose token-sum sits at the sign boundary can flip — on a
    // 500-token doc that's rare per bit, keeping planted near-dups inside the
    // banding's Hamming-<=3 guarantee. Deterministic (md5, fixed texts).
    val base = (0 until 500).map(i => s"tok$i").mkString(" ")
    val mutants = (0 until 10).map { m =>
      (0 until 500).map(i => if (i == m * 50) "CHANGED" else s"tok$i").mkString(" ")
    }
    val df = textsDf(base +: mutants)
    val sh = df.select(TextFunctions.simhash64(col("text")).as("sh"))
      .collect().map(_.getLong(0))
    val within = (1 until sh.length)
      .count(i => java.lang.Long.bitCount(sh(0) ^ sh(i)) <= 3)
    assert(within >= 8, s"only $within/10 one-token mutants within Hamming<=3")
    // and the full near-dup operator clusters them with the base doc
    val clustered = graft.operators.Dedup
      .simhash64NearDup(df, "text", "doc_id")
      .filter(col("rep") === 0L).count()
    assert(clustered >= within + 1)
  }

  test("regression: cosine of mismatched-length arrays is NULL (like the HOF), skyline skips NULL dims") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f, 4f))).toDF("a", "b")
    val both = df.select(
      graft.functions.VectorFunctions.cosine(col("a"), col("b")).as("native"),
      graft.functions.VectorFunctions.cosineHof(col("a"), col("b")).as("hof")).head()
    assert(both.isNullAt(0) && both.isNullAt(1))
    // skyline with a NULL dimension row: excluded, no NPE
    val pts = Seq((1L, Some(1.0), 1.0), (2L, None, 0.0), (3L, Some(0.5), 2.0))
      .toDF("id", "x", "y")
    val sky = graft.operators.Skyline.skyline(pts, Seq("x", "y"))
      .collect().map(_.getLong(0)).sorted
    assert(sky.toSeq === Seq(1L, 3L))
  }

  test("gopher repetition excludes sub-trigram docs on BOTH engine sides") {
    // The d40 oracle's `bs JOIN ts USING (doc_id)` inner join drops any doc
    // with zero bigram or zero trigram instances; the Spark side must apply
    // the same exclusion (filter total_bi >= 1 AND total_tri >= 1) instead
    // of emitting null fractions from 0/0. Pin it with docs of 1, 2, 3 and
    // 5 tokens — the fixture corpora contain no such short docs, so only
    // this test guards the declared contract.
    import spark.implicits._
    val docs = Seq(
      (1L, "one"),                 // 0 bigrams, 0 trigrams -> excluded
      (2L, "two tokens"),          // 1 bigram,  0 trigrams -> excluded
      (3L, "three token doc"),     // 2 bigrams, 1 trigram  -> kept
      (4L, "a b a b a"))           // kept; top bigram "a b" x2 of 4
      .toDF("doc_id", "text")
    val dir = tmpDir("graft_d40_short_")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d40_gopher_repetition")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(3L, 4L),
      "sub-trigram docs must be excluded, matching the oracle inner join")
    assert(out.forall(r => !r.anyNull), "no null fractions may survive")
    val d4 = out.find(_.getLong(0) == 4L).get
    assert(d4.getInt(1) === 2 && d4.getInt(2) === 4) // top2=2 of total_bi=4
  }

  test("dedup operators handle edge corpora (empty strings, dup empties)") {
    val df = textsDf(Seq("", "", "a", "a", "b"))
    val ids = graft.operators.Dedup.exactIds(df, "text", "doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(0L, 2L, 4L)) // min id per distinct content
    val cand = graft.operators.Dedup.minhashLshCandidates(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)) && cand.contains((2L, 3L)))
  }
}
