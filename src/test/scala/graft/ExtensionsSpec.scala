package graft

import org.apache.spark.sql.functions._

/** GraftExtensions: the custom expression is reachable from SQL text and
  * agrees with both the HOF formulation and plain Scala math.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_cosine registers and evaluates from SQL") {
    GraftExtensions.register(spark)
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id, b.vec_id, graft_cosine(a.embedding, b.embedding) AS c
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 5 AND b.vec_id < 5""".stripMargin)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val viaHof = {
      val e = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 5)
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          graft.functions.VectorFunctions.cosineHof(col("a_emb"), col("b_emb")).as("c"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    assert(viaSql.keySet === viaHof.keySet)
    viaSql.foreach { case (k, v) => assert(v === viaHof(k), s"pair $k") } // bit-equal
  }

  test("graft_simhash16 registers and equals the Column API") {
    GraftExtensions.register(spark)
    Tables.load(spark, sf, "documents").limit(50).createOrReplaceTempView("docs50")
    val viaSql = spark.sql("SELECT doc_id, graft_simhash16(text) AS s FROM docs50")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCol = Tables.load(spark, sf, "documents").limit(50)
      .select(col("doc_id"), graft.functions.TextFunctions.simhash16(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql === viaCol)
  }

  test("graft_simhash64 registers and equals the Column API") {
    GraftExtensions.register(spark)
    Tables.load(spark, sf, "documents").limit(50).createOrReplaceTempView("docs50x")
    val viaSql = spark.sql("SELECT doc_id, graft_simhash64(text) AS s FROM docs50x")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = Tables.load(spark, sf, "documents").limit(50)
      .select(col("doc_id"), graft.functions.TextFunctions.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaCol)
  }

  test("graft_cosine rejects wrong arity / types with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_cosine"))
  }

  test("graft_nfc / graft_nfkc: known Unicode foldings, codegen == interpreted, no-op fast path") {
    GraftExtensions.register(spark)
    import graft.functions.UnicodeNormalizeExpr
    import org.apache.spark.unsafe.types.UTF8String
    // known mappings: e+combining acute → é; NFKC additionally folds
    // full-width A and the fi ligature
    val row = spark.sql(
      "SELECT graft_nfc('é Ａﬁ'), graft_nfkc('é Ａﬁ')").head()
    assert(row.getString(0) === "é Ａﬁ", "NFC composes, keeps compat chars")
    assert(row.getString(1) === "é Afi", "NFKC composes AND folds compat chars")
    // interpreted eval (nullSafeEval) must equal the codegen'd SQL path
    val interp = UnicodeNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("é Ａﬁ"), "NFKC")
      .eval(null).asInstanceOf[UTF8String].toString
    assert(interp === row.getString(1))
    // already-normalized input returns the SAME UTF8String (no realloc)
    val in = UTF8String.fromString("plain ascii")
    val k = UnicodeNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFC")
    assert(k.compute(in) eq in, "normalized input short-circuits")
    // null propagates
    assert(spark.sql("SELECT graft_nfc(CAST(NULL AS STRING))").head().isNullAt(0))
  }
}
