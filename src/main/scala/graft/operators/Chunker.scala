package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the step between cleaned documents
  * and a fixed-context trainer: each document's token stream becomes
  * overlapping windows of `window` tokens advanced by `stride` (overlap =
  * window − stride preserves cross-boundary context). Distinct from
  * [[Dedup]]'s shingling (which windows for SIGNATURES) and from
  * d22_sequence_pack (which packs WHOLE short docs into a budget); this op
  * splits long docs DOWN to the context length.
  *
  * Per-row narrow transform: `sequence` generates the start offsets,
  * `posexplode` fans out chunks, `slice` cuts each window — all codegen'd
  * builtins, no shuffle, no UDF. Fan-out is ~n_tokens/stride per document,
  * so at 100 TB the operator scales linearly with the corpus and each
  * output row carries only its own window (never the whole document).
  */
object Chunker {

  /** Explode `textCol` into (chunk_idx, tok_start, n_tok, chunk_hash,
    * first_tok, last_tok) rows; `keepText=true` adds the chunk text itself
    * (the trainer path; summaries-only is the QA path).
    */
  def slidingWindow(
      df: DataFrame, textCol: String, window: Int, stride: Int,
      keepText: Boolean = false): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    // NULL text yields ZERO chunks (posexplode of an empty array drops the
    // row) — greatest(null-1, 0) would otherwise fabricate one start offset
    // and emit a garbage chunk the trainer path must never see
    val starts = when(col(textCol).isNull, array())
      .otherwise(sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)))
    val out = df
      .withColumn("__toks", toks)
      .select(col("*"), posexplode(starts).as(Seq("chunk_idx", "tok_start")))
      .withColumn("__chunk", slice(col("__toks"), col("tok_start") + 1, lit(window)))
      .withColumn("n_tok", size(col("__chunk")).cast("long"))
      .withColumn("chunk_hash", md5(concat_ws(" ", col("__chunk"))))
      .withColumn("first_tok", element_at(col("__chunk"), 1))
      .withColumn("last_tok", element_at(col("__chunk"), -1))
    val withText =
      if (keepText) out.withColumn("chunk_text", concat_ws(" ", col("__chunk")))
      else out
    withText.drop("__toks", "__chunk", textCol)
  }
}
