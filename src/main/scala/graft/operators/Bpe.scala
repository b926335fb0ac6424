package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Byte-pair-encoding tokenizer: train merges on the corpus, apply them
  * distributed — the token-counting primitive of an LLM data pipeline
  * (SURVEY.md §2.8 "token counting"; this is the TRAINABLE form behind
  * `d11_token_counts`' fixed regex).
  *
  * Algorithm (Sennrich, Haddow & Birch, "Neural Machine Translation of
  * Rare Words with Subword Units", ACL 2016): represent each word as its
  * character sequence plus an end-of-word symbol; repeatedly merge the
  * most frequent adjacent symbol pair, frequency-weighted by word counts.
  * Encoding replays the learned merges in rank order (lowest rank first —
  * the GPT-2 greedy scheme, equivalent to replaying training order).
  *
  * Scale shape — the same discipline as [[Similarity.ivfTopK]]'s sampled
  * KMeans and [[TfIdf]]'s one-scan df:
  *  - ONE distributed pass computes the word histogram (hash-partitioned
  *    groupBy; the corpus payload never moves — only (word, count) pairs).
  *  - The merge LOOP runs on the driver over the TOP-K histogram rows
  *    (`topWords`, default 50k) — bounded memory regardless of corpus
  *    size. Truncating the histogram tail is the standard practice (the
  *    tail's pair counts cannot outvote the head's at realistic K) and
  *    affects only WHICH merges are learned, never encode correctness.
  *  - The learned merge ranks broadcast to executors (KBs); encoding is a
  *    narrow per-row map with no shuffle.
  *
  * Determinism: the histogram is exact (not sampled), and pair-count ties
  * break lexicographically — identical corpora learn identical merges
  * under any partitioning.
  */
object Bpe {

  /** End-of-word marker symbol (Sennrich §3.2). A literal that cannot
    * collide with single input characters.
    */
  val Eow = "</w>"

  final case class Model(merges: Seq[(String, String)]) {
    /** rank by pair, for greedy lowest-rank-first encoding */
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    def encodeWord(word: String): Seq[String] = Bpe.encodeWord(word, ranks)

    /** Column form: text → array<string> of BPE tokens. */
    def encode(text: Column): Column = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), merges))
    }

    /** Deterministic vocabulary: every symbol the merge table can emit —
      * the 256 byte-range single characters + Eow first (so ids are stable
      * under vocab growth), then each merge's joined symbol in RANK order.
      * Unknown symbols (characters outside the byte range) map to id 0,
      * the conventional <unk> slot.
      */
    @transient lazy val vocab: Map[String, Int] = {
      val base = (0 until 256).map(c => c.toChar.toString) :+ Bpe.Eow
      val merged = merges.map { case (a, b) => a + b }
      // a merge result can collide with a base symbol only if inputs were
      // outside the byte range; distinct keeps first (= lowest id)
      (base ++ merged).distinct.zipWithIndex.toMap
    }

    def vocabSize: Int = vocab.size

    /** text → array<int> token ids (the trainable-tokenizer output an
      * actual training pipeline feeds to sequence packing). id 0 = <unk>.
      */
    def encodeIds(text: Column): Column = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(
        BpeEncodeIdsExpr(ColumnBridge.expression(text), merges))
    }

    def decodeIds(ids: Seq[Int]): String = {
      val rev = vocab.map(_.swap)
      ids.map(rev.getOrElse(_, "")).mkString("").replace(Bpe.Eow, " ").trim
    }
  }

  /** Split used for BOTH training and encoding — whitespace words, like
    * the repo's other text operators (TextFunctions.tokens).
    */
  def words(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** One word → initial symbol sequence: characters + end-of-word. */
  private def initSymbols(word: String): mutable.ArrayBuffer[String] = {
    val b = new mutable.ArrayBuffer[String](word.length + 1)
    word.foreach(c => b += c.toString)
    b += Eow
    b
  }

  /** Train `numMerges` merges from the corpus' exact word histogram,
    * truncated to the `topWords` most frequent words (ties broken by word
    * for determinism).
    */
  def train(
      corpus: DataFrame, textCol: String,
      numMerges: Int, topWords: Int = 50000): Model = {
    val hist = corpus
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(topWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // driver loop over the bounded histogram: symbols per word + counts
    val seqs = hist.map { case (w, n) => (initSymbols(w), n) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    while (iter < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) iter = numMerges
      else {
        // most frequent pair; lexicographic tie-break for determinism
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        seqs.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = joined
              syms.remove(i + 1)
            } else i += 1
          }
        }
        iter += 1
      }
    }
    Model(merges.toSeq)
  }

  /** Greedy encode: repeatedly apply the present pair with the lowest
    * merge rank (training-order replay) until no learned pair remains.
    */
  private[operators] def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    val syms = initSymbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        // merge EVERY occurrence of the chosen pair (same as training)
        val (a, b) = (syms(bestAt), syms(bestAt + 1))
        val joined = a + b
        var j = 0
        while (j < syms.length - 1) {
          if (syms(j) == a && syms(j + 1) == b) {
            syms(j) = joined
            syms.remove(j + 1)
          } else j += 1
        }
      }
    }
    syms.toSeq
  }
}

/** Eval-mode expression applying a trained BPE model: text → array<string>
  * of subword tokens. CodegenFallback — the merge loop is data-dependent
  * control flow with no win from inlining into generated Java; the
  * surrounding operators stay in whole-stage codegen and call this leaf.
  * The merge table is a plan literal (KBs — ~vocabSize pairs), shipped
  * once per task like any other expression constant.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  // Per-thread bounded LRU memo of word → encoded tokens: encodeWord is
  // pure and natural-language corpora are Zipfian (the same head words
  // re-encode millions of times), so memoization is exact and removes the
  // greedy merge replay from almost every call. ThreadLocal because local
  // mode can run partitions of one deserialized plan on many threads;
  // 64k entries of short token arrays bound the footprint to a few MB.
  @transient private lazy val memo: ThreadLocal[java.util.LinkedHashMap[String, Array[Any]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Array[Any]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Any]]): Boolean = size() > 65536
      })

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val m = memo.get()
    val out = mutable.ArrayBuffer.empty[Any]
    Bpe.words(text).foreach { w =>
      var toks = m.get(w)
      if (toks == null) {
        toks = Bpe.encodeWord(w, ranks)
          .map(t => UTF8String.fromString(t): Any).toArray
        m.put(w, toks)
      }
      toks.foreach(out += _)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → array<int> of BPE token IDS under [[Bpe.Model.vocab]] (id 0 =
  * the NUL/<unk> slot for symbols outside the byte range). Same
  * CodegenFallback rationale as [[BpeEncodeExpr]].
  */
case class BpeEncodeIdsExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  @transient private lazy val model = Bpe.Model(merges)
  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  // same per-thread word memo as BpeEncodeExpr, holding the final id arrays
  @transient private lazy val memo: ThreadLocal[java.util.LinkedHashMap[String, Array[Int]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Array[Int]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Int]]): Boolean = size() > 65536
      })

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val m = memo.get()
    val out = mutable.ArrayBuffer.empty[Int]
    Bpe.words(text).foreach { w =>
      var ids = m.get(w)
      if (ids == null) {
        ids = Bpe.encodeWord(w, ranks).map(t => model.vocab.getOrElse(t, 0)).toArray
        m.put(w, ids)
      }
      ids.foreach(out += _)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
