package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data-pipeline operators (SURVEY.md §2.8):
  * tokenization, shingling, MinHash / SimHash signatures, language-ID
  * heuristics, quality scoring, fingerprinting.
  *
  * Everything is a composition of codegen'd built-ins over columns — no UDFs,
  * no driver-side state — so each operator scales as an ordinary narrow
  * projection. Hash material is `md5` (identical across Spark and DuckDB, so
  * oracle queries can recompute signatures exactly; Spark's own `hash`/
  * `xxhash64` are faster but engine-specific — used only in the non-oracle
  * LSH paths).
  */
object TextFunctions {

  /** Whitespace tokens. Documents are single-space separated (FIXTURES.md). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, or single other non-space
    * characters — the regex proxy for subword tokenization (SURVEY.md,
    * north-star text analysis).
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Word n-gram shingles (space-joined windows of `n` consecutive tokens).
    * Short docs (< n tokens) are guarded to an empty shingle set explicitly.
    *
    * Formulated as `transform` over a zip of n shifted slices of the token
    * array, NOT as index arithmetic reaching back into the array from the
    * lambda: higher-order functions are interpreted (CodegenFallback) with
    * no common-subexpression elimination inside the lambda, so a lambda
    * containing `element_at(split(text), i + o)` RE-SPLITS the document n
    * times per shingle — O(n·|doc|) splits per row (measured: 6× the whole
    * decontamination scan at sf0.1). Here the lambda touches only its own
    * zip-struct variable; the token array is evaluated at most n times per
    * ROW, and that bound survives any optimizer inlining of the tokens
    * expression.
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOf(tokens(text), n)

  /** [[wordShingles]] over an existing token-array column. */
  def wordShinglesOf(toks: Column, n: Int): Column = {
    val win = size(toks) - (n - 1)
    when(win >= 1,
      transform(
        arrays_zip((1 to n).map(k => slice(toks, lit(k), win)): _*),
        s => concat_ws(" ", (0 until n).map(i => s.getField(i.toString)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Character n-gram shingles; texts shorter than `n` yield themselves. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array(text))

  /** One MinHash value: min over tokens of md5(seed || ":" || token).
    * A k-element signature is `(0 until k).map(minhash(text, _))`.
    */
  def minhash(text: Column, seed: Int): Column =
    array_min(transform(tokens(text), t => md5(concat(lit(s"$seed:"), t))))

  /** Concatenated k-hash MinHash signature (exact-match grouping key).
    * Evaluated by the native one-pass [[MinHashSigExpr]];
    * [[minhashSignatureHof]] is the declarative spec it must match
    * (cross-checked in TextEdgeSpec).
    */
  def minhashSignature(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), k))
  }

  /** Declarative HOF formulation of [[minhashSignature]] (reference spec). */
  def minhashSignatureHof(text: Column, k: Int): Column =
    concat_ws("|", (0 until k).map(minhash(text, _)): _*)

  /** DuckDB SQL recomputing [[minhash]] / [[minhashSignature]] exactly. */
  def oracleMinhashSql(textCol: String, seed: Int): String =
    s"list_min(list_transform(string_split($textCol, ' '), t -> md5('$seed:' || t)))"
  def oracleMinhashSignatureSql(textCol: String, k: Int): String =
    (0 until k).map(oracleMinhashSql(textCol, _)).mkString("(", " || '|' || ", ")")

  /** 16-bit SimHash over whitespace tokens. Bit b of a token is hex digit
    * b of its md5 mapped to ±1 (digit >= '8' → +1); the document bit is the
    * sign of the per-bit sum. Evaluated by the native one-pass
    * [[SimHash16Expr]]; [[simhash16Hof]] is the declarative spec it must
    * match (cross-checked in TextEdgeSpec).
    */
  def simhash16(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash16Expr(ColumnBridge.expression(text)))
  }

  /** Declarative HOF formulation of [[simhash16]] (reference spec). */
  def simhash16Hof(text: Column): Column = {
    // digests materialized first so each token is hashed exactly once (a
    // digest referenced inside the per-bit lambda would be re-evaluated)
    val digests = transform(tokens(text), t => md5(t))
    val folded = aggregate(
      digests,
      array((0 until 16).map(_ => lit(0)): _*),
      (acc, h) =>
        zip_with(acc, transform(sequence(lit(1), lit(16)),
          i => when(substring_col(h, i) >= "8", 1).otherwise(-1)),
          (a, b) => a + b))
    (0 until 16).map { b =>
      when(element_at(folded, b + 1) > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** substring(str, pos, 1) with a Column position. */
  private def substring_col(str: Column, pos: Column): Column = str.substr(pos, lit(1))

  /** 64-bit SimHash — the corpus-scale signature (native [[SimHash64Expr]];
    * bit lattice documented there).
    */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))
  }

  /** Declarative HOF formulation of [[simhash64]] (the spec the native
    * expression must match bit-for-bit — cross-checked in TextEdgeSpec).
    */
  def simhash64Hof(text: Column): Column = {
    val digests = transform(tokens(text), t => md5(t))
    val folded = aggregate(
      digests,
      array((0 until 64).map(_ => lit(0)): _*),
      (acc, h) =>
        zip_with(acc, array((0 until 64).map { b =>
          val nib = conv(substring(h, b / 4 + 1, 1), 16, 10).cast("int")
          when(shiftright(nib, 3 - (b % 4)).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)
        }: _*),
          (a, x) => a + x))
    (0 until 64).map { b =>
      when(element_at(folded, b + 1) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** DuckDB CTE fragment recomputing [[simhash64]] for table `tbl` with
    * columns (idCol, textCol): yields `(idCol, sh BIGINT)` named `simhash64_sig`.
    * Tokens are md5-hashed once (unnest + group-by), then each of the 64 bit
    * sums is aggregated; bit 63's weight is BIGINT min-value (two's
    * complement), matching Spark's `1L << 63`.
    */
  def oracleSimhash64Cte(tbl: String, idCol: String, textCol: String): String =
    s"""simhash64_tok AS (
       |  SELECT $idCol, unnest(string_split($textCol, ' ')) AS t FROM $tbl),
       |simhash64_h AS (SELECT $idCol, md5(t) AS h FROM simhash64_tok),
       |simhash64_bits AS (
       |  SELECT $idCol, bs.b AS b,
       |    sum(CASE WHEN ((strpos('0123456789abcdef', substring(h, CAST(bs.b // 4 + 1 AS INTEGER), 1)) - 1)
       |                   >> CAST(3 - (bs.b % 4) AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM simhash64_h, (SELECT unnest(range(64)) AS b) bs
       |  GROUP BY $idCol, bs.b),
       |simhash64_sig AS (
       |  SELECT $idCol, CAST(sum(CASE WHEN s > 0 THEN
       |      (CASE WHEN b = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |            ELSE (1::BIGINT << CAST(b AS INTEGER)) END)
       |    ELSE 0 END) AS BIGINT) AS sh
       |  FROM simhash64_bits GROUP BY $idCol)""".stripMargin

  /** DuckDB SQL recomputing [[simhash16]] for a text column expression. */
  def oracleSimhash16Sql(textCol: String): String =
    (0 until 16).map { b =>
      s"(CASE WHEN list_sum(list_transform(string_split($textCol, ' '), " +
        s"tok -> CASE WHEN substring(md5(tok), ${b + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 " +
        s"THEN ${1 << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Stopword marker sets for the language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "在", "了"))

  /** Count of tokens belonging to a stopword set. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => words.map(w => t === w).reduce(_ || _)))

  /** Language-ID: argmax of stopword hits with a fixed tie-break priority
    * (en ≻ es ≻ de ≻ fr ≻ zh — strict inequality required to displace).
    */
  def langId(text: Column): Column = {
    val hits = langStopwords.map { case (l, ws) => l -> stopwordHits(text, ws) }.toMap
    when(hits("zh") > greatest(hits("en"), hits("es"), hits("de"), hits("fr")), "zh")
      .when(hits("fr") > greatest(hits("en"), hits("es"), hits("de")), "fr")
      .when(hits("de") > greatest(hits("en"), hits("es")), "de")
      .when(hits("es") > hits("en"), "es")
      .otherwise("en")
  }

  /** Quality signals: length, token count, mean token length, stopword ratio,
    * non-alphanumeric ratio. Combined score in [0,1] — integer-arithmetic
    * inputs and single-division doubles, so cross-engine deterministic.
    */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val stop = stopwordHits(text, langStopwords.head._2).cast("double")
    val nonAlnum = (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", ""))).cast("double")
    Seq(
      "n_chars" -> nChar,
      "n_tokens" -> nTok,
      "mean_tok_len" -> ((nChar - (nTok - 1.0)) / nTok),
      "stopword_ratio" -> (stop / nTok),
      "non_alnum_ratio" -> (nonAlnum / nChar))
  }

  /** Winnowing-style document fingerprint: minimum md5 over character
    * 8-gram shingles — stable under small edits anywhere but the minimal
    * shingle (SURVEY.md "document fingerprinting"). Evaluated by the native
    * one-pass [[FingerprintMd5Expr]]; [[fingerprintHof]] is the declarative
    * spec it must match (cross-checked in TextEdgeSpec).
    */
  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(FingerprintMd5Expr(ColumnBridge.expression(text)))
  }

  /** Unicode normalization ([[UnicodeNormalizeExpr]]): canonical NFC/NFD or
    * compatibility NFKC/NFKD — run BEFORE exact dedup / fingerprinting or
    * byte-different spellings of the same text fragment every hash upstream.
    */
  def normalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expression(text), form))
  }

  /** Declarative HOF formulation of [[fingerprint]] (reference spec). */
  def fingerprintHof(text: Column): Column =
    array_min(transform(charShingles(text, 8), g => md5(g)))

  /** Count of the most frequent element of a string array — a sorted-run
    * maximum: `array_sort`, then one fold carrying (prev, run, best). All
    * per-row codegen HOF work, zero shuffle — the Gopher-repetition-rule
    * building block ("fraction of instances that are the top n-gram",
    * Rae et al. 2021, arXiv:2112.11446 §A1.1) without exploding the corpus
    * into an n-gram row stream.
    */
  def maxRunCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /** Count of array elements whose value occurs at least twice (instances
    * in duplicated runs) — same sorted-run fold, with an end-of-fold flush
    * for the final run. Gopher's "fraction of instances in duplicate
    * n-grams" numerator.
    */
  def dupElemCount(arr: Column): Column = {
    def flush(run: Column): Column = when(run >= 2, run).otherwise(lit(0))
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("dup")),
      (st, x) => {
        val same = x === st.getField("prev")
        val run = when(same, st.getField("run") + 1).otherwise(lit(1))
        val dup = when(same, st.getField("dup"))
          .otherwise(st.getField("dup") + flush(st.getField("run")))
        struct(x.as("prev"), run.as("run"), dup.as("dup"))
      },
      st => st.getField("dup") + flush(st.getField("run")))
  }
}
