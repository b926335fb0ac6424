package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.multimodal.Multimodal
import graft.operators.{Chunker, Dedup, NgramLm, Quantize, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 — LLM-data-pipeline operators (D1-D6 + the north-star
  * dedup / similarity / text-analysis / multimodal suite). The Spark side
  * routes through the library operators in graft.operators / graft.functions;
  * oracles recompute the identical md5-based signatures in DuckDB.
  */
object PipelineQueries {

  val defs: Seq[QDef] = Seq(

    // D1 exact dedup. The fixture has no exact duplicates, so duplicates are
    // injected (same text, shifted id); the dedup must keep the lowest id.
    QDef("d1_exact_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val withDups = docs.unionAll(
          docs.select((col("doc_id") + 1000).as("doc_id"), col("text")))
        Dedup.exactIds(withDups, "text", "doc_id")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, sha256(text) AS h FROM (
             |  SELECT doc_id, text,
             |         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
             |  FROM (SELECT doc_id, text FROM documents
             |        UNION ALL SELECT doc_id + 1000, text FROM documents) u) t
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // D2 MinHash near-dup clustering, pure-SQL variant: k=4 signature,
    // cluster representative = min doc_id per signature. (The banded-LSH
    // candidate variant is exercised in DedupSpec.)
    QDef("d2_minhash_cluster",
      (s, dir) => {
        val sig = TF.minhashSignature(col("text"), 4)
        val w = Window.partitionBy(col("sig"))
        Tables.parallel(Tables.load(s, dir, "documents"))
          .withColumn("sig", sig)
          .withColumn("rep", min(col("doc_id")).over(w))
          .select(col("doc_id"), col("rep"), md5(col("sig")).as("sig_h"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, min(doc_id) OVER (PARTITION BY sig) AS rep, md5(sig) AS sig_h
              |FROM (SELECT doc_id, ${TF.oracleMinhashSignatureSql("text", 4)} AS sig
              |      FROM documents) t
              |ORDER BY doc_id""".stripMargin)),

    // D3 embedding cosine top-k pairs (ordering key is the DECIMAL-rounded
    // cosine + ids, so the LIMIT cut is deterministic in both engines).
    QDef("d3_cosine_topk",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("cos", dec4(VF.cosine(col("a_emb"), col("b_emb"))))
          .select("a_id", "b_id", "cos")
          .orderBy(col("cos").desc, col("a_id").asc, col("b_id").asc)
          .limit(20)
      },
      Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              |  CAST(${VF.oracleCosineSql("a.embedding", "b.embedding")} AS DECIMAL(38,4)) AS cos
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE a.vec_id < 100 AND b.vec_id < 100
              |ORDER BY cos DESC, a_id, b_id LIMIT 20""".stripMargin)),

    // D4 text stats per language.
    QDef("d4_text_stats",
      (s, dir) => Tables.load(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          dec4(avg(TF.tokenCount(col("text")).cast("double"))).as("avg_tokens"),
          min(TF.tokenCount(col("text"))).as("min_tokens"),
          max(TF.tokenCount(col("text"))).as("max_tokens"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  CAST(avg(len(string_split(text, ' ')) * 1.0) AS DECIMAL(38,4)) AS avg_tokens,
             |  CAST(min(len(string_split(text, ' '))) AS INTEGER) AS min_tokens,
             |  CAST(max(len(string_split(text, ' '))) AS INTEGER) AS max_tokens
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // D5 quality filter: integer-derived signals, single-division ratios.
    QDef("d5_quality_filter",
      (s, dir) => {
        val sig = TF.qualitySignals(col("text")).toMap
        Tables.parallel(Tables.load(s, dir, "documents"))
          .withColumn("n_tok", sig("n_tokens"))
          .withColumn("mean_tok_len", sig("mean_tok_len"))
          .withColumn("non_alnum_ratio", sig("non_alnum_ratio"))
          .filter(col("n_chars").between(100, 500) && col("n_tok") >= 20.0 &&
            col("non_alnum_ratio") < 0.05 && col("mean_tok_len").between(2.0, 10.0))
          .select(col("doc_id"), col("n_tok").cast("int").as("n_tok"),
            dec4(col("mean_tok_len")).as("mean_tok_len"))
          .orderBy("doc_id")
      },
      Some("""WITH sig AS (
             |  SELECT doc_id, n_chars,
             |    len(string_split(text, ' ')) * 1.0 AS n_tok,
             |    (length(text) * 1.0 - (len(string_split(text, ' ')) * 1.0 - 1.0))
             |      / (len(string_split(text, ' ')) * 1.0) AS mean_tok_len,
             |    (length(text) * 1.0 - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) * 1.0)
             |      / (length(text) * 1.0) AS non_alnum_ratio
             |  FROM documents)
             |SELECT doc_id, CAST(floor(n_tok) AS INTEGER) AS n_tok,
             |       CAST(mean_tok_len AS DECIMAL(38,4)) AS mean_tok_len
             |FROM sig
             |WHERE n_chars BETWEEN 100 AND 500 AND n_tok >= 20.0
             |  AND non_alnum_ratio < 0.05 AND mean_tok_len BETWEEN 2.0 AND 10.0
             |ORDER BY doc_id""".stripMargin)),

    // D6 token frequency (vocabulary head).
    QDef("d6_token_freq",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(explode(TF.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(30),
      Some("""SELECT token, count(*) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
             |GROUP BY 1 ORDER BY n DESC, token LIMIT 30""".stripMargin)),

    // Language-ID heuristic (stopword argmax, fixed tie-break priority).
    QDef("d7_lang_id",
      (s, dir) => Tables.parallel(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), TF.langId(col("text")).as("pred"), col("lang"),
          (TF.langId(col("text")) === col("lang")).cast("int").as("correct"))
        .orderBy("doc_id"),
      Some {
        def hits(words: Seq[String]) =
          s"len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
        val h = TF.langStopwords.map { case (l, ws) => l -> hits(ws) }.toMap
        s"""SELECT doc_id,
           |  CASE WHEN ${h("zh")} > greatest(${h("en")}, ${h("es")}, ${h("de")}, ${h("fr")}) THEN 'zh'
           |       WHEN ${h("fr")} > greatest(${h("en")}, ${h("es")}, ${h("de")}) THEN 'fr'
           |       WHEN ${h("de")} > greatest(${h("en")}, ${h("es")}) THEN 'de'
           |       WHEN ${h("es")} > ${h("en")} THEN 'es'
           |       ELSE 'en' END AS pred,
           |  lang,
           |  CAST(CASE WHEN (CASE WHEN ${h("zh")} > greatest(${h("en")}, ${h("es")}, ${h("de")}, ${h("fr")}) THEN 'zh'
           |       WHEN ${h("fr")} > greatest(${h("en")}, ${h("es")}, ${h("de")}) THEN 'fr'
           |       WHEN ${h("de")} > greatest(${h("en")}, ${h("es")}) THEN 'de'
           |       WHEN ${h("es")} > ${h("en")} THEN 'es'
           |       ELSE 'en' END) = lang THEN 1 ELSE 0 END AS INTEGER) AS correct
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // SimHash document signatures — 64-bit (round-2 verdict: the 16-bit
    // signature space collides everything at corpus scale; it survives only
    // as the graft_simhash16 demo scalar, not as a declared operator).
    QDef("d8_simhash",
      (s, dir) => Tables.parallel(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), TF.simhash64(col("text")).as("simhash"))
        .orderBy("doc_id"),
      Some(s"""WITH ${TF.oracleSimhash64Cte("documents", "doc_id", "text")}
              |SELECT doc_id, sh AS simhash
              |FROM simhash64_sig ORDER BY doc_id""".stripMargin)),

    // n-gram Jaccard near-dup pairs via the Dedup operator.
    QDef("d9_ngram_jaccard",
      // dfMax is vacuous here ON PURPOSE: this oracle is the exact
      // quadratic Jaccard definition, so the shingle-df cap (the scale
      // knob) must not be able to diverge from it on any fixture refresh.
      // The cap's equivalence-where-it-matters is gated separately in
      // ScaleOpsSpec (planted hot shingle).
      (s, dir) => Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 60),
        "text", "doc_id", n = 2, tau = 0.05, dfMax = Long.MaxValue)
        .select(col("a"), col("b"), dec4(col("jaccard")).as("jac"))
        .orderBy("a", "b"),
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id AS doc, g FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
             |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS g
             |    FROM documents WHERE doc_id < 60) t),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS a, b.doc AS b, count(*) AS i
             |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc < b.doc GROUP BY 1, 2)
             |SELECT a, b, CAST(i * 1.0 / ((sa.sz + sb.sz - i) * 1.0) AS DECIMAL(38,4)) AS jac
             |FROM inter
             |JOIN sizes sa ON sa.doc = a
             |JOIN sizes sb ON sb.doc = b
             |WHERE i * 1.0 / ((sa.sz + sb.sz - i) * 1.0) >= 0.05
             |ORDER BY a, b""".stripMargin)),

    // Transitive closure of d9's near-dup pairs into dup GROUPS — the step
    // a real dedup pipeline runs after any pair generator (a~b, b~c ⇒ one
    // group {a,b,c} even though a,c never paired; keep min-id per group).
    // Spark side: iterative min-label propagation with pointer jumping
    // (O(log diameter) rounds of id-keyed equi-joins, lineage truncated per
    // round). Oracle: DuckDB recursive CTE computing min reachable id.
    // Ordered funnel over the event stream: first 'view', first 'click'
    // STRICTLY AFTER that view, first 'purchase' strictly after that click
    // — the sequential-pattern shape (MATCH_RECOGNIZE-lite) every event
    // analytics engine ships. Spark-first: three conditional min-
    // aggregations chained by user_id equi-joins — every stage is hash-
    // partitioned on the same key, so AQE plans the chain with ONE
    // user_id exchange reused across stages; nothing is ever collected
    // and no window spans more than one user's events.
    QDef("d32_funnel_analysis",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events").select("user_id", "ts", "event_type")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("v_ts"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("v_ts"))
          .groupBy("user_id").agg(min("ts").as("c_ts"))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("c_ts"))
          .groupBy("user_id").agg(min("ts").as("p_ts"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            unix_millis(col("v_ts")).as("view_ms"),
            unix_millis(col("c_ts")).as("click_ms"),
            unix_millis(col("p_ts")).as("purchase_ms"),
            (lit(1) + when(col("c_ts").isNotNull, 1).otherwise(0)
              + when(col("p_ts").isNotNull, 1).otherwise(0)).as("stage"))
          .orderBy("user_id")
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
             |           WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
             |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
             |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
             |SELECT v.user_id, epoch_ms(v_ts) AS view_ms, epoch_ms(c_ts) AS click_ms,
             |  epoch_ms(p_ts) AS purchase_ms,
             |  1 + CAST(c_ts IS NOT NULL AS INT) + CAST(p_ts IS NOT NULL AS INT) AS stage
             |FROM v LEFT JOIN c ON v.user_id = c.user_id
             |       LEFT JOIN p ON v.user_id = p.user_id
             |ORDER BY 1""".stripMargin)),

    // Trainable BPE tokenizer (Sennrich ACL-2016) end-to-end: learn 200
    // merges from the corpus' exact word histogram (distributed count,
    // driver loop over the bounded top-K rows, broadcast ranks), then
    // encode every document distributed. The merge TABLE isn't
    // SQL-expressible, but the encode output is still oracle-GATED: BPE
    // token concatenation (</w> -> space) must reproduce the
    // whitespace-normalized lowered text exactly — computed per document
    // on the real encode output and emitted as roundtrip_ok, which DuckDB
    // pins to 1 while independently recomputing n_words. A truncated,
    // reordered, or corrupted encoding fails the row hash; merge-sequence
    // exactness (textbook corpus) stays gated by BpeSpec.
    QDef("d33_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val model = graft.operators.Bpe.train(
          docs, "text", numMerges = 200, topWords = 20000)
        val rebuilt = trim(replace(
          array_join(model.encode(col("text")), ""), lit(graft.operators.Bpe.Eow), lit(" ")))
        val normalized = array_join(
          filter(split(lower(col("text")), "\\s+"), w => w =!= ""), " ")
        docs.select(col("doc_id"),
          size(filter(split(lower(col("text")), "\\s+"), w => w =!= "")).as("n_words"),
          (rebuilt === normalized).cast("int").as("roundtrip_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS INTEGER) AS n_words,
             |  1 AS roundtrip_ok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // D36 Unicode normalization (native codegen UnicodeNormalizeExpr): the
    // fixture text is ASCII (proven by the oracle equality itself), so each
    // doc is decorated with a denormalized suffix — combining acute,
    // full-width A, the fi ligature. NFC gates against DuckDB's independent
    // nfc_normalize; NFKC (which DuckDB lacks) gates against the
    // hand-derived Unicode folding (é precomposed, Ａ→A, ﬁ→fi) valid
    // exactly because the base text is NFKC-invariant ASCII.
    QDef("d36_nfc_normalize",
      (s, dir) => {
        val suffix = " e\u0301\uFF21\uFB01"
        Tables.parallel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"),
            md5(TF.normalize(concat(col("text"), lit(suffix)))).as("h_nfc"),
            md5(TF.normalize(concat(col("text"), lit(suffix)), "NFKC")).as("h_nfkc"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(nfc_normalize(text || ' e' || chr(769) || chr(65313) || chr(64257))) AS h_nfc,
             |  md5(text || ' ' || chr(233) || 'Afi') AS h_nfkc
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // D34 PageRank over the symmetrized supplier↔part co-purchase graph
    // (bipartite: an edge per distinct (l_suppkey, l_partkey), part ids
    // offset into a disjoint node space). Rank math is BIGINT-scaled
    // integer arithmetic (PageRank.pageRankInt), so the hash gate compares
    // exact values — no float accumulation-order drift. The oracle's
    // unrolled CTEs are GENERATED by the same iteration loop.
    QDef("d34_pagerank",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val fwd = li.select(
          col("l_suppkey").cast("long").as("src"),
          (col("l_partkey").cast("long") + 100000000L).as("dst")).distinct()
        val edges = fwd.unionAll(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.PageRank.pageRankInt(edges, "src", "dst", iterations = 3)
          .select(col("id").as("node_id"), col("pr"))
          .orderBy(col("pr").desc, col("node_id"))
          .limit(20)
      },
      Some(graft.operators.PageRank.oracleSqlLineitemBipartite(
        iterations = 3, topK = 20))),

    // D35 canonical survivor per near-dup component: the decision step that
    // completes the dedup pipeline — edges (n-gram Jaccard) → components
    // (transitive closure) → keep the LONGEST member (ties to lowest id).
    // Spark side is one max_by aggregation (no window sort, payload never
    // shuffles); the oracle recomputes it with a window over the same
    // recursive-CTE closure d30 uses.
    QDef("d35_canonical_keep",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        val pairs = Dedup.ngramJaccardPairs(
          docs, "text", "doc_id", n = 2, tau = 0.1, dfMax = Long.MaxValue)
        val cc = Dedup.connectedComponents(pairs, "a", "b")
          .withColumnRenamed("id", "doc_id")
        val members = docs
          .select(col("doc_id"), length(col("text")).cast("long").as("len"))
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("component"), col("len"))
        Dedup.keepCanonical(members, "doc_id", "component", "len")
          .orderBy("component")
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT DISTINCT doc_id AS doc, g FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
             |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS g
             |    FROM documents WHERE doc_id < 200) t),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS a, b.doc AS b, count(*) AS i
             |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc < b.doc GROUP BY 1, 2),
             |pairs AS (SELECT a, b FROM inter
             |          JOIN sizes sa ON sa.doc = a JOIN sizes sb ON sb.doc = b
             |          WHERE i * 1.0 / ((sa.sz + sb.sz - i) * 1.0) >= 0.1),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs),
             |reach(id, r) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
             |  UNION
             |  SELECT e.dst, r.r FROM edges e JOIN reach r ON r.id = e.src),
             |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY 1),
             |scored AS (SELECT c.component, c.doc_id, CAST(length(d.text) AS BIGINT) AS len
             |           FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
             |ranked AS (SELECT component, doc_id,
             |             row_number() OVER (PARTITION BY component
             |                                ORDER BY len DESC, doc_id ASC) AS rn
             |           FROM scored)
             |SELECT component, min(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
             |       count(*) AS members
             |FROM ranked GROUP BY component ORDER BY component""".stripMargin)),

    QDef("d30_cc_components",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 60)
        val pairs = Dedup.ngramJaccardPairs(
          docs, "text", "doc_id", n = 2, tau = 0.05, dfMax = Long.MaxValue)
        val cc = Dedup.connectedComponents(pairs, "a", "b")
          .withColumnRenamed("id", "doc_id")
        docs.select(col("doc_id"))
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("component"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE sh AS (
             |  SELECT DISTINCT doc_id AS doc, g FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
             |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS g
             |    FROM documents WHERE doc_id < 60) t),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc AS a, b.doc AS b, count(*) AS i
             |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc < b.doc GROUP BY 1, 2),
             |pairs AS (SELECT a, b FROM inter
             |          JOIN sizes sa ON sa.doc = a JOIN sizes sb ON sb.doc = b
             |          WHERE i * 1.0 / ((sa.sz + sb.sz - i) * 1.0) >= 0.05),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs),
             |reach(id, r) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 60
             |  UNION
             |  SELECT e.dst, r.r FROM edges e JOIN reach r ON r.id = e.src)
             |SELECT id AS doc_id, min(r) AS component
             |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The df-capped (scale) configuration of d9, hash-verified: candidate
    // pairs must share at least one DISCRIMINATIVE shingle (document
    // frequency <= 5 here); intersections are still verified over ALL
    // shingles, so surviving pairs carry the true jaccard. The oracle
    // encodes exactly those cap semantics — this is the configuration a
    // 100-TB caller runs (stop-phrase shingles otherwise make quadratic
    // buckets), and with this entry it is oracle-gated, not just
    // property-tested (ScaleOpsSpec planted-hot-shingle cases).
    QDef("d9b_jaccard_dfcap",
      (s, dir) => Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 60),
        "text", "doc_id", n = 2, tau = 0.05, dfMax = 5L)
        .select(col("a"), col("b"), dec4(col("jaccard")).as("jac"))
        .orderBy("a", "b"),
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id AS doc, g FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
             |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS g
             |    FROM documents WHERE doc_id < 60) t),
             |disc AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 5),
             |capped AS (SELECT * FROM sh WHERE g IN (SELECT g FROM disc)),
             |cand AS (SELECT DISTINCT a.doc AS a, b.doc AS b
             |         FROM capped a JOIN capped b ON a.g = b.g AND a.doc < b.doc),
             |sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT c.a, c.b, count(*) AS i
             |          FROM cand c
             |          JOIN sh x ON x.doc = c.a
             |          JOIN sh y ON y.doc = c.b AND y.g = x.g
             |          GROUP BY 1, 2)
             |SELECT a, b, CAST(i * 1.0 / ((sa.sz + sb.sz - i) * 1.0) AS DECIMAL(38,4)) AS jac
             |FROM inter
             |JOIN sizes sa ON sa.doc = a
             |JOIN sizes sb ON sb.doc = b
             |WHERE i * 1.0 / ((sa.sz + sb.sz - i) * 1.0) >= 0.05
             |ORDER BY a, b""".stripMargin)),

    // Winnowing-style fingerprint (min-md5 over char 8-grams).
    QDef("d10_fingerprint",
      (s, dir) => Tables.parallel(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_min(list_transform(range(1, length(text) - 6), i -> md5(substring(text, i, 8)))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Token counting: whitespace + BPE-ish regex proxy.
    QDef("d11_token_counts",
      (s, dir) => Tables.parallel(Tables.load(s, dir, "documents"))
        .select(col("doc_id"),
          TF.tokenCount(col("text")).as("ws_tokens"),
          TF.bpeTokenCount(col("text")).as("bpe_tokens"),
          length(col("text")).as("n"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
              |  CAST(len(regexp_extract_all(text, '${TF.bpeTokenPattern}')) AS INTEGER) AS bpe_tokens,
              |  CAST(length(text) AS INTEGER) AS n
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Brute-force cosine KNN via the Similarity operator (ANN baseline;
    // the LSH-bucketed scale path is exercised in SimilaritySpec).
    QDef("d12_knn_bruteforce",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 3)
          .select(col("qid"), col("rank"), col("id"), dec4(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      },
      Some(s"""SELECT qid, rank, id, CAST(cos AS DECIMAL(38,4)) AS cos FROM (
              |  SELECT q.vec_id AS qid, c.vec_id AS id,
              |    ${VF.oracleCosineSql("q.embedding", "c.embedding")} AS cos,
              |    row_number() OVER (PARTITION BY q.vec_id
              |      ORDER BY ${VF.oracleCosineSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
              |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              |  WHERE q.vec_id < 10) t
              |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin)),

    // Embedding-cosine near-duplicate pairs: all (a, b) with cosine ≥ τ.
    // Brute-force on a bounded id range — the exact baseline the ANN paths
    // are measured against; at corpus scale candidates come from the
    // sign-LSH / IVF bucketed joins in operators/Similarity (recall-gated
    // in OperatorSpec/ScaleOpsSpec), with this exact cosine as the verify.
    QDef("d21_embedding_neardup",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
        val l = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
        val r = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
        l.crossJoin(r).filter(col("a") < col("b"))
          .withColumn("cos", VF.cosine(col("ea"), col("eb")))
          .filter(col("cos") >= 0.35)
          .select(col("a"), col("b"), dec4(col("cos")).as("cos"))
          .orderBy("a", "b")
      },
      Some(s"""SELECT a.vec_id AS a, b.vec_id AS b,
              |  CAST(${VF.oracleCosineSql("a.embedding", "b.embedding")} AS DECIMAL(38,4)) AS cos
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE a.vec_id < 200 AND b.vec_id < 200
              |  AND ${VF.oracleCosineSql("a.embedding", "b.embedding")} >= 0.35
              |ORDER BY a, b""".stripMargin)),

    // Training-sequence packing: concatenate documents in id order and cut
    // at a token budget — per SHARD, which is how packing distributes: each
    // shard's running sum is a window over ITS partition only, so no global
    // single-partition window ever exists and shards pack independently on
    // as many executors as there are shards (the per-shard frame state is
    // one running sum). seq is the training-sequence ordinal within the
    // shard; (shard, seq) is the packed unit.
    QDef("d22_sequence_pack",
      (s, dir) => {
        val docs = Tables.parallel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), (col("doc_id") % 32).as("shard"),
            TF.tokenCount(col("text")).as("toks"))
        val w = Window.partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs
          .withColumn("seq",
            floor((sum(col("toks")).over(w) - col("toks")) / lit(2048)))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, shard, toks,
             |  CAST(floor((sum(toks) OVER (PARTITION BY shard ORDER BY doc_id) - toks) / 2048) AS BIGINT) AS seq
             |FROM (
             |  SELECT doc_id, doc_id % 32 AS shard,
             |    CAST(len(string_split(text, ' ')) AS INTEGER) AS toks
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // Corpus mixture sampling: deterministic per-language keep rates via the
    // d19 md5-hash fraction (en downsampled to 1/2, es/de to 4/5, zh/fr kept
    // whole) — the "data mixture" step of a training pipeline, reproducible
    // across runs/engines because the coin is a hash, not an RNG. Narrow
    // (filter only), no shuffle before the final ordering.
    QDef("d23_mixture_sample",
      (s, dir) => Tables.load(s, dir, "documents")
        .withColumn("hv",
          expr("conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10)").cast("int"))
        .withColumn("threshold",
          when(col("lang") === "en", 32768)
            .when(col("lang") === "es" || col("lang") === "de", 52428)
            .otherwise(65536))
        .filter(col("hv") < col("threshold"))
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS hv,
             |    CASE WHEN lang = 'en' THEN 32768
             |         WHEN lang IN ('es','de') THEN 52428
             |         ELSE 65536 END AS threshold
             |  FROM documents) t
             |WHERE hv < threshold
             |ORDER BY doc_id""".stripMargin)),

    // Fuzzy (edit-distance) string join via q-gram filter-and-verify —
    // candidates from a shingle equi-join, never a quadratic cross join.
    QDef("d15_fuzzy_string_join",
      (s, dir) => graft.operators.StringSimilarity.fuzzyJoin(
        Tables.load(s, dir, "part").filter(col("p_partkey") < 1000),
        "p_name", "p_partkey", q = 2, maxDist = 1)
        .orderBy("a", "b"),
      Some("""SELECT a.p_partkey AS a, b.p_partkey AS b,
             |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
             |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
             |WHERE a.p_partkey < 1000 AND b.p_partkey < 1000
             |  AND levenshtein(a.p_name, b.p_name) <= 1
             |ORDER BY a, b""".stripMargin)),

    // Composite end-to-end cleaning pipeline — what a training-data job
    // actually chains: quality gate → exact dedup → near-dup cluster
    // representative selection → per-language corpus stats. Each stage is a
    // library operator; the whole thing is one lazy plan (no materialization
    // between stages).
    QDef("d14_clean_corpus_pipeline",
      (s, dir) => {
        val docs = Tables.parallel(Tables.load(s, dir, "documents"))
        val quality = docs.filter(
          col("n_chars") >= 100 && TF.tokenCount(col("text")) >= 20)
          .select("doc_id", "lang", "n_chars", "text")
        // Rep selection is ONE partial-aggregating pass per dedup stage:
        // min_by keeps the whole min-doc_id row per key, so the partial
        // aggregate combines map-side to at most one candidate row per
        // (key, partition) before the shuffle — the MORE duplicated the
        // corpus, the LESS it shuffles, with no semi-join back and no
        // recomputation of the upstream subtree (the round-1 windows
        // shuffled every payload byte twice; the semi-join variant
        // re-evaluated the quality scan per join side). No join, no
        // window: each stage is scan → partial agg → one exchange.
        def reps(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column) =
          df.groupBy(key.as("__k"))
            .agg(min_by(struct(df.columns.map(col): _*), col("doc_id")).as("__r"))
            .select(col("__r.*"))
        val exactD = reps(quality, sha2(col("text"), 256))
        val cleaned = reps(exactD, TF.minhashSignature(col("text"), 4))
        cleaned.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            dec4(avg(TF.tokenCount(col("text")).cast("double"))).as("avg_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH quality AS (
              |  SELECT doc_id, lang, n_chars, text FROM documents
              |  WHERE n_chars >= 100 AND len(string_split(text, ' ')) >= 20),
              |exact_d AS (
              |  SELECT * FROM (
              |    SELECT q.*, min(doc_id) OVER (PARTITION BY sha256(text)) AS exact_rep
              |    FROM quality q) t WHERE doc_id = exact_rep),
              |near_d AS (
              |  SELECT * FROM (
              |    SELECT e.*, min(doc_id) OVER (PARTITION BY ${TF.oracleMinhashSignatureSql("text", 4)}) AS near_rep
              |    FROM exact_d e) t WHERE doc_id = near_rep)
              |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
              |  CAST(avg(len(string_split(text, ' ')) * 1.0) AS DECIMAL(38,4)) AS avg_tokens
              |FROM near_d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // PII scrubbing: emails/phones normalized to placeholder tokens. The
    // fixture corpus is synthetic word soup, so PII is injected identically
    // in both engines before scrubbing — the scrub regexes are the operator
    // under test.
    QDef("d16_pii_scrub",
      (s, dir) => {
        val withPii = when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact bob@example.com now")))
          .when(col("doc_id") % 10 === 5,
            concat(col("text"), lit(" call 555-867-5309 today")))
          .otherwise(col("text"))
        Tables.parallel(Tables.load(s, dir, "documents"))
          .withColumn("t2", withPii)
          .select(col("doc_id"),
            regexp_replace(
              regexp_replace(col("t2"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
              "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>").as("clean"))
          .filter(col("clean").contains("<EMAIL>") || col("clean").contains("<PHONE>"))
          .select(col("doc_id"),
            substring(col("clean"), -30, 30).as("tail"))
          .orderBy("doc_id")
      },
      Some("""WITH injected AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0 THEN text || ' contact bob@example.com now'
             |         WHEN doc_id % 10 = 5 THEN text || ' call 555-867-5309 today'
             |         ELSE text END AS t2
             |  FROM documents),
             |scrubbed AS (
             |  SELECT doc_id,
             |    regexp_replace(regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             |                   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
             |  FROM injected)
             |SELECT doc_id, substring(clean, length(clean) - 29, 30) AS tail
             |FROM scrubbed
             |WHERE clean LIKE '%<EMAIL>%' OR clean LIKE '%<PHONE>%'
             |ORDER BY doc_id""".stripMargin)),

    // Repetition signal: type-token ratio (distinct/total tokens) — low TTR
    // marks boilerplate/spam for training-data filtering.
    QDef("d17_repetition_ttr",
      (s, dir) => {
        val t = TF.tokens(col("text"))
        Tables.parallel(Tables.load(s, dir, "documents"))
          .select(col("doc_id"),
            size(array_distinct(t)).as("distinct_toks"),
            size(t).as("total_toks"),
            dec4(size(array_distinct(t)).cast("double") / size(t).cast("double")).as("ttr"))
          .filter(col("ttr") < 0.5)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS distinct_toks,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS total_toks,
             |  CAST(len(list_distinct(string_split(text, ' '))) * 1.0
             |       / (len(string_split(text, ' ')) * 1.0) AS DECIMAL(38,4)) AS ttr
             |FROM documents
             |WHERE len(list_distinct(string_split(text, ' '))) * 1.0
             |      / (len(string_split(text, ' ')) * 1.0) < 0.5
             |ORDER BY doc_id""".stripMargin)),

    // L2 normalization of embeddings (vector preprocessing before ANN):
    // identical fold-ordered norm in both engines → bit-equal components.
    QDef("d18_l2_normalize",
      (s, dir) => {
        val norm = sqrt(VF.norm2(col("embedding")))
        Tables.load(s, dir, "embeddings").filter(col("vec_id") < 50)
          .select(col("vec_id"),
            dec4(element_at(col("embedding"), 1).cast("double") / norm).as("e1"),
            dec4(element_at(col("embedding"), 2).cast("double") / norm).as("e2"),
            dec4(norm).as("norm"))
          .orderBy("vec_id")
      },
      Some {
        val normSql = s"sqrt(${
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
            "list_transform(list_zip(embedding, embedding), p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE))), " +
            "(acc, v) -> acc + v)"})"
        s"""SELECT vec_id,
           |  CAST(CAST(embedding[1] AS DOUBLE) / $normSql AS DECIMAL(38,4)) AS e1,
           |  CAST(CAST(embedding[2] AS DOUBLE) / $normSql AS DECIMAL(38,4)) AS e2,
           |  CAST($normSql AS DECIMAL(38,4)) AS norm
           |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin
      }),

    // Deterministic hash sampling (reproducible train/eval splits): keep a
    // doc iff an md5-derived value of its id falls under the rate — same
    // selection on every engine and every rerun, no rand().
    QDef("d19_hash_sample",
      (s, dir) => Tables.load(s, dir, "documents")
        .withColumn("hv", expr("conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10)").cast("int"))
        .filter(col("hv") % 10 === 0)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_sampled FROM (
             |  SELECT lang,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS hv
             |  FROM documents) t
             |WHERE hv % 10 = 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 64-bit SimHash near-dup with exact Hamming-≤3 recall via Manku-style
    // block-permutation banding (Dedup.simhash64NearDup — the corpus-scale
    // path; d8 keeps the legacy 16-bit signature). The oracle recomputes the
    // signature from md5 nibbles and takes rep = min id over the quadratic
    // Hamming-≤3 neighborhood — equal to the banded result BY GUARANTEE, so
    // this gate proves the recall claim, not just plausibility.
    QDef("d20_simhash64_neardup",
      (s, dir) => Dedup.simhash64NearDup(
        Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      Some(s"""WITH ${TF.oracleSimhash64Cte("documents", "doc_id", "text")},
              |rep AS (
              |  SELECT a.doc_id AS doc_id, min(b.doc_id) AS rep
              |  FROM simhash64_sig a JOIN simhash64_sig b
              |    ON bit_count(xor(a.sh, b.sh)) <= 3
              |  GROUP BY a.doc_id)
              |SELECT s.doc_id, s.sh AS simhash64, r.rep AS rep
              |FROM simhash64_sig s JOIN rep r ON s.doc_id = r.doc_id
              |ORDER BY s.doc_id""".stripMargin)),

    // Multimodal byte-stats over the opaque binary payload (decode itself is
    // the stubbed step — MultimodalSpec drives it).
    QDef("d13_multimodal_bytes",
      (s, dir) => Multimodal.byteStats(
        Multimodal.attachBinary(Tables.load(s, dir, "documents"), "doc_id", "text"))
        .orderBy("id"),
      Some("""SELECT doc_id AS id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 256 AS fake_channel
             |FROM documents ORDER BY id""".stripMargin)),

    // Benchmark decontamination (the "13-gram rule" at fixture scale): every
    // 20th doc plays the benchmark set; training docs sharing any word
    // 4-gram with it are flagged with their distinct-overlap count. The eval
    // shingle set is BROADCAST (benchmarks are small by definition), so the
    // training corpus is one narrow pass — no payload shuffle anywhere.
    QDef("d24_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.contaminationReport(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "text", "doc_id", n = 4)
          .orderBy("doc_id")
      },
      Some("""WITH ev AS (SELECT DISTINCT g FROM (
             |  SELECT unnest(list_transform(range(1, len(string_split(text,' ')) - 2),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
             |         string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) AS g
             |  FROM documents WHERE doc_id % 20 = 0) t),
             |tr AS (SELECT DISTINCT doc_id, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 2),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
             |         string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) AS g
             |  FROM documents WHERE doc_id % 20 <> 0) t)
             |SELECT doc_id, count(*) AS n_overlap
             |FROM tr JOIN ev USING (g)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bloom-prefiltered decontamination — the SAME report as
    // d24_decontaminate (and the same oracle SQL: filter-and-verify keeps
    // exactness), but the eval set rides a mergeable Bloom filter instead
    // of an exact broadcast, the scale path once the benchmark-shingle
    // union outgrows executor broadcast (Dedup.bloomContaminationReport).
    QDef("d31_bloom_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.bloomContaminationReport(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "text", "doc_id", n = 4, expectedEvalShingles = 200000L, fpp = 0.01)
          .orderBy("doc_id")
      },
      Some("""WITH ev AS (SELECT DISTINCT g FROM (
             |  SELECT unnest(list_transform(range(1, len(string_split(text,' ')) - 2),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
             |         string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) AS g
             |  FROM documents WHERE doc_id % 20 = 0) t),
             |tr AS (SELECT DISTINCT doc_id, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 2),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
             |         string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) AS g
             |  FROM documents WHERE doc_id % 20 <> 0) t)
             |SELECT doc_id, count(*) AS n_overlap
             |FROM tr JOIN ev USING (g)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Deterministic global training shuffle: shard + in-shard position from
    // an md5 coin — the reproducible replacement for ORDER BY rand() when
    // writing training shards. Per-shard windows ARE the scale path: shards
    // are the parallel unit (thousands at 100 TB), each sorts independently
    // after one hash-partition shuffle; no global sort, no RNG state.
    QDef("d25_train_shuffle",
      (s, dir) => {
        val hv = md5(concat(lit("shuf:"), col("doc_id").cast("string")))
        Tables.load(s, dir, "documents")
          .withColumn("hv", hv)
          .withColumn("shard",
            expr("cast(conv(substring(hv, 1, 4), 16, 10) as int) % 8"))
          .withColumn("pos", row_number().over(
            Window.partitionBy("shard").orderBy(col("hv"), col("doc_id"))))
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos")
      },
      Some("""SELECT doc_id, shard,
             |  row_number() OVER (PARTITION BY shard ORDER BY hv, doc_id) AS pos
             |FROM (SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hv,
             |        CAST(('0x' || substring(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 8 AS shard
             |      FROM documents) t
             |ORDER BY shard, pos""".stripMargin)),

    // Cross-corpus near-dup: which src0 (new crawl) docs near-duplicate a
    // src1 (standing corpus) doc — incremental-ingest dedup. Exact
    // filter-and-verify with shingle-join candidates; dfMax vacuous here so
    // the oracle is the literal quadratic cross Jaccard (the cap's scale
    // behavior is gated in ScaleOpsSpec, same argument as d9). Bounded
    // baseline (round-11 verdict, the d12 pattern): the uncapped exact
    // definition is quadratic in shingle df, so the declared input is the
    // FIXED slice doc_id < 5000 — a no-op at sf<=0.1 (max doc_id 4999, so
    // the oracle contract is bit-identical) that freezes the baseline's
    // cost at larger sf. d26b is the unbounded-corpus scale face.
    QDef("d26_cross_corpus_neardup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 5000)
        Dedup.ngramJaccardPairsCross(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") === "src1"),
          "text", "doc_id", n = 2, tau = 0.05, dfMax = Long.MaxValue)
          .select(col("a"), col("b"), col("inter"), dec4(col("jaccard")).as("jac"))
          .orderBy("a", "b")
      },
      Some("""WITH sa AS (SELECT DISTINCT doc_id AS a, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS g
             |  FROM documents WHERE source = 'src0' AND doc_id < 5000) t),
             |sb AS (SELECT DISTINCT doc_id AS b, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS g
             |  FROM documents WHERE source = 'src1' AND doc_id < 5000) t),
             |za AS (SELECT a, count(*) AS sza FROM sa GROUP BY 1),
             |zb AS (SELECT b, count(*) AS szb FROM sb GROUP BY 1),
             |inter AS (SELECT a, b, count(*) AS i FROM sa JOIN sb USING (g) GROUP BY 1, 2)
             |SELECT a, b, i AS inter,
             |  CAST(i * 1.0 / ((za.sza + zb.szb - i) * 1.0) AS DECIMAL(38,4)) AS jac
             |FROM inter JOIN za USING (a) JOIN zb USING (b)
             |WHERE i * 1.0 / ((za.sza + zb.szb - i) * 1.0) >= 0.05
             |ORDER BY a, b""".stripMargin)),

    // The SCALE PATH for d26 (round 11): same cross-corpus Jaccard but
    // through ngramJaccardPairsCrossAtScale's REQUIRED finite df cap.
    // BENCH_sf1 measured why the pairing exists: d26's exact all-pairs
    // definition is quadratic in shingle df, and the 10x-replicated sf1
    // corpus inflates its TRUE output ~100x (7.7k -> 775.6k pairs, 59 s)
    // — sublinear per output row, but the output itself is the blowup. A
    // df cap bounds the per-shingle join fan-out, which is the only knob
    // that keeps incremental-crawl dedup linear at 100 TB (the d9/d9b
    // pairing, cross-corpus). The oracle reproduces the cap exactly:
    // discriminative shingles are counted on the REFERENCE side, candidate
    // pairs must share one, intersections then run over FULL shingle sets.
    QDef("d26b_cross_corpus_dfcap",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.ngramJaccardPairsCrossAtScale(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") === "src1"),
          "text", "doc_id", dfMax = 50L, n = 2, tau = 0.05)
          .select(col("a"), col("b"), col("inter"), dec4(col("jaccard")).as("jac"))
          .orderBy("a", "b")
      },
      Some("""WITH sa AS (SELECT DISTINCT doc_id AS a, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS g
             |  FROM documents WHERE source = 'src0') t),
             |sb AS (SELECT DISTINCT doc_id AS b, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS g
             |  FROM documents WHERE source = 'src1') t),
             |disc AS (SELECT g FROM sb GROUP BY g HAVING count(*) <= 50),
             |cand AS (SELECT DISTINCT a, b FROM sa JOIN sb USING (g)
             |         WHERE g IN (SELECT g FROM disc)),
             |za AS (SELECT a, count(*) AS sza FROM sa GROUP BY 1),
             |zb AS (SELECT b, count(*) AS szb FROM sb GROUP BY 1),
             |inter AS (SELECT c.a, c.b, count(*) AS i
             |          FROM cand c
             |          JOIN sa x ON x.a = c.a
             |          JOIN sb y ON y.b = c.b AND y.g = x.g
             |          GROUP BY 1, 2)
             |SELECT a, b, i AS inter,
             |  CAST(i * 1.0 / ((za.sza + zb.szb - i) * 1.0) AS DECIMAL(38,4)) AS jac
             |FROM inter JOIN za USING (a) JOIN zb USING (b)
             |WHERE i * 1.0 / ((za.sza + zb.szb - i) * 1.0) >= 0.05
             |ORDER BY a, b""".stripMargin)),

    // Corpus TF-IDF: top-3 characteristic terms per doc, df over the FULL
    // corpus. Rational idf (N+1)/(df+1) — a standard no-log idf variant,
    // chosen because integer-count division is bit-deterministic across
    // engines (ln differs in the last ulp between libm implementations).
    QDef("d27_tfidf_topk",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.TfIdf.topTerms(docs, "text", "doc_id", k = 3)
          .filter(col("doc_id") < 50)
          .select("doc_id", "term", "tf", "df", "score")
          .orderBy("doc_id", "term")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df
             |       FROM (SELECT DISTINCT doc_id, term FROM tok) t GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents),
             |scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |    CAST(tf.tf AS DOUBLE) * (CAST(n.n + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)) AS score
             |  FROM tf JOIN df USING (term) CROSS JOIN n)
             |SELECT doc_id, term, tf, df, score FROM (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
             |  FROM scored) x
             |WHERE rn <= 3 AND doc_id < 50
             |ORDER BY doc_id, term""".stripMargin)),

    // Exact-quota stratified sampling: exactly k docs per language, chosen
    // by md5 order — the exact-budget companion to d23's rate-based mixture
    // (training mixes are usually specified as exact token/doc budgets).
    // Deterministic across engines and reruns; the per-stratum window sorts
    // only each language's partition (languages are the parallel unit; a
    // skewed stratum at 100 TB would swap row_number for a two-phase
    // threshold: sample the stratum's hash distribution, cut at the quota
    // quantile, exact-trim the boundary bucket).
    QDef("d28_stratified_sample",
      (s, dir) => {
        val hv = md5(concat(lit("strat:"), col("doc_id").cast("string")))
        Tables.load(s, dir, "documents")
          .withColumn("hv", hv)
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang").orderBy(col("hv"), col("doc_id"))))
          .filter(col("rn") <= 40)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), min(col("hv")).as("first_hv"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n, min(hv) AS first_hv
             |FROM (SELECT lang, hv,
             |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
             |      FROM (SELECT lang, doc_id,
             |              md5('strat:' || CAST(doc_id AS VARCHAR)) AS hv
             |            FROM documents) h) t
             |WHERE rn <= 40
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The capstone composition: quality gate → exact dedup → benchmark
    // decontamination → exact per-language quota — each stage the library
    // operator itself (exactIds / decontaminate), not a re-derivation, so
    // this query breaks if any operator's semantics drift. Scale shape is
    // the sum of its parts: narrow quality filter, keys-only dedup shuffle,
    // broadcast decontamination, per-stratum windows.
    QDef("d29_prep_pipeline",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .filter(col("n_chars").between(100, 500))
        val train0 = docs.filter(col("doc_id") % 20 =!= 0)
        val evalDocs = docs.filter(col("doc_id") % 20 === 0)
        val deduped = train0.join(
          Dedup.exactIds(train0, "text", "doc_id").select("doc_id"),
          Seq("doc_id"), "left_semi")
        val clean = Dedup.decontaminate(deduped, evalDocs, "text", "doc_id", n = 4)
        clean
          .withColumn("hv", md5(concat(lit("pick:"), col("doc_id").cast("string"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang").orderBy(col("hv"), col("doc_id"))))
          .filter(col("rn") <= 10)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      Some("""WITH q AS (SELECT doc_id, text, lang FROM documents
             |           WHERE n_chars BETWEEN 100 AND 500),
             |tr AS (SELECT * FROM q WHERE doc_id % 20 <> 0),
             |surv AS (SELECT min(doc_id) AS doc_id FROM tr GROUP BY sha256(text)),
             |dd AS (SELECT tr.* FROM tr JOIN surv USING (doc_id)),
             |evg AS (SELECT DISTINCT g FROM (
             |  SELECT unnest(list_transform(range(1, len(string_split(text,' ')) - 2),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
             |         string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) AS g
             |  FROM q WHERE doc_id % 20 = 0) t),
             |bad AS (SELECT DISTINCT doc_id FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 2),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
             |         string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) AS g
             |  FROM dd) d JOIN evg USING (g)),
             |clean AS (SELECT doc_id, lang FROM dd
             |          WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = dd.doc_id))
             |SELECT doc_id, lang FROM (
             |  SELECT *, row_number() OVER (PARTITION BY lang
             |    ORDER BY md5('pick:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM clean) x
             |WHERE rn <= 10 ORDER BY doc_id""".stripMargin)),

    // D37 symmetric int8 embedding quantization (operators/Quantize) — the
    // 4x storage/bandwidth cut that makes billion-vector columns scannable.
    // Per-row narrow HOF arithmetic; outputs are integers (scale and error
    // in fixed nano-units) so the gate is exact. The oracle also proves the
    // reconstruction bound empirically: max_err_e9 ~ scale_e9/2.
    QDef("d37_embed_quantize",
      (s, dir) => {
        val q = Quantize.int8(
          Tables.load(s, dir, "embeddings").select("vec_id", "embedding"),
          "embedding")
        q.select(col("vec_id"),
            floor(col("scale") * lit(1e9)).cast("long").as("scale_e9"),
            col("q_sum"), col("q_min"), col("q_max"), col("n_sat"),
            col("max_err_e9"))
          .orderBy("vec_id")
      },
      Some("""WITH q AS (
             |  SELECT vec_id, embedding,
             |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
             |  FROM embeddings),
             |c AS (
             |  SELECT vec_id, scale,
             |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
             |         ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)/scale + 0.5) AS BIGINT)) END AS codes,
             |    embedding
             |  FROM q)
             |SELECT vec_id,
             |  CAST(floor(scale * 1e9) AS BIGINT) AS scale_e9,
             |  CAST(list_sum(codes) AS BIGINT) AS q_sum,
             |  CAST(list_min(codes) AS BIGINT) AS q_min,
             |  CAST(list_max(codes) AS BIGINT) AS q_max,
             |  CAST(len(list_filter(codes, c -> abs(c) = 127)) AS BIGINT) AS n_sat,
             |  CAST(list_max(list_transform(list_zip(embedding, codes), p ->
             |    floor(abs(CAST(struct_extract(p,1) AS DOUBLE) - CAST(struct_extract(p,2) AS DOUBLE) * scale) * 1e9))) AS BIGINT) AS max_err_e9
             |FROM c ORDER BY vec_id""".stripMargin)),

    // D38 sliding-window chunking (operators/Chunker): documents to
    // overlapping 16-token windows at stride 12 — the doc-to-context-length
    // step of a trainer feed. posexplode fan-out is per-row narrow work;
    // chunk identity is pinned by md5 over the window text.
    QDef("d38_chunk_overlap",
      (s, dir) => {
        Chunker.slidingWindow(
            Tables.load(s, dir, "documents").select("doc_id", "text"),
            "text", window = 16, stride = 12)
          .select(col("doc_id"),
            col("chunk_idx").cast("long").as("chunk_idx"),
            col("tok_start").cast("long").as("tok_start"),
            col("n_tok"), col("chunk_hash"), col("first_tok"), col("last_tok"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 12)) AS tok_start FROM t),
             |c AS (SELECT doc_id, tok_start // 12 AS chunk_idx, tok_start,
             |             toks[tok_start+1 : least(tok_start+16, len(toks))] AS chunk
             |      FROM s)
             |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             |       CAST(tok_start AS BIGINT) AS tok_start,
             |       CAST(len(chunk) AS BIGINT) AS n_tok,
             |       md5(array_to_string(chunk, ' ')) AS chunk_hash,
             |       chunk[1] AS first_tok, chunk[len(chunk)] AS last_tok
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // D39 dataset card: the per-source corpus report a training pipeline
    // publishes with every snapshot — doc/token/char totals, language
    // spread, exact-dup rate. One partial-aggregating shuffle on `source`
    // (low cardinality); token counts are computed in the map side's narrow
    // projection, so at 100 TB this is one pass + a tiny reduce. All-integer
    // output keeps the gate exact.
    QDef("d39_corpus_report",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"), col("n_chars"),
            sha2(col("text"), 256).as("h"),
            TF.tokenCount(col("text")).cast("long").as("tok"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("tok").as("total_tokens"),
            sum("n_chars").as("total_chars"),
            countDistinct(col("lang")).as("n_langs"),
            countDistinct(col("h")).as("n_unique_texts"))
          .withColumn("n_dup_docs", col("n_docs") - col("n_unique_texts"))
          .orderBy("source")
      },
      Some("""SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |  CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_unique_texts,
             |  CAST(count(*) - count(DISTINCT sha256(text)) AS BIGINT) AS n_dup_docs
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Gopher repetition rules (Rae et al. 2021 §A1.1): per-doc fraction of
    // bigram instances that are the single most common bigram, and fraction
    // of trigram instances in duplicated trigrams. The Spark side never
    // explodes — both numerators are sorted-run folds over the per-row
    // shingle array (TF.maxRunCount / dupElemCount), pure codegen HOF work
    // with ZERO shuffle at any scale; the oracle recomputes them as the
    // per-doc group-by counts they summarize. Contract: docs with fewer
    // than 3 tokens have no trigram (and possibly no bigram) instances, so
    // neither fraction is defined — they are EXCLUDED on both sides (the
    // Spark filter below mirrors the oracle's inner join, which drops any
    // doc_id absent from the bigram or trigram count tables). Gopher itself
    // never scores such docs: its length gate (>= 50 words) runs first.
    // Pinned by TextEdgeSpec "gopher repetition excludes sub-trigram docs".
    QDef("d40_gopher_repetition",
      (s, dir) => {
        val toks = TF.tokens(col("text"))
        // sub-trigram exclusion as a CHEAP pre-filter: total_tri >= 1 (and
        // a fortiori total_bi >= 1) iff the doc has >= 3 tokens. Filtering
        // on the post-fold aliases instead lets predicate pushdown inline
        // the expensive shingle folds into the Filter, recomputing them per
        // row (r13 bench: 2.3x on this query).
        Tables.parallel(Tables.load(s, dir, "documents"))
          .filter(size(toks) >= 3)
          .select(col("doc_id"),
            TF.wordShinglesOf(toks, 2).as("bi"),
            TF.wordShinglesOf(toks, 3).as("tri"))
          .select(col("doc_id"),
            TF.maxRunCount(col("bi")).as("top2"),
            size(col("bi")).as("total_bi"),
            TF.dupElemCount(col("tri")).as("dup3"),
            size(col("tri")).as("total_tri"))
          .withColumn("top2_frac",
            dec4(col("top2").cast("double") / col("total_bi").cast("double")))
          .withColumn("dup3_frac",
            dec4(col("dup3").cast("double") / col("total_tri").cast("double")))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(s)),
             |         i -> s[i] || ' ' || s[i+1])) AS g FROM tk),
             |tri AS (SELECT doc_id, unnest(list_transform(range(1, len(s) - 1),
             |         i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2])) AS g FROM tk),
             |bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
             |tc AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
             |bs AS (SELECT doc_id, CAST(max(c) AS INTEGER) AS top2,
             |         CAST(sum(c) AS INTEGER) AS total_bi FROM bc GROUP BY 1),
             |ts AS (SELECT doc_id,
             |         CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS INTEGER) AS dup3,
             |         CAST(sum(c) AS INTEGER) AS total_tri FROM tc GROUP BY 1)
             |SELECT doc_id, top2, total_bi, dup3, total_tri,
             |  CAST(CAST(top2 AS DOUBLE) / CAST(total_bi AS DOUBLE) AS DECIMAL(38,4)) AS top2_frac,
             |  CAST(CAST(dup3 AS DOUBLE) / CAST(total_tri AS DOUBLE) AS DECIMAL(38,4)) AS dup3_frac
             |FROM bs JOIN ts USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Corpus-trained bigram-LM predictability (the CCNet perplexity filter
    // in exact integer-ratio form — operators/NgramLm.scala has the full
    // determinism and scale argument). Counts tables are vocabulary-sized;
    // the two scoring joins broadcast at these SFs and hash-join at web
    // scale. Low scores = gibberish/shuffled-boilerplate candidates.
    QDef("d41_bigram_predictability",
      (s, dir) => {
        NgramLm.bigramPredictability(
          Tables.parallel(Tables.load(s, dir, "documents")), "text", "doc_id")
          .orderBy("doc_id")
      },
      Some(NgramLm.oracleBigramPredictabilitySql(
        "documents", "doc_id", "text") + " ORDER BY doc_id")),

    // One distributed Lloyd iteration end-to-end under the driver's hash:
    // RNG-free md5 top-k seeds → full-corpus argmin assignment → exact
    // (DECIMAL-cast) component means → reassignment against the moved
    // centroids. Proves operators/KMeans.scala's distributed fit step
    // cell-for-cell against an oracle that re-derives the same iteration
    // in SQL (KMeansSpec proves multi-iteration convergence/determinism;
    // this pins the per-iteration math cross-engine). The k×64 centroid
    // matrix is the only driver-resident state.
    QDef("d42_kmeans_iter",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val m = graft.operators.KMeans.fit(
          e, "embedding", "vec_id", k = 4, maxIter = 1, withInertia = false)
        graft.operators.KMeans.assign(
            e, "embedding", m.centroids.map(_.toSeq).toSeq)
          .select(col("vec_id"), col("cell"))
          .orderBy("vec_id")
      },
      Some(s"""WITH sd AS (SELECT vec_id, embedding FROM embeddings
              |  ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
              |seeds AS (SELECT embedding, row_number() OVER (
              |    ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
              |  FROM sd),
              |a0 AS (SELECT vec_id, embedding, cell FROM (
              |  SELECT e.vec_id, e.embedding, s.cell,
              |    row_number() OVER (PARTITION BY e.vec_id
              |      ORDER BY ${VF.oracleL2sqSql("e.embedding", "s.embedding")}, s.cell) AS rn
              |  FROM embeddings e CROSS JOIN seeds s) t WHERE rn = 1),
              |dims AS (SELECT unnest(range(1, len(embedding) + 1)) AS i
              |  FROM (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1)),
              |cm AS (SELECT cell, i,
              |    CAST(CAST(sum(CAST(embedding[i] AS DECIMAL(28,8))) AS DOUBLE)
              |         / count(*) AS FLOAT) AS c
              |  FROM a0 CROSS JOIN dims GROUP BY cell, i),
              |cagg AS (SELECT cell, list(c ORDER BY i) AS centroid FROM cm GROUP BY cell),
              |cents AS (SELECT s.cell, coalesce(c.centroid, s.embedding) AS centroid
              |  FROM seeds s LEFT JOIN cagg c USING (cell))
              |SELECT vec_id, CAST(cell AS INTEGER) AS cell FROM (
              |  SELECT e.vec_id, c.cell,
              |    row_number() OVER (PARTITION BY e.vec_id
              |      ORDER BY ${VF.oracleL2sqSql("e.embedding", "c.centroid")}, c.cell) AS rn
              |  FROM embeddings e CROSS JOIN cents c) t WHERE rn = 1
              |ORDER BY vec_id""".stripMargin)),

    // SemDeDup semantic dedup (Abbas et al. 2023): cluster embeddings to
    // seed centroids, prune within clusters — a row drops iff a LOWER-ID
    // row in the SAME cell has cosine >= tau (order-free survivor rule).
    // Pairing is cluster-local by construction — the quadratic term is
    // Σ|cell|², governed by k (SemDeDup's own scale knob) — and the
    // declared input is the d12-pattern fixed slice so the baseline's cost
    // is frozen while the oracle contract stays exact at every tested SF.
    QDef("d43_semantic_dedup",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 5000)
        val seeds = e.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("int").as("cell"),
            col("embedding").as("centroid"))
        Dedup.semanticDedupSeeds(e, "vec_id", "embedding", seeds, tau = 0.35)
          .select(col("vec_id"), col("cell"),
            col("dropped").cast("int").as("dropped"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5000),
              |seeds AS (SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS centroid
              |  FROM e WHERE vec_id < 8),
              |asg AS (SELECT vec_id, embedding, cell FROM (
              |  SELECT e.vec_id, e.embedding, s.cell,
              |    row_number() OVER (PARTITION BY e.vec_id
              |      ORDER BY ${VF.oracleL2sqSql("e.embedding", "s.centroid")}, s.cell) AS rn
              |  FROM e CROSS JOIN seeds s) t WHERE rn = 1),
              |drp AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
              |  ON a.cell = b.cell AND a.vec_id < b.vec_id
              |  WHERE ${VF.oracleCosineSql("a.embedding", "b.embedding")} >= 0.35)
              |SELECT a.vec_id, a.cell,
              |  CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS dropped
              |FROM asg a LEFT JOIN drp d USING (vec_id) ORDER BY a.vec_id""".stripMargin)),

    // Capstone for the round-12 signals (the d29 pattern: composed FROM the
    // library operators, not re-derived): a FineWeb-recipe curation pass —
    // Gopher top-bigram repetition gate (≤ 8% of instances, in exact 1e-4
    // units) AND bigram-LM predictability gate (≥ 0.033 in 1e-8 units) AND
    // exact-dup survivorship. Every signal and threshold is INTEGER
    // arithmetic end to end — the whole pipeline has no floating point, so
    // the gate is exact at any scale by construction. One narrow scan
    // computes the repetition fold; the LM joins are the d41 shape; dedup
    // is one hash aggregate.
    QDef("d44_curation_pipeline",
      (s, dir) => {
        val docs = Tables.parallel(Tables.load(s, dir, "documents"))
        val toks = TF.tokens(col("text"))
        val rep = docs.select(
          col("doc_id"),
          TF.maxRunCount(TF.wordShinglesOf(toks, 2)).cast("long").as("top2"),
          (size(TF.wordShinglesOf(toks, 2))).cast("long").as("total_bi"))
          .select(col("doc_id"),
            expr("(top2 * 10000) DIV total_bi").as("top2_e4"))
        val lm = NgramLm.bigramPredictability(docs, "text", "doc_id")
          .select(col("doc_id"), col("pred_e8"))
        val survivors = Dedup.exactIds(docs, "text", "doc_id").select("doc_id")
        docs.select("doc_id", "lang")
          .join(rep, "doc_id")
          .join(lm, "doc_id")
          .join(survivors, Seq("doc_id"), "left_semi")
          .filter(col("top2_e4") <= 800 && col("pred_e8") >= 3300000L)
          .select("doc_id", "lang", "top2_e4", "pred_e8")
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
              |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(s)),
              |         i -> s[i] || ' ' || s[i+1])) AS g FROM tk),
              |bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
              |rep AS (SELECT doc_id, (max(c) * 10000) // sum(c) AS top2_e4
              |        FROM bc GROUP BY 1),
              |lm AS (${NgramLm.oracleBigramPredictabilitySql(
                         "documents", "doc_id", "text").replace("\n", "\n  ")}),
              |surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text))
              |SELECT d.doc_id, d.lang, CAST(rep.top2_e4 AS BIGINT) AS top2_e4, lm.pred_e8
              |FROM documents d
              |JOIN rep USING (doc_id) JOIN lm USING (doc_id) JOIN surv USING (doc_id)
              |WHERE rep.top2_e4 <= 800 AND lm.pred_e8 >= 3300000
              |ORDER BY d.doc_id""".stripMargin)),

    // Cross-document duplicated spans (Dedup.dupSpans): 6-token windows
    // whose fingerprint recurs in >= 2 distinct docs — the boilerplate
    // signal document-level dedup misses. One map-side-combined groupBy on
    // the span fingerprint; the declared face is the worst-100 offenders
    // by (n_docs, n_occurrences) with the fingerprint as the deterministic
    // tie-break, which plans as a TakeOrdered, never a total sort.
    QDef("d45_dup_spans",
      (s, dir) => {
        Dedup.dupSpans(
          Tables.parallel(Tables.load(s, dir, "documents")),
          "text", "doc_id", n = 6)
          .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("fp"))
          .limit(100)
      },
      Some("""WITH sp AS (SELECT doc_id, md5(g) AS fp FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(s) - 4),
             |    i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' ||
             |         s[i+3] || ' ' || s[i+4] || ' ' || s[i+5])) AS g
             |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) t))
             |SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_occurrences,
             |  CAST(min(doc_id) AS BIGINT) AS min_doc
             |FROM sp GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
             |ORDER BY n_docs DESC, n_occurrences DESC, fp LIMIT 100""".stripMargin)),

    // Duplicated-chunk REMOVAL verdicts (Dedup.chunkDedup — the C4 §2.2 /
    // RefinedWeb line-dedup rule over non-overlapping 10-token chunks,
    // first-occurrence-wins): d45 mines the offender spans; this decides
    // per doc how much text survives span-level dedup, in exact basis
    // points, and whether the doc clears the keep-half gate. One fingerprint
    // shuffle (window min = owner), one doc agg — no corpus-sized join.
    QDef("d46_chunk_dedup",
      (s, dir) => {
        Dedup.chunkDedup(
          Tables.parallel(Tables.load(s, dir, "documents")),
          "text", "doc_id", width = 10)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |ch AS (SELECT doc_id, unnest(list_transform(range(0, len(s) // 10),
             |         i -> md5(array_to_string(s[i*10+1 : i*10+10], ' ')))) AS fp
             |       FROM tk),
             |ow AS (SELECT fp, min(doc_id) AS owner FROM ch GROUP BY 1)
             |SELECT doc_id,
             |  CAST(count(*) AS INTEGER) AS total_chunks,
             |  CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS INTEGER)
             |    AS kept_chunks,
             |  CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) * 10000
             |       // count(*) AS INTEGER) AS kept_bp,
             |  (sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) * 2 >= count(*))
             |    AS survives
             |FROM ch JOIN ow USING (fp)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023; operators/Dsir.scala has
    // the published-recipe mapping and the exact-integer rationale): score
    // every doc's hashed-bigram profile against the lang='en' target slice.
    // The learned state is one 64-row bucket table (broadcast); weights are
    // exact 1e-4-unit BIGINTs, so the gate is cell-exact cross-engine —
    // the property the floating-point log-likelihood form cannot have.
    QDef("d47_dsir_weights",
      (s, dir) => {
        graft.operators.Dsir.importanceWeights(
          Tables.parallel(Tables.load(s, dir, "documents")),
          "text", "doc_id", isTarget = col("lang") === "en", buckets = 64)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS s
             |            FROM documents),
             |gi AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(s)),
             |         i -> s[i] || ' ' || s[i+1])) AS g FROM tk),
             |gb AS (SELECT doc_id, lang,
             |         CAST(('0x' || substring(md5(g), 1, 4)) AS INTEGER) % 64 AS b
             |       FROM gi),
             |bc AS (SELECT b, count(*) AS scnt,
             |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tcnt
             |       FROM gb GROUP BY 1),
             |tot AS (SELECT sum(scnt) AS s_tot, sum(tcnt) AS t_tot FROM bc),
             |r AS (SELECT b, (tcnt + 1) * (s_tot + 64) * 10000
             |        // ((scnt + 1) * (t_tot + 64)) AS rb FROM bc, tot),
             |ds AS (SELECT doc_id, count(*) AS n_grams, sum(rb) AS sr
             |       FROM gb JOIN r USING (b) GROUP BY 1)
             |SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams,
             |  CAST(sr // n_grams AS BIGINT) AS weight_1e4
             |FROM ds ORDER BY doc_id""".stripMargin)),

    // Domain balancing (operators/Curation): blocklist anti-join, then keep
    // at most 15 docs per source preferring the longest (ties by doc_id) —
    // the RefinedWeb/Dolma "no domain eats the mix" stage. One broadcast
    // anti-join + one shuffle on the domain key; the per-domain TopN window
    // sorts only its own domain's rows.
    QDef("d48_domain_cap",
      (s, dir) => {
        val blocked = s.createDataFrame(Seq("src7", "src13").map(Tuple1(_)))
          .toDF("domain")
        graft.operators.Curation.domainCap(
          graft.operators.Curation.blocklistFilter(
            Tables.parallel(Tables.load(s, dir, "documents")),
            "source", blocked),
          "source", "n_chars", "doc_id", cap = 15)
          .groupBy("source")
          .agg(count(lit(1)).as("kept"),
            sum("n_chars").as("kept_chars"),
            min("n_chars").as("cap_floor_chars"))
          .orderBy("source")
      },
      Some("""WITH kept AS (
             |  SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS keep_rank
             |  FROM documents WHERE source NOT IN ('src7','src13'))
             |SELECT source, CAST(count(*) AS BIGINT) AS kept,
             |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
             |  CAST(min(n_chars) AS BIGINT) AS cap_floor_chars
             |FROM kept WHERE keep_rank <= 15
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Temperature-weighted mixture allocation at alpha=0.5 with Hamilton
    // largest-remainder rounding (operators/Curation): every domain's
    // sample budget out of 1000, summing to exactly 1000. Exact BIGINT
    // arithmetic end to end — IEEE requires sqrt/*/floor to be correctly
    // rounded, so floor(sqrt(n)*1e6) is bit-identical cross-engine (the
    // reason alpha is pinned at 0.5: libm `pow` is not).
    QDef("d49_temperature_mix",
      (s, dir) => graft.operators.Curation.sqrtTemperatureAllocation(
        Tables.parallel(Tables.load(s, dir, "documents")),
        "source", budget = 1000L)
        .orderBy("domain"),
      Some("""WITH c AS (SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs
             |           FROM documents GROUP BY 1),
             |w AS (SELECT domain, n_docs,
             |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
             |          AS weight_e6 FROM c),
             |t AS (SELECT CAST(sum(weight_e6) AS BIGINT) AS w_tot FROM w),
             |b AS (SELECT domain, n_docs, weight_e6,
             |        (1000 * weight_e6) // w_tot AS base,
             |        (1000 * weight_e6) % w_tot AS rem FROM w, t),
             |s AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS seats FROM b),
             |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, domain) AS rn
             |      FROM b)
             |SELECT domain, n_docs, weight_e6,
             |  CAST(base + CASE WHEN rn <= seats THEN 1 ELSE 0 END AS BIGINT) AS alloc
             |FROM r, s ORDER BY domain""".stripMargin)),

    // Content-defined chunk dedup (Dedup.cdcChunkDedup): d46 with rolling-
    // hash boundaries instead of fixed offsets — a token insertion shifts
    // every fixed-width chunk but only the edited neighborhood of CDC
    // chunks (the rsync/FastCDC argument, in token space; ScaleOpsSpec
    // proves the shift-robustness delta head to head). Same verdict schema
    // and scale shape as d46: narrow explode, one fingerprint-keyed
    // shuffle of (hash, id) pairs, one doc agg.
    QDef("d50_cdc_chunk_dedup",
      (s, dir) => graft.operators.Dedup.cdcChunkDedup(
        Tables.parallel(Tables.load(s, dir, "documents")),
        "text", "doc_id", divisor = 8)
        .orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |hs AS (SELECT doc_id, s,
             |         list_transform(s, t ->
             |           CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)) AS th
             |       FROM tk),
             |bd AS (SELECT doc_id, s,
             |         list_filter(range(3, len(s) + 1),
             |           i -> (th[i-2]*9173 + th[i-1]*97 + th[i]) % 8 = 0) AS b
             |       FROM hs),
             |en AS (SELECT doc_id, s,
             |         CASE WHEN len(b) > 0 AND b[-1] = len(s) THEN b
             |              ELSE list_append(b, CAST(len(s) AS BIGINT)) END AS ends
             |       FROM bd),
             |ch AS (SELECT doc_id, unnest(list_transform(range(1, len(ends) + 1),
             |         j -> md5(array_to_string(
             |           s[(CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END):(ends[j])],
             |           ' ')))) AS fp
             |       FROM en),
             |ow AS (SELECT fp, min(doc_id) AS owner FROM ch GROUP BY 1)
             |SELECT doc_id,
             |  CAST(count(*) AS INTEGER) AS total_chunks,
             |  CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS INTEGER)
             |    AS kept_chunks,
             |  CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) * 10000
             |       // count(*) AS INTEGER) AS kept_bp,
             |  (sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) * 2 >= count(*))
             |    AS survives
             |FROM ch JOIN ow USING (fp)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Trainable quality classifier, frozen-weights inference face
    // (operators/QualityClassifier + QualityModel): the fastText /
    // FineWeb-Edu classifier stage beside the rule-based (d40), LM-based
    // (d41) and importance-based (d47) filters. The 512-bucket logistic
    // model was trained ONCE by QualityClassifier.train (spec-gated —
    // logistic training needs exp, which is libm-divergent cross-engine)
    // and shipped as 1e4 fixed-point literals, so inference is pure BIGINT
    // arithmetic both engines compute identically: margin_sum = sum of
    // per-gram bucket weights, margin = FLOOR(sum/n) spelled out as a CASE
    // on BOTH sides — Spark `div` AND DuckDB `//` truncate toward zero on
    // negatives, so neither bare operator is floor — and pass via an
    // integer cross-multiply so no division can flip a verdict. Zero-join
    // shape: weights ride the plan as an array literal, one narrow gram
    // explode, one doc-keyed agg.
    QDef("d51_quality_score",
      // Tables.parallel is LOAD-BEARING here, not cargo cult: score() is
      // deliberately zero-join/zero-shuffle (weights ride as a literal), so
      // unlike every shuffling query nothing downstream ever re-partitions —
      // a one-row-group fixture would run the whole gram explode on one
      // core. At production scale the scan already yields enough splits and
      // parallel() is a no-op (see its scaladoc).
      (s, dir) => graft.operators.QualityClassifier.score(
        Tables.parallel(Tables.load(s, dir, "documents")),
        "text", "doc_id",
        graft.operators.QualityModel.weights1e4,
        graft.operators.QualityModel.bias1e4,
        graft.operators.QualityModel.buckets)
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT [
             |    1514, 1371, 0, 0, 0, 0, -2441, 516, -156, -1578,
             |    -1043, 0, -106, 0, -81, -227, -154, 3417, 3189, 5098,
             |    3884, -3726, -2751, -540, -1779, -958, 4462, 0, -1313, -2027,
             |    -804, -3988, -3879, -452, 0, 1239, 0, -2126, 902, 0,
             |    953, -1788, 2310, -646, 1822, -2927, 1480, -1719, -1657, 995,
             |    -65, 0, 115, 0, -1425, 5176, -3221, -1111, -5617, -846,
             |    6242, -525, -540, 8635, 1308, -4236, 356, -2216, -261, 2961,
             |    -943, -2642, 1191, -293, -4216, -61, -2891, 1397, 0, -1736,
             |    1440, 0, -969, 1569, -1671, 1958, -1290, 0, -146, 863,
             |    0, 0, 0, -761, -407, 0, -1427, 2077, 195, -3129,
             |    0, -2909, -1741, 0, 1133, 15, 272, -1441, -1993, -2187,
             |    -2197, 2491, -1864, 5325, 0, 1674, 1595, 946, -1079, 1464,
             |    -918, -324, -732, 4636, 1646, 529, 1766, 333, -1442, 629,
             |    0, 924, -1861, 0, -3014, -755, 0, 1396, 47, -1800,
             |    -2327, 222, 3834, 3305, 0, 29, 0, 0, -522, 120,
             |    -7024, 4659, 0, -4050, 0, -2249, 252, -2470, 599, 27,
             |    -2186, -1638, -837, 0, 401, 0, -2890, 0, 199, 0,
             |    -851, 1920, 0, -8000, 978, 710, 3720, -1286, 3151, -800,
             |    -1805, -4635, 1922, -2923, -1645, 264, 258, 948, 1586, 40,
             |    2147, -1808, 2719, 1572, 0, 2595, 0, 0, 625, -1106,
             |    -866, 0, -1418, -66, -717, 0, -4367, 5075, 146, 2109,
             |    678, 0, -1167, 1129, 3422, 909, 7169, 185, 0, 447,
             |    0, 0, 198, 0, 1619, 1386, 2814, -5830, -1568, 1513,
             |    -710, 1812, 1227, 2551, 0, 3325, -1450, 4753, 2725, -4045,
             |    0, -1401, 894, 0, 2316, -3467, 2363, -1052, 3705, -2059,
             |    0, -3410, 810, 0, -1586, -1893, 0, 1220, 2950, 0,
             |    0, 3341, 2767, 4247, 2284, -2685, -5552, -2108, 2358, 871,
             |    -1948, -113, 0, 1834, -1256, 2107, -2558, -1031, -1710, 8485,
             |    1778, -2761, 528, -3065, -2963, 0, 0, 0, -520, 4570,
             |    0, 4203, -1863, 880, -1604, 0, 2135, -1211, -5531, 0,
             |    -3184, 0, 1744, 0, 1116, 3158, 188, 696, 0, -4916,
             |    -525, -4055, 0, 1746, 407, 0, -58, 488, -3473, 0,
             |    0, 0, 1151, -1550, 0, 2001, 1208, -243, 2741, 611,
             |    -3798, -198, -2066, 2190, 2963, -638, 1362, -5209, 0, 1627,
             |    2761, -4172, -1437, -848, -4485, 917, 1981, 0, -3491, 867,
             |    1356, 4356, 2306, -2597, -3668, 0, -2114, -524, 2779, 0,
             |    1773, 2419, -1687, 4037, -128, 0, 478, 0, -1421, -1739,
             |    944, -75, 1026, 1245, 0, 334, -7029, 1266, -2377, 785,
             |    664, -1493, -1371, 0, 1638, -2056, 748, -1317, 1868, 2861,
             |    -451, 758, 671, -2087, -120, -388, -1945, -1580, 0, 551,
             |    -3674, 0, 282, -793, 0, 2388, 2419, -2459, -1757, 0,
             |    1635, -1748, 0, 1169, -1194, 2299, 3907, -275, -4322, -568,
             |    576, 900, 1837, -2274, -1684, -3597, -1323, -1450, 0, 32,
             |    0, 961, -1042, -926, -3502, -541, 565, 1142, 3009, 0,
             |    4537, -1639, -2925, -576, 1847, 8147, 1146, -984, -1061, 0,
             |    -177, 1586, 760, -5310, -1685, 0, -1381, -794, 0, -801,
             |    0, 126, 2667, 525, 3650, 1072, 4556, -2116, 2363, 1689,
             |    -188, -847, 1792, 0, 0, -1586, 1828, 2971, -364, 1044,
             |    -327, -4062, -739, 0, 0, -2172, -3493, 532, -1308, -233,
             |    0, 5492, -4068, 0, 203, 4466, 1600, 0, -3708, 76,
             |    228, -167, -56, -2759, -731, 3838, -2747, -1080, 4262, 269,
             |    214, 8670
             |  ] AS wl),
             |tk AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |gi AS (SELECT doc_id, unnest(list_transform(range(1, len(s)),
             |         i -> s[i] || ' ' || s[i+1])) AS g FROM tk),
             |gb AS (SELECT doc_id,
             |         CAST(('0x' || substring(md5(g), 1, 4)) AS INTEGER) % 512 AS b
             |       FROM gi),
             |ds AS (SELECT doc_id, count(*) AS n_grams,
             |         sum(wl[b + 1]) AS ms FROM gb, w GROUP BY doc_id)
             |SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams,
             |  CAST(ms AS BIGINT) AS margin_sum_1e4,
             |  CAST(CASE WHEN ms >= 0 THEN ms // n_grams
             |       ELSE -((-ms + n_grams - 1) // n_grams) END AS BIGINT)
             |    AS margin_1e4,
             |  (ms + 64 * n_grams >= 0) AS pass
             |FROM ds ORDER BY doc_id""".stripMargin)),

    // URL -> registrable-domain canonicalization (operators/Urls): the glue
    // between a raw crawl (URLs) and the domain-keyed balancing operators
    // d48/d49 (clean domain column). URLs are constructed deterministically
    // from the fixture (schemes, userinfo, subdomain chains, multi-label
    // ccTLD suffixes, punycode TLDs, ports, and a malformed shape every
    // 11th doc); the Spark side parses with try_parse_url + the bundled
    // public-suffix reduction, the oracle mirrors the parse with a regexp.
    // Pure per-row projection — zero shuffle at any corpus size.
    QDef("d52_registrable_domain",
      (s, dir) => {
        val docs = Tables.parallel(Tables.load(s, dir, "documents"))
        val url = expr(
          """CASE WHEN doc_id % 11 = 0 THEN concat('not a url ', source)
            |ELSE concat(
            |  CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END,
            |  CASE WHEN doc_id % 4 = 0 THEN 'crawler:secret@' ELSE '' END,
            |  CASE WHEN doc_id % 3 = 0 THEN 'www.'
            |       WHEN doc_id % 3 = 1 THEN 'cdn.assets.' ELSE '' END,
            |  source,
            |  CASE doc_id % 5 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com.au'
            |       WHEN 2 THEN '.org' WHEN 3 THEN '.xn--p1ai'
            |       ELSE '.com' END,
            |  CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END,
            |  '/p/', CAST(doc_id AS STRING)) END""".stripMargin)
        docs.select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            graft.operators.Urls.host(col("url")).as("host"))
          .withColumn("domain",
            graft.operators.Urls.registrableDomain(col("host")))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (SELECT doc_id,
             |  CASE WHEN doc_id % 11 = 0 THEN 'not a url ' || source
             |  ELSE
             |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
             |    (CASE WHEN doc_id % 4 = 0 THEN 'crawler:secret@' ELSE '' END) ||
             |    (CASE WHEN doc_id % 3 = 0 THEN 'www.'
             |          WHEN doc_id % 3 = 1 THEN 'cdn.assets.' ELSE '' END) ||
             |    source ||
             |    (CASE doc_id % 5 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com.au'
             |          WHEN 2 THEN '.org' WHEN 3 THEN '.xn--p1ai'
             |          ELSE '.com' END) ||
             |    (CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END) ||
             |    '/p/' || CAST(doc_id AS VARCHAR) END AS url
             |  FROM documents),
             |h AS (SELECT doc_id,
             |  lower(nullif(regexp_extract(url,
             |    '^[a-z]+://(?:[^/@]+@)?([^/:?#]+)', 1), '')) AS host FROM u),
             |r AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM h)
             |SELECT doc_id, host,
             |  CASE WHEN host IS NULL THEN NULL
             |       WHEN len(ls) <= 2 THEN host
             |       WHEN array_to_string(ls[-2:], '.') IN ('co.uk', 'com.au')
             |         THEN array_to_string(ls[-3:], '.')
             |       ELSE array_to_string(ls[-2:], '.') END AS domain
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Standing near-dup index (operators/NearDupIndex): d26b's semantics —
    // df-capped cross-corpus Jaccard — with the REFERENCE side read from a
    // materialized, INCREMENTALLY-MAINTAINED catalog index instead of
    // re-shingling the standing corpus per run. The declared face
    // exercises the full lifecycle: seed the docs table with most of src1,
    // bootstrap the shingle index, land the remaining docs as a changelog
    // batch, fold them in with one incremental refresh, then probe with
    // src0 — so the oracle (d26b's, verbatim semantics) only passes if
    // incremental == recomputed. Scale: refresh work is |changed docs| ×
    // shingles/doc; the probe is the same one-shuffle candidate join as
    // d26b with the reference side a column-pruned keyed-table scan.
    QDef("d53_standing_neardup_index",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // the lifecycle is deterministic per fixture dir, so the built
        // index is memoized like the benchFn's (one root per JVM per dir,
        // not a leaked temp dir per invocation — both row orders and
        // repeated runs probe the same standing index)
        val root = ScanQueries.memoized(s"d53decl:$dir") { t =>
          val cat = new graft.catalog.KuduLikeCatalog(s, t)
          val ref = docs.filter(col("source") === "src1").select("doc_id", "text")
          cat.createTable(graft.catalog.TableDef("refdocs",
            ref.schema, Seq("doc_id"), buckets = 4))
          cat.insert("refdocs", ref.filter(col("doc_id") % 3 =!= 0))
          val v0 = cat.currentVersion("refdocs")
          val ep = cat.baseEpoch("refdocs")
          val ex = graft.operators.NearDupIndex.ShingleExtractor(2)
          graft.operators.NearDupIndex.bootstrap(
            cat, "ndx", cat.table("refdocs"), "text", "doc_id", ex)
          cat.upsert("refdocs", ref.filter(col("doc_id") % 3 === 0))
          graft.operators.NearDupIndex.refresh(cat, "ndx", "refdocs",
            v0, cat.currentVersion("refdocs"), ep, "text", "doc_id", ex)
        }
        val cat = new graft.catalog.KuduLikeCatalog(s, root)
        graft.operators.NearDupIndex.probeJaccard(
          cat, "ndx", docs.filter(col("source") === "src0"),
          "text", "doc_id", dfMax = 50L, tau = 0.05)
          .select(col("a"), col("b"), col("inter"), dec4(col("jaccard")).as("jac"))
          .orderBy("a", "b")
      },
      Some("""WITH sa AS (SELECT DISTINCT doc_id AS a, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS g
             |  FROM documents WHERE source = 'src0') t),
             |sb AS (SELECT DISTINCT doc_id AS b, g FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS g
             |  FROM documents WHERE source = 'src1') t),
             |disc AS (SELECT g FROM sb GROUP BY g HAVING count(*) <= 50),
             |cand AS (SELECT DISTINCT a, b FROM sa JOIN sb USING (g)
             |         WHERE g IN (SELECT g FROM disc)),
             |za AS (SELECT a, count(*) AS sza FROM sa GROUP BY 1),
             |zb AS (SELECT b, count(*) AS szb FROM sb GROUP BY 1),
             |inter AS (SELECT c.a, c.b, count(*) AS i
             |          FROM cand c
             |          JOIN sa x ON x.a = c.a
             |          JOIN sb y ON y.b = c.b AND y.g = x.g
             |          GROUP BY 1, 2)
             |SELECT a, b, i AS inter,
             |  CAST(i * 1.0 / ((za.sza + zb.szb - i) * 1.0) AS DECIMAL(38,4)) AS jac
             |FROM inter JOIN za USING (a) JOIN zb USING (b)
             |WHERE i * 1.0 / ((za.sza + zb.szb - i) * 1.0) >= 0.05
             |ORDER BY a, b""".stripMargin),
      benchFn = Some { (s, dir) =>
        // index built once per fixture dir (the s16 memoization lesson):
        // the timed lambda is the PROBE — the per-crawl-epoch cost a
        // standing index exists to isolate
        val root = ScanQueries.memoized(s"d53:$dir") { t =>
          val cat = new graft.catalog.KuduLikeCatalog(s, t)
          val ref = Tables.load(s, dir, "documents")
            .filter(col("source") === "src1").select("doc_id", "text")
          cat.createTable(graft.catalog.TableDef("refdocs",
            ref.schema, Seq("doc_id"), buckets = 4))
          cat.insert("refdocs", ref)
          graft.operators.NearDupIndex.bootstrap(
            cat, "ndx", cat.table("refdocs"), "text", "doc_id",
            graft.operators.NearDupIndex.ShingleExtractor(2))
        }
        val cat = new graft.catalog.KuduLikeCatalog(s, root)
        graft.operators.NearDupIndex.probeJaccard(
          cat, "ndx",
          Tables.load(s, dir, "documents").filter(col("source") === "src0"),
          "text", "doc_id", dfMax = 50L, tau = 0.05)
          .select(col("a"), col("b"), col("inter"), dec4(col("jaccard")).as("jac"))
          .orderBy("a", "b")
      }),

    // Standing EMBEDDING index (operators/EmbeddingIndex, round-15): the
    // d53 lifecycle on the vector side — seed the corpus table with 2/3 of
    // the standing vectors, bootstrap the frozen IVF+PQ quantizers and the
    // (id, cell, codes) index, land the remaining third as a changelog
    // batch, fold it in with ONE incremental refresh commit, then answer
    // ANN queries through the standing index: IVFADC candidates (codes
    // scanned per probed cell), exact raw-cosine re-rank of the shortlist
    // (the d12 expression — bit-exact vs the oracle). The oracle is the
    // global exact top-3, so it only passes if the refreshed third is IN
    // the index (10 of the 30 expected rows come from it) and the
    // ADC shortlist kept every true neighbor. Probe internals are
    // additionally spec-gated bit-identical to the batch ivfPqTopK.
    QDef("d54_standing_embedding_index",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val root = ScanQueries.memoized(s"d54decl:$dir") { t =>
          val cat = new graft.catalog.KuduLikeCatalog(s, t)
          val ref = emb.filter(col("vec_id") >= 10)
          cat.createTable(graft.catalog.TableDef("refemb",
            ref.schema, Seq("vec_id"), buckets = 4))
          cat.insert("refemb", ref.filter(col("vec_id") % 3 =!= 0))
          val v0 = cat.currentVersion("refemb")
          val ep = cat.baseEpoch("refemb")
          graft.operators.EmbeddingIndex.bootstrap(cat, "emx",
            cat.table("refemb"), "vec_id", "embedding",
            cells = 4, m = 8, ksub = 16)
          cat.upsert("refemb", ref.filter(col("vec_id") % 3 === 0))
          graft.operators.EmbeddingIndex.refresh(cat, "emx", "refemb",
            v0, cat.currentVersion("refemb"), ep, "vec_id", "embedding")
        }
        val cat = new graft.catalog.KuduLikeCatalog(s, root)
        val queries = emb.filter(col("vec_id") < 10)
        // exhaustive probe settings: all cells, unbounded shortlist — the
        // candidate set is exactly the index MEMBERSHIP, so the global
        // top-3 oracle gates the lifecycle (a doc the refresh failed to
        // fold in cannot appear); ADC pruning quality at realistic
        // (nprobe, rerank) is gated by EmbeddingIndexSpec, not this oracle
        val shortlist = graft.operators.EmbeddingIndex.probe(cat, "emx",
          queries, cat.table("refemb"),
          k = Int.MaxValue, nprobe = 4, rerank = Int.MaxValue)
          .select("qid", "id")
        val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val c = emb.select(col("vec_id").as("id"), col("embedding").as("ce"))
        val exact = shortlist.join(q, "qid").join(c, "id")
          .withColumn("cos", VF.cosine(col("qe"), col("ce")))
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
        exact.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("rank"), col("id"), dec4(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      },
      Some(s"""SELECT qid, rank, id, CAST(cos AS DECIMAL(38,4)) AS cos FROM (
              |  SELECT q.vec_id AS qid, c.vec_id AS id,
              |    ${VF.oracleCosineSql("q.embedding", "c.embedding")} AS cos,
              |    row_number() OVER (PARTITION BY q.vec_id
              |      ORDER BY ${VF.oracleCosineSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
              |  FROM embeddings q JOIN embeddings c ON c.vec_id >= 10
              |  WHERE q.vec_id < 10) t
              |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin),
      benchFn = Some { (s, dir) =>
        // the PRODUCTION read shape (round-16 item 8): bounded (nprobe,
        // rerank) so the ratchet times the IVFADC pruning a deployment
        // actually runs — the declared face's exhaustive settings exist
        // only to make the DuckDB oracle a global exact top-k. Same
        // memoized index as the declared face (probe-only timing).
        val emb = Tables.load(s, dir, "embeddings")
        val root = ScanQueries.memoized(s"d54decl:$dir") { t =>
          val cat = new graft.catalog.KuduLikeCatalog(s, t)
          val ref = emb.filter(col("vec_id") >= 10)
          cat.createTable(graft.catalog.TableDef("refemb",
            ref.schema, Seq("vec_id"), buckets = 4))
          cat.insert("refemb", ref.filter(col("vec_id") % 3 =!= 0))
          val v0 = cat.currentVersion("refemb")
          val ep = cat.baseEpoch("refemb")
          graft.operators.EmbeddingIndex.bootstrap(cat, "emx",
            cat.table("refemb"), "vec_id", "embedding",
            cells = 4, m = 8, ksub = 16)
          cat.upsert("refemb", ref.filter(col("vec_id") % 3 === 0))
          graft.operators.EmbeddingIndex.refresh(cat, "emx", "refemb",
            v0, cat.currentVersion("refemb"), ep, "vec_id", "embedding")
        }
        val cat = new graft.catalog.KuduLikeCatalog(s, root)
        graft.operators.EmbeddingIndex.probe(cat, "emx",
          emb.filter(col("vec_id") < 10), cat.table("refemb"),
          k = 3, nprobe = 2, rerank = 32)
          .select(col("qid"), col("rank"), col("id"), dec4(col("cos")).as("cos"))
          .orderBy("qid", "rank")
      }),

    // Exact-substring duplicate spans (Dedup.exactSubstrSpans — Lee et al.
    // 2021's ExactSubstr verdict, the suffix-array dedup family): the
    // MAXIMAL token runs of each doc covered by >= 6-token substrings that
    // recur verbatim in another doc — d45's fixed-width mining generalized
    // to maximal runs via fingerprint adjacency (gaps-and-islands on
    // window positions). Two corpus-token-sized shuffles (fingerprint
    // groupBy+semi-join, then per-doc islands); a boilerplate fingerprint
    // duplicated across millions of docs reduces map-side to one row —
    // never a buffered window partition, never a suffix array.
    QDef("d55_exact_substr_spans",
      (s, dir) => {
        Dedup.exactSubstrSpans(
          Tables.parallel(Tables.load(s, dir, "documents")),
          "text", "doc_id", minLen = 6)
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |w AS (SELECT doc_id, i, md5(array_to_string(s[i : i+5], ' ')) AS fp
             |      FROM (SELECT doc_id, s, unnest(range(1, len(s) - 4)) AS i FROM tk) t),
             |dup AS (SELECT fp FROM w GROUP BY fp HAVING min(doc_id) <> max(doc_id)),
             |cov AS (SELECT doc_id, i,
             |          i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
             |        FROM w WHERE fp IN (SELECT fp FROM dup))
             |SELECT doc_id, CAST(min(i) - 1 AS BIGINT) AS span_start,
             |  CAST(max(i) - min(i) + 6 AS BIGINT) AS span_tokens
             |FROM cov GROUP BY doc_id, grp
             |ORDER BY doc_id, span_start""".stripMargin)),
  )
}
