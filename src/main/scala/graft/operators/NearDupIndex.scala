package graft.operators

import graft.catalog.{KuduLikeCatalog, TableDef}
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Standing near-duplicate index (round-13 verdict item 4): the reference
  * corpus's dedup signatures materialized as a keyed catalog table and
  * maintained INCREMENTALLY from the docs table's changelog — so an
  * incremental crawl probes a standing index instead of re-tokenizing and
  * re-shingling the whole standing corpus on every run (d26's batch shape).
  * The [[IncrementalAgg]] pattern applied to dedup state: everything is
  * sized by |changed docs|, never |corpus|.
  *
  * One index mechanism, two item kinds:
  *  - '''shingle postings''' (`(id, g)` — one row per distinct n-gram of a
  *    doc): the EXACT index. [[probeJaccard]] reproduces
  *    [[Dedup.ngramJaccardPairsCrossAtScale]] bit-for-bit (same candidates,
  *    same verification — the text form routes through the same core), so
  *    the declared face sits under d26b's oracle unchanged.
  *  - '''MinHash band signatures''' (`(id, "band|sig")`): the sub-linear
  *    probe. [[probeLsh]] reproduces the cross-corpus form of
  *    [[Dedup.minhashLshCandidates]] — recall is the LSH bound, gated in
  *    OperatorSpec/NearDupIndexSpec, not an oracle.
  *
  * Index table schema: `(id, item STRING)`, primary key BOTH columns —
  * hash-bucketed on the key so refresh deletes prune to the touched
  * buckets. Maintenance protocol per refresh window (from, to]:
  *  1. staleness guards — the window must not outrun the changelog
  *     (compact resets it) and the base epoch must be unchanged
  *     (base-append inserts bypass CDC); both fail loudly with a
  *     re-bootstrap instruction, exactly like [[IncrementalAgg.delta]];
  *  2. net change per doc = the LATEST change per key in the window
  *     (intermediate states cancel telescopically);
  *  3. the changed docs' OLD index rows are deleted by key — read FROM THE
  *     INDEX itself semi-joined to the changed ids (the old text is not
  *     needed, and the read is key-pruned);
  *  4. surviving (non-delete) changed docs re-extract items and insert.
  *
  * Scale shape: steps 3-4 shuffle |changed docs| × items/doc rows; the
  * probe is the same one-shuffle candidate join the batch operators use,
  * with the reference side now a parquet-backed keyed table scan (column-
  * pruned to (id, item)).
  */
object NearDupIndex {

  /** Distinct-shingle postings of a corpus: `(idCol, item)`. */
  def shingleItems(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol),
      explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
        .as("item"))

  /** MinHash banded signatures of a corpus: `(idCol, item)` with item =
    * `"<band>|<sig>"` — the banding of [[Dedup.minhashLshCandidates]]
    * flattened to one string key so both item kinds share one index
    * schema.
    */
  def bandItems(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = (0 until numHashes).map(i => TextFunctions.minhash(col(textCol), i))
    val bandCols = (0 until bands).map { b =>
      concat_ws("|", lit(b) +:
        sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand): _*)
    }
    docs.select(col(idCol), explode(array(bandCols: _*)).as("item"))
  }

  /** Create the index table and load it from the current docs frame.
    * `items` is one of [[shingleItems]]/[[bandItems]] partially applied —
    * the same extractor MUST be used for bootstrap, refresh, and probe.
    */
  def bootstrap(cat: KuduLikeCatalog, indexTable: String, docs: DataFrame,
      idCol: String, items: DataFrame => DataFrame,
      buckets: Int = 8): Long = {
    val idType = docs.schema(idCol).dataType
    cat.createTable(TableDef(indexTable,
      StructType(Seq(StructField(idCol, idType, nullable = false),
        StructField("item", StringType, nullable = false))),
      keyCols = Seq(idCol, "item"), buckets = buckets))
    cat.insert(indexTable, items(docs))
  }

  /** Fold the docs table's changes in (fromVersion, toVersion] into the
    * index. Returns the number of changed docs applied. The caller tracks
    * (version, baseEpoch) watermarks exactly as for [[IncrementalAgg]].
    */
  def refresh(cat: KuduLikeCatalog, indexTable: String, docsTable: String,
      fromVersion: Int, toVersion: Int, baseEpoch: Long,
      idCol: String, items: DataFrame => DataFrame): Long = {
    require(0 <= fromVersion && fromVersion <= toVersion,
      s"bad version window ($fromVersion, $toVersion]")
    val current = cat.currentVersion(docsTable)
    require(toVersion <= current,
      s"toVersion $toVersion exceeds current changelog version $current " +
        s"(table compacted?) — re-bootstrap the index")
    val epochNow = cat.baseEpoch(docsTable)
    require(epochNow == baseEpoch,
      s"base epoch moved ($baseEpoch -> $epochNow): rows were inserted via " +
        "the base-append path, which the changelog does not cover — " +
        "re-bootstrap the index")
    val changes = cat.changesBetween(docsTable, fromVersion, toVersion)
    // latest change per key wins (ties impossible: at most one change per
    // key per version batch — the catalog's in-batch dedup)
    val latest = changes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("version").desc)))
      .filter(col("__rn") === 1).drop("__rn", "version")
      .localCheckpoint() // consumed twice (delete keys + new items)
    val changedIds = latest.select(col(idCol)).distinct()
    // old index rows of every changed doc — read from the index itself
    val oldKeys = cat.table(indexTable)
      .join(changedIds, Seq(idCol), "left_semi")
      .select(col(idCol), col("item"))
    cat.deleteKeys(indexTable, oldKeys)
    val survivors = latest.filter(col("op") =!= "delete").drop("op")
    if (!survivors.isEmpty) cat.insert(indexTable, items(survivors))
    changedIds.count()
  }

  /** Exact cross-corpus Jaccard probe against a standing SHINGLE index —
    * [[Dedup.ngramJaccardPairsCrossAtScale]] with the reference side read
    * from the index (same core, bit-identical output).
    */
  def probeJaccard(newDocs: DataFrame, index: DataFrame, textCol: String,
      idCol: String, dfMax: Long, n: Int = 3, tau: Double = 0.05): DataFrame = {
    require(dfMax > 0 && dfMax < Long.MaxValue,
      s"probeJaccard requires a finite positive dfMax (got $dfMax)")
    Dedup.ngramJaccardPairsCrossFromPostings(newDocs,
      index.select(col(idCol).as("b"), col("item").as("g")),
      textCol, idCol, n, tau, dfMax)
  }

  /** LSH candidate probe against a standing BAND index: new docs' band
    * signatures joined to the index on the full band signature — the
    * cross-corpus form of [[Dedup.minhashLshCandidates]]. Returns
    * (a = new doc id, b = indexed doc id) distinct candidate pairs.
    */
  def probeLsh(newDocs: DataFrame, index: DataFrame, textCol: String,
      idCol: String, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val a = bandItems(newDocs, textCol, idCol, numHashes, bands)
      .select(col(idCol).as("a"), col("item"))
    val b = index.select(col(idCol).as("b"), col("item"))
    a.join(b, Seq("item")).select("a", "b").distinct()
  }
}
