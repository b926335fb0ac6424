package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import graft.functions.{InterleaveBits, QuantileBucketId}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Z-order clustering contracts: Morton-key math, layout-only semantics
  * (compacted content identical), and the actual data-skipping win —
  * row-group min/max stats on the SECOND dimension prune under z-order
  * where linear clustering leaves them useless.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("InterleaveBits produces the textbook Morton code") {
    // interleave(x=0b101, y=0b011) with 3 bits = x2 y2 x1 y1 x0 y0 = 0b100111
    val df = Seq((5, 3)).toDF("x", "y")
    val z = df.select(ColumnBridge.column(InterleaveBits(
      Seq(ColumnBridge.expression(col("x")), ColumnBridge.expression(col("y"))),
      bits = 3)).as("z"))
    assert(z.head().getLong(0) === 0x27L) // 0b100111
    // z-curve locality: adjacent x at same y differ only in low bits
    val many = (0 until 8).flatMap(x => (0 until 8).map(y => (x, y))).toDF("x", "y")
    val zs = many.select(col("x"), col("y"), ColumnBridge.column(InterleaveBits(
      Seq(ColumnBridge.expression(col("x")), ColumnBridge.expression(col("y"))),
      bits = 3)).as("z")).collect()
    assert(zs.map(_.getLong(2)).distinct.length === 64, "z codes must be unique on a grid")
    assert(zs.map(_.getLong(2)).max === 63L)
  }

  test("QuantileBucketId: monotone, deterministic, null/NaN to bucket 0") {
    val bounds = Array(10.0, 20.0, 30.0)
    val df = Seq[java.lang.Double](5.0, 10.0, 15.0, 25.0, 35.0, null, Double.NaN)
      .toDF("v").select(col("v").cast(DoubleType).as("v"))
    val ids = df.select(ColumnBridge.column(
      QuantileBucketId(ColumnBridge.expression(col("v")), bounds)).as("b"))
      .collect().map(_.getInt(0)).toSeq
    // 5->0, 10 (== boundary) -> index of boundary, 15->1, 25->2, 35->3, null->0, NaN->0
    assert(ids === Seq(0, 0, 1, 2, 3, 0, 0))
    assert(df.selectExpr("v").schema.head.dataType === DoubleType)
  }

  /** Number of row groups whose [min,max] for `column` intersects [lo, hi],
    * plus the total group count, across every parquet file under dir.
    */
  private def overlappingGroups(
      dir: String, column: String, lo: Long, hi: Long): (Int, Int) = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    var overlap = 0; var total = 0
    files.foreach { f =>
      val footer = ParquetFileReader.readFooter(
        HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), new Configuration()),
        ParquetMetadataConverter.NO_FILTER)
      footer.getBlocks.forEach { block =>
        total += 1
        val colMeta = block.getColumns.asScala().find(
          _.getPath.toDotString == column).get
        val stats = colMeta.getStatistics
        val mn = stats.genericGetMin.asInstanceOf[Number].longValue()
        val mx = stats.genericGetMax.asInstanceOf[Number].longValue()
        if (mx >= lo && mn <= hi) overlap += 1
      }
    }
    (overlap, total)
  }

  private implicit class JListOps[T](l: java.util.List[T]) {
    def asScala(): Seq[T] = {
      val b = Seq.newBuilder[T]; l.forEach(b += _); b.result()
    }
  }

  test("z-order compaction: identical content, second-dimension row groups prune") {
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    val oldPage = hconf.get("parquet.page.size")
    // small row groups so a fixture-sized table has stats resolution
    hconf.setInt("parquet.block.size", 16 * 1024)
    hconf.setInt("parquet.page.size", 2 * 1024)
    try {
      val n = 150000
      // independent uniform grid: x and y carry no correlation, the
      // worst case for linear clustering's second column
      val rows = (0 until n).map(i => (i.toLong, (i % 300).toLong, (i / 300).toLong))
      val df = rows.toDF("id", "x", "y")

      def build(name: String, z: Boolean): String = {
        val tmp = tmpDir(s"graft_zorder_")
        val cat = new KuduLikeCatalog(spark, tmp)
        cat.createTable(TableDef(name, df.schema, Seq("id")))
        cat.insert(name, df)
        if (z) cat.compactZOrdered(name, Seq("x", "y"))
        else cat.compact(name, Seq("x", "y"))
        // layout never changes content
        val back = cat.table(name)
        assert(back.count() === n)
        assert(back.exceptAll(df).count() === 0)
        assert(df.exceptAll(back).count() === 0)
        cat.dataLocation(name)
      }

      val linDir = build("t_lin", z = false)
      val zDir = build("t_z", z = true)

      // predicate on the SECOND dimension: y BETWEEN 40 AND 49 (5% of rows)
      val (linY, linTotal) = overlappingGroups(linDir, "y", 40, 49)
      val (zY, zTotal) = overlappingGroups(zDir, "y", 40, 49)
      assert(linTotal > 20, s"need many row groups for a meaningful test, got $linTotal")
      // linear (x,y) sort leaves y spanning its domain in ~every group
      assert(linY.toDouble / linTotal > 0.8,
        s"unexpected: linear layout already prunes y ($linY/$linTotal)")
      // z-order must actually skip most groups on the y-only predicate
      assert(zY.toDouble / zTotal < 0.5,
        s"z-order failed to prune on y: $zY/$zTotal vs linear $linY/$linTotal")

      // and the FIRST dimension must still prune fine under z-order
      val (zX, _) = overlappingGroups(zDir, "x", 40, 49)
      assert(zX.toDouble / zTotal < 0.5,
        s"z-order lost x pruning: $zX/$zTotal")
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size") else hconf.set("parquet.block.size", oldBlock)
      if (oldPage == null) hconf.unset("parquet.page.size") else hconf.set("parquet.page.size", oldPage)
    }
  }
}
