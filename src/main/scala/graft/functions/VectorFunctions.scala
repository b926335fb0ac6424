package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns (SURVEY.md D3, J10,
  * §2.8), built from codegen'd higher-order functions — no Scala UDF in the
  * hot path.
  *
  * Accumulation is an explicit left-to-right fold with a 0.0 init over
  * double-cast elements, and the cosine is `dot / sqrt(na * nb)`. The DuckDB
  * oracle states the same element order and operation order
  * ([[oracleCosineSql]]), so results are bit-identical across engines —
  * IEEE-754 ops are deterministic given identical operand order — and
  * threshold filters (`cos >= τ`) agree exactly.
  */
object VectorFunctions {

  /** Elementwise product fold: Σ a(i)·b(i), doubles, left to right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  /** HOF formulation — allocation-heavy; kept as the readable reference
    * implementation and for cross-checking [[cosine]] in tests.
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Native codegen cosine ([[CosineSimilarity]]): single fused loop, no
    * intermediate arrays, bit-identical to [[cosineHof]] and the oracle.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** DuckDB SQL computing the identical cosine (same fold order, same
    * operation tree) for two FLOAT[] columns named `a` and `b`.
    */
  def oracleCosineSql(a: String, b: String): String = {
    def dotSql(x: String, y: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(list_zip($x, $y), p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE))), " +
        "(acc, v) -> acc + v)"
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"
  }

  /** DuckDB SQL for [[graft.operators.KMeans.l2sq]]'s squared-L2 fold —
    * identical element order and operation tree, so distances (and any
    * argmin over them) agree bit-exactly across engines.
    */
  def oracleL2sqSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), p -> " +
      s"(CAST(struct_extract(p, 1) AS DOUBLE) - CAST(struct_extract(p, 2) AS DOUBLE)) * " +
      s"(CAST(struct_extract(p, 1) AS DOUBLE) - CAST(struct_extract(p, 2) AS DOUBLE)))), " +
      "(acc, v) -> acc + v)"
}
