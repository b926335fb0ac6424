package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract lint: the SparkEntry maps must stay structurally sound —
  * a duplicate query name or an oracle pointing at a missing query would
  * silently shrink the graded surface.
  */
class ContractSpec extends AnyFunSuite {

  test("query names are unique and well-formed") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicates: ${names.diff(names.distinct).distinct}")
    assert(names.forall(_.matches("[a-z0-9_]+")), "names must be snake_case")
  }

  test("every oracle key has a query; oracles are non-empty single statements") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(qs.contains(k), s"oracle $k has no query")
      assert(sql.trim.nonEmpty && !sql.trim.endsWith(";"))
    }
    // every declared query is oracle-checked in this build (no weaker
    // rows-only fallbacks)
    assert(SparkEntry.oracleSql.keySet === qs)
  }

  test("inventory size matches the survey ledger claim") {
    assert(SparkEntry.all.size === 125, s"ledger says 125, found ${SparkEntry.all.size}")
  }
}
