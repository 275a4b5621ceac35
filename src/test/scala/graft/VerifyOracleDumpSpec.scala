package graft

import org.scalatest.funsuite.AnyFunSuite

/** The MATERIALIZED-CTE rewrite at the oracle-dump boundary must hit
  * every CTE head, skip recursive blocks, and never touch window specs
  * or derived-table subqueries. */
class VerifyOracleDumpSpec extends AnyFunSuite {

  test("CTE heads gain MATERIALIZED; chained round CTEs all covered") {
    val sql = """WITH a AS (SELECT 1 AS x),
                |b AS (SELECT x + 1 AS y FROM a),
                |c AS (
                | SELECT y FROM b JOIN b b2 ON b.y = b2.y)
                |SELECT * FROM c""".stripMargin
    val out = Verify.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1"))
    assert(out.contains("b AS MATERIALIZED (SELECT x"))
    assert(out.contains("c AS MATERIALIZED (\n SELECT y") ||
      out.contains("c AS MATERIALIZED (SELECT y"))
  }

  test("RECURSIVE oracles are left byte-identical") {
    val sql = """WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n + 1
                | FROM r WHERE n < 5), s AS (SELECT * FROM r)
                |SELECT * FROM s""".stripMargin
    assert(Verify.materializeCtes(sql) == sql)
  }

  test("window specs and non-SELECT parens are untouched") {
    val sql = """WITH t AS (SELECT v, sum(v) OVER w AS c
                | FROM x WINDOW w AS (ORDER BY v ROWS BETWEEN
                |  UNBOUNDED PRECEDING AND CURRENT ROW))
                |SELECT *, CAST(c AS BIGINT) FROM t""".stripMargin
    val out = Verify.materializeCtes(sql)
    assert(out.contains("t AS MATERIALIZED (SELECT v"))
    assert(out.contains("WINDOW w AS (ORDER BY v"))
    assert(out.contains("CAST(c AS BIGINT)"))
  }

  test("every shipped oracle rewrites to valid-looking SQL (no window hit)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val out = Verify.materializeCtes(sql)
      assert(!out.matches("(?is).*WINDOW\\s+\\w+\\s+AS MATERIALIZED.*"),
        s"$name: window spec corrupted")
      if (sql.contains("RECURSIVE")) assert(out == sql, s"$name changed")
    }
  }
}
