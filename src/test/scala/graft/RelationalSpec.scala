package graft

import graft.queries.Relational

/** Smoke + spot checks for the relational operator suite at sf0.001.
  * Full value-level verification is the driver's DuckDB-oracle compare
  * (tools/oracle_check.py replicates it locally at sf0.01).
  */
class RelationalSpec extends SparkSpecBase {

  test("every query has an oracle and every oracle has a query") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("all queries execute at sf0.001 and return rows") {
    val counts = Relational.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).count()
    }
    val empty = counts.filter(_._2 == 0L).keys.toSeq.sorted
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("topk returns exactly 10 rows ordered by descending price") {
    val rows = Relational.queries("topk")(spark, sfDir).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("join_cross_theta yields C(5,2)=10 region pairs") {
    assert(Relational.queries("join_cross_theta")(spark, sfDir).count() == 10)
  }

  test("agg_tpch_q1 groups match distinct flag/status pairs") {
    val df = Relational.queries("agg_tpch_q1")(spark, sfDir)
    assert(df.count() > 0 && df.columns.contains("sum_qty"))
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
