package graft

class SparkEntrySpec extends SparkTestBase {

  test("flagship entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; every query key is well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without queries: ${o -- q}")
    assert(q.forall(_.matches("q[0-9]{2}_[a-z0-9_]+")), q)
  }

  test("all registered queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      // q18/q19 near-dup pairs legitimately exist; every query must
      // produce at least one row so the driver's rows-only check means
      // something
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
