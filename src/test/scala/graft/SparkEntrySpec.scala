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

  test("q42 native-kernel output ≡ full HOF-fallback rerun (kernel regression gate)") {
    // q42 is the slowest rows-only query: its q43 portable twin
    // oracles the ALGORITHM (md5 hash domain) but not the native
    // kernels' output. This runs the REGISTERED q42 twice — once with
    // the kernels, once with every dispatch site forced onto its
    // Column/HOF fallback — and requires identical rows, so a
    // regression in simhash128w / shingle_hashes64 / any kernel on
    // q42's path fails loudly at the full-query level.
    def rows() = SparkEntry.queries("q42_simhash_idf")(spark, sf001)
      .select("doc_a", "doc_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val native = rows()
    assert(native.nonEmpty, "q42 must find pairs at sf0.01")
    graft.plans.GraftExtensions.forceHofForTest = true
    val hof = try rows()
      finally graft.plans.GraftExtensions.forceHofForTest = false
    assert(native == hof,
      s"native vs HOF q42 rows diverge: ${native.diff(hof)} / ${hof.diff(native)}")
  }
}
