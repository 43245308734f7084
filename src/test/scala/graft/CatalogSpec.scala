package graft

import graft.catalog.Catalog

/** Smoke: every catalog query plans and executes on sf0.001, and the
  * flagship entry returns rows. Value-level correctness is covered by the
  * per-op specs plus the driver's DuckDB-oracle compare (tools/paritycheck.py
  * mimics it locally).
  */
class CatalogSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  Catalog.all.foreach { case (name, q) =>
    test(s"$name executes on sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // force execution
    }
  }
}
