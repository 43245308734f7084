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

  test("ScalarQueries.releaseDataset drops the q98 seeded store — heap " +
      "entry AND tmpdir files — and the seed rebuilds on next use") {
    import graft.catalog.ScalarQueries
    val q98 = Catalog.all("q98_time_travel")
    val r1 = q98.fn(spark, sf).count()
    // seeding leaves exactly one live graft_ttstore dir for this run
    def storeDirs(): Seq[java.io.File] =
      Option(new java.io.File(sys.props("java.io.tmpdir"))
        .listFiles((_, n) => n.startsWith("graft_ttstore_")))
        .map(_.toSeq).getOrElse(Nil)
    val before = storeDirs()
    assert(before.nonEmpty, "q98 must have seeded a tmpdir store")
    ScalarQueries.releaseDataset(spark, sf)
    val after = storeDirs().map(_.getName).toSet
    val deleted = before.map(_.getName).toSet.diff(after)
    assert(deleted.nonEmpty,
      "releaseDataset must delete this dataset's seeded store from tmpdir")
    // transparent rebuild: the query re-seeds and returns the same rows —
    // into a FRESH dir (a reused suffix after the cache shrank would
    // alias onto another live dataset's store and corrupt it)
    assert(q98.fn(spark, sf).count() == r1)
    val rebuilt = storeDirs().map(_.getName).toSet.diff(after)
    assert(rebuilt.nonEmpty && rebuilt.intersect(deleted).isEmpty,
      s"re-seed must mint a never-used dir, not recycle $deleted")
  }
}
