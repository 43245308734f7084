package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup.exactIncremental semantics: survivors are new-to-the-corpus,
  * min-id within the batch; the store accumulates one hash per surviving
  * document; the anti-join shuffles only the batch side (the store side
  * is read through its bucketing).
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): (String, String) = {
    val table = s"spec_incdedup_${System.nanoTime()}"
    (table, java.nio.file.Files
      .createTempDirectory("graft_incdedup_spec").toString + "/" + table)
  }

  test("second batch survives only corpus-new, batch-min-id texts") {
    val (table, path) = freshStore()
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("doc_id", "text")
    val s1 = Dedup.exactIncremental(b1, "doc_id", "text", table, path)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(1L, 2L)) // in-batch dup of alpha dropped

    val b2 = Seq((10L, "beta"), (11L, "gamma"), (12L, "gamma"))
      .toDF("doc_id", "text")
    val s2 = Dedup.exactIncremental(b2, "doc_id", "text", table, path)
      .select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(11L)) // beta known from batch 1; gamma min-id

    // store accumulated exactly the three surviving hashes
    assert(spark.table(table).count() == 3)

    // the append wrote its own file(s) next to the seed's; compaction
    // folds the store back to at most one file per non-empty bucket,
    // preserving the rows (empty buckets never write files)
    def dataFiles() = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    val beforeCompact = dataFiles()
    assert(beforeCompact >= 2) // seed file(s) + the append's file
    graft.pipelines.Sinks.compactBucketed(
      spark, table, path, Seq("text_hash"), 8)
    assert(dataFiles() <= 3) // <= one file per non-empty bucket (3 hashes)
    assert(spark.table(table).count() == 3)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("minhashIncremental gates near-dups against the store only") {
    val (table, path) = freshStore()
    def sig(id: Long, xs: Long*) = (id, xs.toArray)
    // 4-long signatures, 2 bands of 2
    val b1 = Seq(sig(1L, 1, 2, 3, 4), sig(2L, 5, 6, 7, 8))
      .toDF("doc_id", "sig")
    val s1 = Dedup.minhashIncremental(b1, "doc_id", table, path,
      bands = 2, minEstJaccard = 0.9)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(1L, 2L)) // empty store: everything is novel

    val b2 = Seq(
      sig(10L, 1, 2, 3, 4), // full near-dup of stored 1 -> dropped
      sig(11L, 1, 2, 9, 9), // one band collides but est 0.5 -> survives
      sig(12L, 8, 7, 6, 5)  // no band collision -> survives
    ).toDF("doc_id", "sig")
    val s2 = Dedup.minhashIncremental(b2, "doc_id", table, path,
      bands = 2, minEstJaccard = 0.9)
      .select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(11L, 12L))

    // survivors' state accumulated: 4 signatures, 8 band rows
    assert(spark.table(s"${table}_sigs").count() == 4)
    assert(spark.table(s"${table}_bands").count() == 8)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_sigs")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_bands")
  }

  test("incremental gates are id-type agnostic: string ids end to end") {
    // the gates are pure joins/min-aggregates on the id column (no
    // BoundedIds buffer), so non-bigint ids need no adapter — pin that
    // for the exact and MinHash gates across a store round trip,
    // including the min-STRING-id in-batch winner ('a10' < 'a2')
    val (table, path) = freshStore()
    val b1 = Seq(("a2", "alpha"), ("a10", "alpha"), ("b1", "beta"))
      .toDF("doc_id", "text")
    val s1 = Dedup.exactIncremental(b1, "doc_id", "text", table, path)
      .select("doc_id").as[String].collect().sorted
    assert(s1.toSeq == Seq("a10", "b1")) // 'a10' < 'a2' lexicographically

    val b2 = Seq(("c1", "beta"), ("c2", "gamma")).toDF("doc_id", "text")
    val s2 = Dedup.exactIncremental(b2, "doc_id", "text", table, path)
      .select("doc_id").as[String].collect().sorted
    assert(s2.toSeq == Seq("c2")) // beta known from batch 1
    spark.sql(s"DROP TABLE IF EXISTS $table")

    val (mhTable, mhPath) = freshStore()
    def sig(id: String, xs: Long*) = (id, xs.toArray)
    val m1 = Seq(sig("x-1", 1, 2, 3, 4), sig("x-2", 5, 6, 7, 8))
      .toDF("doc_id", "sig")
    val g1 = Dedup.minhashIncremental(m1, "doc_id", mhTable, mhPath,
      bands = 2, minEstJaccard = 0.9)
      .select("doc_id").as[String].collect().sorted
    assert(g1.toSeq == Seq("x-1", "x-2"))

    val m2 = Seq(
      sig("y-1", 1, 2, 3, 4), // near-dup of stored x-1 -> dropped
      sig("y-2", 8, 7, 6, 5)  // no band collision -> survives
    ).toDF("doc_id", "sig")
    val g2 = Dedup.minhashIncremental(m2, "doc_id", mhTable, mhPath,
      bands = 2, minEstJaccard = 0.9)
      .select("doc_id").as[String].collect().sorted
    assert(g2.toSeq == Seq("y-2"))
    spark.sql(s"DROP TABLE IF EXISTS ${mhTable}_sigs")
    spark.sql(s"DROP TABLE IF EXISTS ${mhTable}_bands")
  }

  test("embeddingIncremental gates vector copies, passes novel vectors") {
    val (table, path) = freshStore()
    val b1 = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val s1 = Dedup.embeddingIncremental(b1, "vec_id", "embedding",
      table, path, minCosine = 0.95, nPlanes = 8, bands = 2)
      .select("vec_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(1L, 2L))

    val b2 = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),  // exact copy of 1 -> gated
      (11L, Array(0.0f, 0.0f, 1.0f))) // orthogonal to both -> survives
      .toDF("vec_id", "embedding")
    val s2 = Dedup.embeddingIncremental(b2, "vec_id", "embedding",
      table, path, minCosine = 0.95, nPlanes = 8, bands = 2)
      .select("vec_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(11L))
    assert(spark.table(s"${table}_vecs").count() == 3)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_vecs")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_bands")
  }

  test("simhashIncremental gates within-maxDist fingerprints") {
    val (table, path) = freshStore()
    val b1 = Seq((1L, 0xF0F0L), (2L, 0x0F0FL)).toDF("doc_id", "simhash")
    val s1 = Dedup.simhashIncremental(b1, "doc_id", table, path, maxDist = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(1L, 2L))

    val b2 = Seq(
      (10L, 0xF0F0L), // identical to stored 1 -> gated
      (11L, 0xF0F1L), // 1 bit from stored 1 -> gated (maxDist 3)
      (12L, 0xFF00L)  // 8 bits from both -> survives
    ).toDF("doc_id", "simhash")
    val s2 = Dedup.simhashIncremental(b2, "doc_id", table, path, maxDist = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(12L))
    assert(spark.table(s"${table}_fps").count() == 3)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_fps")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_bands")
  }

  test("anti-join shuffles only the batch side") {
    val (table, path) = freshStore()
    Dedup.exactIncremental(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"),
      "doc_id", "text", table, path)
    val batch = Seq((3L, "a"), (4L, "c")).toDF("doc_id", "text")
      .select(col("doc_id"), unhex(md5(col("text"))).as("text_hash"))
    val anti = batch.join(spark.table(table).hint("merge"),
      Seq("text_hash"), "left_anti")
    anti.count()
    val plan = anti.queryExecution.executedPlan.toString
    val exchanges = "(?<!Reused)Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"store side should not shuffle:\n$plan")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
