package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalClusters: chains collapse to the minimum id") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    // chain 1-2, 2-3, 3-4 (diameter 3) plus isolated 5 and 9
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2")
    val got = Dedup.canonicalClusters(ids, pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 9L -> 9L))
  }

  test("curate: near-dup cluster keeps only the canonical doc") {
    val base = "the quick brown fox jumps over the lazy dog and the cat " * 4
    val docs = Seq(
      (10L, base),
      (11L, base),                              // exact dup of 10
      (12L, base.replace("lazy", "late")),      // near dup of 10
      (13L, "the completely different corpus of text about engines and the data " * 4),
      (14L, "!!! ??? !!!")                      // fails quality filter (punct)
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs,
      CorpusPipeline.Config(langs = Seq("en"), minQuality = 0.3))
    val kept = out.select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 13L)) // 11 exact-dropped, 12 near-dropped, 14 quality-dropped
    val tokens = out.filter("doc_id = 10").select("tokens").as[Int].head()
    assert(tokens > 0)
  }

  test("curateIncremental: day-2 batch gated against day-1 state") {
    val table = s"spec_curinc_${System.nanoTime()}"
    val path = java.nio.file.Files
      .createTempDirectory("graft_curinc_spec").toString
    val cfg = CorpusPipeline.Config(langs = Seq("en"), minQuality = 0.3)
    val base = "the quick brown fox jumps over the lazy dog and the cat " * 4
    val other = "the completely different corpus of text about engines and the data " * 4

    val day1 = Seq((10L, base), (11L, base), (12L, other))
      .toDF("doc_id", "text")
    val s1 = CorpusPipeline.curateIncremental(day1, table, path, cfg)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(10L, 12L)) // 11 is an in-batch exact dup

    val day2 = Seq(
      (20L, other),                          // exact dup of stored 12
      (21L, base.replace("lazy", "late")),   // near dup of stored 10
      (22L, "the fresh novel document about the weather and the sea and the sky " * 4),
      (23L, "!!! ??? !!!")                   // fails the quality filter
    ).toDF("doc_id", "text")
    val s2 = CorpusPipeline.curateIncremental(day2, table, path, cfg)
    assert(s2.select("doc_id").as[Long].collect().toSeq == Seq(22L))
    assert(s2.select("tokens").as[Int].head() > 0)
    for (t <- Seq(s"${table}_exact", s"${table}_mh_bands", s"${table}_mh_sigs"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("curate on the real corpus shrinks it and is deterministic") {
    val docs = graft.Tables(spark, sf, "documents")
    val out1 = CorpusPipeline.curate(docs, CorpusPipeline.Config(
      langs = Seq("en", "es", "fr", "de", "zh"), minQuality = 0.0))
    val n1 = out1.count()
    assert(n1 > 0 && n1 <= docs.count())
    val out2 = CorpusPipeline.curate(docs, CorpusPipeline.Config(
      langs = Seq("en", "es", "fr", "de", "zh"), minQuality = 0.0))
    assert(out2.count() == n1)
    // the corpus has generated near-dups: something must collapse
    assert(n1 < docs.count())
  }
}
