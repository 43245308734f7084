package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables(spark, sf, "documents")

  test("assignSplit: total partition, deterministic, ~weight-proportional") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts.getOrElse("val", 0L))
    // deterministic: identical on re-run and under different partitioning
    val again = Sampling.assignSplit(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("assignSplit is stable under incremental appends") {
    val first = Sampling.assignSplit(docs.filter("doc_id < 100"), "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val later = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
      .filter("doc_id < 100")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first == later) // old docs never switch splits
  }

  test("stratifiedSample keeps ~fraction per stratum, drops unknown strata") {
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 1.0, "es" -> 0.0))
    val langs = sampled.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"))
    assert(sampled.count() == docs.filter("lang = 'en'").count())
  }

  test("different salts give different assignments") {
    val a = Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), "s1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), "s2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a != b)
  }

  test("sampleToBudget: under-budget strata kept whole, over-budget downsampled") {
    val rows = ((0L until 100L).map(i => (i, "big", 10L)) ++
      (100L until 105L).map(i => (i, "small", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val out = Sampling.sampleToBudget(rows, "source", "doc_id", "n_tok",
      budget = 500.0, salt = "v1")
    // "small" total 50 <= 500: every row kept at rate 1.0
    assert(out.filter($"source" === "small").count() == 5)
    assert(out.filter($"source" === "small").select("keep_rate")
      .distinct().as[Double].head() == 1.0)
    // "big" total 1000 > 500: rate 0.5, kept count near expectation
    val kept = out.filter($"source" === "big").count()
    assert(kept > 25 && kept < 75, s"kept=$kept")
  }

  test("sampleToBudget membership is append-stable") {
    val base = (0L until 80L).map(i => (i, "s", 10L))
      .toDF("doc_id", "source", "n_tok")
    val keptBase = Sampling.sampleToBudget(base, "source", "doc_id", "n_tok",
      budget = 400.0, salt = "v1").select("doc_id").as[Long].collect().toSet
    // appending rows halves the rate — survivors of the new run must be
    // a SUBSET of the old ones (hash below a smaller cut), never a swap
    val more = (0L until 160L).map(i => (i, "s", 10L))
      .toDF("doc_id", "source", "n_tok")
    val keptMore = Sampling.sampleToBudget(more, "source", "doc_id", "n_tok",
      budget = 400.0, salt = "v1").select("doc_id").as[Long].collect().toSet
    assert(keptMore.filter(_ < 80L).subsetOf(keptBase))
  }

  test("assignSplitBy on a cluster rep: members never straddle splits") {
    // clusters: {0,1000}, {1,1001}, ... {49,1049}; singletons 50..99
    val members = ((0L until 100L).map(i => (i, i)) ++
      (0L until 50L).map(i => (i + 1000L, i))).toDF("doc_id", "rep")
    val out = Sampling.assignSplitBy(members, col("rep"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
    // one split per cluster
    assert(out.groupBy("rep").agg(countDistinct("split").as("k"))
      .filter($"k" =!= 1).count() == 0)
    // and it is the rep's own assignSplit label, so copies inherit it
    val repSplit = Sampling.assignSplit(
        (0L until 100L).toDF("doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val got = out.select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect()
    assert(got.forall { case (_, rep, s) => repSplit(rep) == s })
    // a naive per-doc split would differ somewhere across the 50 pairs
    val naive = Sampling.assignSplit(members, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.exists { case (id, _, s) => naive(id) != s })
  }

  test("samplePerGroup: exactly k per group, matches the ranking window, no Sort") {
    val docs = graft.Tables(spark, sf, "documents")
    val out = Sampling.samplePerGroup(docs, "lang", "doc_id", k = 5, salt = "v1")
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val groupSizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    counts.foreach { case (g, n) => assert(n == math.min(5L, groupSizes(g))) }
    // the window form it replaces, on the same bucket rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(Sampling.hashBucket(col("doc_id"), "v1"), col("doc_id"))
    val ref = docs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5).select("lang", "rk", "doc_id")
      .as[(String, Long, Long)].collect().toSet
    assert(out.select("lang", "rk", "doc_id")
      .as[(String, Long, Long)].collect().toSet == ref)
    // physical contract: aggregate path, no sort operator before the agg
    val plan = Sampling.samplePerGroup(docs, "lang", "doc_id", 5, "v1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window "), plan.take(400))
  }
}
