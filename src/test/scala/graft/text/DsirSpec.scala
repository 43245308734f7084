package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance selection: hand-checked weights, target-domain docs
  * outranking off-domain ones, OOV neutrality, hash/text key parity,
  * and the hashed-feature variant's exact agreement on a proven
  * collision-free fixture plus its broadcast plan shape.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target domain: "the cat sat" phrasing; raw pool: that plus legalese
  private val target = Seq(
    0L -> "the cat sat on the mat",
    1L -> "the cat sat on the rug").toDF("doc_id", "text")
  private val legal = Seq(
    100L -> "party of the first part shall indemnify",
    101L -> "party of the first part shall hold harmless")
    .toDF("doc_id", "text")
  private val raw = target.union(legal)

  test("hand-checked weights: a target transition scores " +
      "micro_t - micro_r; a raw-only transition scores negative") {
    // target model: "a b" x2 -> micro_t(b|a) = 1e6
    // raw model:    "a b" x2, "a c" x2 -> micro_r(b|a) = 5e5,
    //               micro_r(c|a) = 5e5; micro_t(c|a) = OOV = 0
    val t = Seq(0L -> "a b", 1L -> "a b").toDF("doc_id", "text")
    val r = Seq(0L -> "a b", 1L -> "a b", 2L -> "a c", 3L -> "a c")
      .toDF("doc_id", "text")
    val cands = Seq(10L -> "a b", 11L -> "a c", 12L -> "x y")
      .toDF("doc_id", "text")
    val got = Dsir.selectTopN(t, r, cands, n = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (10L, 1L, 500000L, 500000.0),   // 1e6 - 5e5
      (12L, 1L, 0L, 0.0),             // OOV under BOTH models: neutral
      (11L, 1L, -500000L, -500000.0)  // raw-only transition: negative
    ), s"got $got")
  }

  test("target-domain candidates outrank off-domain ones") {
    val picked = Dsir.selectTopN(target, raw, raw, n = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == Set(0L, 1L),
      "the two cat-domain docs must be selected first")
  }

  test("hash and text join keys agree; determinism under repartition") {
    val h = Dsir.selectTopN(target, raw, raw, 4, useHashKey = true)
      .collect().toSeq
    val t = Dsir.selectTopN(target, raw, raw, 4, useHashKey = false)
      .collect().toSeq
    assert(h == t)
    val r = Dsir.selectTopN(target.repartition(5), raw.repartition(3),
      raw.repartition(7), 4).collect().toSeq
    assert(r == h)
  }

  test("sliced fast path == two-model form when the target is a slice " +
      "of the pool (incl. target-OOV zeros and null flags)") {
    val pool = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "the cat sat on the rug", "en"),
      (100L, "party of the first part shall indemnify", "legal"),
      (101L, "party of the first part shall hold harmless", "legal"),
      (102L, "entirely novel words appear here once", null))
      .toDF("doc_id", "text", "lang")
    val docs = pool.select(col("doc_id"), col("text"), col("lang"))
    val twoModel = Dsir.selectTopN(
      target = docs.filter(col("lang") === "en"),
      raw = docs, candidates = docs, n = 5).collect().toSeq
    val sliced = Dsir.selectTopNSliced(docs, col("lang") === "en", n = 5)
      .collect().toSeq
    assert(sliced == twoModel)
    // text-keyed agrees too
    assert(Dsir.selectTopNSliced(docs, col("lang") === "en", 5,
      useHashKey = false).collect().toSeq == twoModel)
  }

  test("hashed-feature variant agrees exactly on a proven " +
      "collision-free fixture, and its model joins broadcast") {
    val buckets = 1 << 14
    // prove the fixture collision-free FIRST: distinct bigrams must map
    // to distinct buckets, else this test's premise (equality) is void
    val bi = BigramLm.keyed(BigramLm.bigrams(raw), useHashKey = true)
      .select(col("w1"), col("w2"), pmod(col("bk"), lit(buckets.toLong)).as("b"))
      .distinct()
    val (nBigrams, nBuckets) = bi.agg(
      count(lit(1)), countDistinct(col("b")))
      .as[(Long, Long)].collect().head
    assert(nBigrams == nBuckets,
      s"fixture has a mod-$buckets collision; pick other words")

    val plain = Dsir.selectTopN(target, raw, raw, 4).collect().toSeq
    val hashedDf = Dsir.hashedSelectTopN(target, raw, raw, 4, buckets)
    assert(hashedDf.collect().toSeq == plain)
    val plan = hashedDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hashed models must broadcast:\n$plan")
  }

  test("hashed variant COLLISION-MERGE semantics: collisions proven " +
      "then enumerated, output equals an independent plain-Scala " +
      "reconstruction over the enumerated classes (the q112 answer key)") {
    // the collision-free test above pins hashed == unhashed when no
    // bucket merges; this one pins what a merge DOES. The shared
    // fixture's 14 distinct bigrams into Buckets = 8 FORCE collisions
    // (pigeonhole) — which pairs collide is up to xxhash64, so the
    // expected result is not assumed but RECONSTRUCTED from the
    // enumerated classes in plain Scala, independent of every engine
    // operator under test. The same fixture + frozen expected rows
    // back the q112 oracle.
    val buckets = Dsir.CollisionFixture.Buckets
    val (tgt, rw, cands) = Dsir.CollisionFixture.frames(spark)

    def toks(s: String): Seq[String] = s.split(" ").toSeq
    def occOf(s: String): Seq[(String, String)] = {
      val t = toks(s); t.zip(t.drop(1))
    }
    val tgtTexts = Dsir.CollisionFixture.target.map(_._2)
    val rawTexts = Dsir.CollisionFixture.raw.map(_._2)
    val candDocs = Dsir.CollisionFixture.candidates

    // ENUMERATE: fixed public hashes (xxhash64, seed 42 — the bk/w1h
    // contract BigramHashCountsSpec pins) for every distinct bigram
    val allBi = (rawTexts ++ candDocs.map(_._2)).flatMap(occOf).distinct
    val hashed = allBi.toDF("w1", "w2")
      .select(col("w1"), col("w2"),
        pmod(xxhash64(concat_ws(" ", col("w1"), col("w2"))),
          lit(buckets.toLong)).as("b"),
        xxhash64(col("w1")).as("h"))
      .as[(String, String, Long, Long)].collect().toSeq
    val bucketOf = hashed.map(r => (r._1, r._2) -> r._3).toMap
    val headOf = hashed.map(r => (r._1, r._2) -> r._4).toMap
    // PROVE: the fixture must actually exercise a merge
    val classes = allBi.groupBy(bucketOf).filter(_._2.size > 1)
    assert(classes.nonEmpty,
      s"fixture must carry a mod-$buckets collision — " +
        s"buckets: ${allBi.map(bucketOf).sorted}")

    // independent reconstruction of the hashed-model arithmetic:
    // same-head collisions add counts BEFORE the conditional division,
    // cross-head collisions add micro contributions AFTER it
    def model(texts: Seq[String]): Map[Long, Long] = {
      val occ = texts.flatMap(occOf)
      val cxy = occ.groupBy(b => (bucketOf(b), headOf(b)))
        .view.mapValues(_.size.toLong).toMap
      val cfirst = occ.groupBy(headOf).view.mapValues(_.size.toLong).toMap
      cxy.toSeq.groupBy(_._1._1).map { case (b, rows) =>
        b -> rows.map { case ((_, h), c) => c * 1000000L / cfirst(h) }.sum
      }
    }
    val mT = model(tgtTexts)
    val mR = model(rawTexts)
    val expected = candDocs.map { case (id, text) =>
      val occ = occOf(text)
      val w = occ.map { b =>
        val bb = bucketOf(b)
        mT.getOrElse(bb, 0L) - mR.getOrElse(bb, 0L)
      }.sum
      (id, occ.size.toLong, w, w.toDouble / occ.size.toDouble)
    }.sortBy { case (id, _, _, avg) => (-avg, id) }

    val got = Dsir.hashedSelectTopN(tgt, rw, cands,
        n = candDocs.size, buckets = buckets)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected,
      s"hashed collision-merge must match the enumerated-class " +
        s"reconstruction:\n$got\nvs\n$expected")
  }
}
