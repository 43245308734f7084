package graft.dedup

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.{MinHashSig, NgramHasher}

/** Pins the property q45's closed-form near-dup fixture rests on: for a
  * unit string u with |u| >= n, the n-gram shingle SET of u repeated m
  * times is the set of CYCLIC n-gram windows of u, independent of m for
  * every m >= 2 — so unit^2 / unit^3 / unit^4 are distinct strings
  * (surviving exact dedup) with bit-identical MinHash signatures
  * (est_jaccard exactly 1.0, collision in every LSH band).
  */
class PeriodicFamilySpec extends SparkSpec {

  private val mod = 2147483647L

  private def shingleSet(s: String, n: Int): Set[Long] =
    NgramHasher.hashAll(UTF8String.fromString(s), n, mod).toSet

  private def sigOf(s: String): Seq[Long] =
    MinHashSig.sig(UTF8String.fromString(s), 32, 5, mod).toSeq

  test("random units: any m >= 2 pair shares the cyclic shingle set") {
    // the general claim behind the fixed families below, over arbitrary
    // unit content (the q45 fixture only needs the fixed alphabet)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val len = 5 + rnd.nextInt(20)
      val unit = Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      val m1 = 2 + rnd.nextInt(4)
      val m2 = 2 + rnd.nextInt(4)
      assert(shingleSet(unit * m1, 5) == shingleSet(unit * m2, 5),
        s"unit '$unit' m=$m1 vs m=$m2")
      assert(sigOf(unit * m1) == sigOf(unit * m2))
    }
  }

  test("repeat counts >= 2 share one shingle set; m=1 does not") {
    for (k <- Seq(0, 7, 19)) {
      val unit = s"w${k}a w${k}b w${k}c "
      val sets = (2 to 6).map(m => shingleSet(unit * m, 5))
      assert(sets.distinct.size == 1,
        s"family $k: shingle sets differ across repeat counts")
      // sanity: the shared set is exactly the |unit| cyclic windows
      assert(sets.head.size == unit.length)
      // a single unit is NOT in the family (its tail windows don't wrap)
      assert(shingleSet(unit, 5) != sets.head)
    }
  }

  test("family members have bit-identical MinHash signatures") {
    for (k <- Seq(0, 3, 11)) {
      val unit = s"w${k}a w${k}b w${k}c "
      val sigs = (2 to 4).map(m => sigOf(unit * m))
      assert(sigs.distinct.size == 1)
    }
  }

  test("different families have different signatures") {
    val sigs = (0 until 20).map(k => sigOf(s"w${k}a w${k}b w${k}c " * 2))
    assert(sigs.distinct.size == 20)
  }

  test("the 60-doc family frame clusters to 20 canonical min-ids") {
    import org.apache.spark.sql.functions._
    val fams = spark.range(20).select(col("id").as("k"))
      .crossJoin(spark.range(2, 5).select(col("id").as("m")))
      .select((lit(20000000L) + col("k") * 10 + col("m")).as("doc_id"),
        expr("repeat('w' || k || 'a w' || k || 'b w' || k || 'c ', m)")
          .as("text"))
    val sig = Dedup.minhashSignatures(fams, "doc_id", "text", 32, 5)
      .localCheckpoint()
    val pairs = Dedup.minhashJaccard(
        Dedup.lshCandidates(sig, "doc_id", bands = 8), sig, "doc_id")
      .filter(col("est_jaccard") >= 0.9)
    // every in-family pair collides (3 per family), est exactly 1.0
    assert(pairs.count() == 60)
    assert(pairs.filter(col("est_jaccard") =!= 1.0).count() == 0)
    val clusters = Dedup.canonicalClusters(fams.select("doc_id"), pairs,
      "doc_id")
    val canon = clusters.select("canonical_id").distinct()
    assert(canon.count() == 20)
    assert(canon.filter(pmod(col("canonical_id") - 20000000L, lit(10L))
      =!= 2L).count() == 0)
  }
}
