package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** Property-based invariants for the round-10 segment/packing tier.
  * Generators stay small — the properties are about algebra, not volume.
  */
object SegmentPropertySpec extends Properties("Segments") {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // small vocab so windows collide often (the interesting regime)
  private val docGen: Gen[String] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, docGen))

  private def toDf(texts: List[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def segsOf(text: String, w: Int): Vector[String] =
    text.split("\\s+").filter(_.nonEmpty).grouped(w)
      .map(_.mkString(" ")).toVector

  property("dedupSegments == sequential first-occurrence reference") =
    forAll(corpusGen, Gen.oneOf(1, 2, 3)) { (texts, w) =>
      val got = Segments.dedupSegments(toDf(texts), w)
        .orderBy("doc_id")
        .as[(Long, Long, Long, String)].collect().toList
      val seen = scala.collection.mutable.Set.empty[String]
      val want = texts.zipWithIndex.map { case (t, i) =>
        val segs = segsOf(t, w)
        val kept = segs.filter(s => seen.add(s))
        (i.toLong, segs.size.toLong, kept.size.toLong, kept.mkString(" "))
      }
      got == want
    }

  property("filterSegments: kept text is the subsequence passing the ratio") =
    forAll(corpusGen, Gen.oneOf(2, 4)) { (texts, w) =>
      val got = Segments.filterSegments(toDf(texts), w, 0.75)
        .orderBy("doc_id")
        .as[(Long, Int, Int, String)].collect().toList
      val want = texts.zipWithIndex.map { case (t, i) =>
        val segs = segsOf(t, w)
        val kept = segs.filter { s =>
          val toks = s.split(" ")
          toks.distinct.length.toDouble / toks.length >= 0.75
        }
        (i.toLong, segs.size, kept.size, kept.mkString(" "))
      }
      got == want
    }

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0L, 500L)).map(ids =>
        ids.distinct.sorted.zipWithIndex.map { case (id, i) =>
          (id, (i % 7) + 1L)
        })
    }.suchThat(_.nonEmpty)

  property("prefixSum == sequential running sum for any bucket width") =
    forAll(rowsGen, Gen.oneOf(1L, 3L, 32L, 1000L)) { (rows, width) =>
      val got = Packing.prefixSum(rows.toDF("id", "v"), "id", "v", width)
        .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toList
      val want = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, v)) =>
        (id, acc + v)
      }.tail
      got == want
    }

  property("packBins: bins partition the rows in order, totals bounded") =
    forAll(rowsGen, Gen.oneOf(5L, 20L)) { (rows, budget) =>
      val got = Packing.packBins(rows.toDF("id", "v"), "id", "v",
          budget, bucketWidth = 16L)
        .orderBy("id").select("id", "bin").as[(Long, Long)].collect().toList
      // bins are non-decreasing in id order and start at 0
      val bins = got.map(_._2)
      bins.headOption.forall(_ == 0L) &&
        bins.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)) &&
        // each row's bin is (prefix-before-it) div budget
        got.zip(rows).forall { case ((id, bin), (id2, _)) => id == id2 } && {
          val prefix = rows.scanLeft(0L)(_ + _._2)
          got.map(_._2) == rows.indices.map(i => prefix(i) / budget).toList
        }
    }
}
