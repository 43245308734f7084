package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSum matches the single-partition window form") {
    val df = (0L until 257L).map(i => (i, (i * 7 % 13) + 1)).toDF("id", "v")
    val want = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    for (width <- Seq(1L, 16L, 64L, 1000L)) {
      val got = Packing.prefixSum(df, "id", "v", width)
        .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
      assert(got.toSeq == want.toSeq, s"width=$width")
    }
  }

  test("prefixSum handles sparse / gapped ids") {
    val df = Seq((3L, 5L), (100L, 7L), (1000L, 11L), (1001L, 2L))
      .toDF("id", "v")
    val got = Packing.prefixSum(df, "id", "v", 64L)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((3L, 5L), (100L, 12L), (1000L, 23L), (1001L, 25L)))
  }

  test("packBins: bin is where the row's span starts; rows never split") {
    // budget 10, values 6,6,6: cums 6,12,18 -> bins (0)/10=0, (6)/10=0, (12)/10=1
    val df = Seq((1L, 6L), (2L, 6L), (3L, 6L)).toDF("id", "v")
    val got = Packing.packBins(df, "id", "v", budget = 10L, bucketWidth = 2L)
      .orderBy("id").select("id", "bin").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
  }

  test("reserved output/scratch column names fail fast, not corrupt") {
    // `withColumn` silently REPLACES a same-named column — the guard
    // turns that data corruption into a plan-time error
    for (bad <- Seq("cum", "_psb", "CUM")) {
      val df = Seq((1L, 2L)).toDF("id", bad)
      val ex = intercept[IllegalArgumentException] {
        Packing.prefixSum(df, "id", "id", 8L)
      }
      assert(ex.getMessage.contains("reserved"), s"col=$bad")
    }
    val withBin = Seq((1L, 2L)).toDF("id", "bin")
    val ex = intercept[IllegalArgumentException] {
      Packing.packBins(withBin, "id", "id", budget = 4L, bucketWidth = 8L)
    }
    assert(ex.getMessage.contains("reserved"))
  }

  test("packBins: bins are contiguous and overflow-bounded") {
    val df = (0L until 100L).map(i => (i, (i % 17) + 1)).toDF("id", "v")
    val out = Packing.packBins(df, "id", "v", budget = 50L, bucketWidth = 8L)
      .groupBy("bin").agg(sum(col("v")).as("tot"))
      .orderBy("bin").as[(Long, Long)].collect()
    // every bin except possibly the last holds >= budget - (max v - 1)
    out.init.foreach { case (b, tot) =>
      assert(tot >= 50L - 16L && tot < 50L + 17L, s"bin $b total $tot")
    }
    assert(out.map(_._1).toSeq == out.indices.map(_.toLong))
  }
}
