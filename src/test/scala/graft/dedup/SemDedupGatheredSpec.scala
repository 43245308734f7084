package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r22 gathered-vector within-cell search (SemDedupDroppedIds)
  * exactly equivalent to the pair pipeline it replaces — on a seeded
  * random corpus against (a) a driver-side brute-force reference of the
  * declared drop rule and (b) the legacy pair pipeline itself, which
  * still runs for non-integral ids.
  */
class SemDedupGatheredSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20220818L)
  private val dim = 16

  /** ~8 loose clusters plus exact copies and tight near-dups. */
  private val vectors: Seq[(Long, Array[Float])] = {
    val centers = Seq.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val organic = (0L until 200L).map { i =>
      val c = centers((i % 8).toInt)
      val v = c.zip(Array.fill(dim)(rnd.nextGaussian().toFloat * 0.3f))
        .map { case (a, b) => a + b }
      (i, v)
    }
    val copies = organic.filter(_._1 % 10 == 0)
      .map { case (i, v) => (i + 1000L, v.clone()) }
    val tight = organic.filter(_._1 % 7 == 0).map { case (i, v) =>
      (i + 2000L, v.map(x => x + rnd.nextGaussian().toFloat * 1e-4f))
    }
    organic ++ copies ++ tight
  }

  /** A fixed (deterministic) cell assignment: hash ids into k cells so
    * the test controls the cells instead of KMeans — copies/near-dups
    * land WITH their originals by construction (same formula).
    */
  private def cellOf(id: Long): Long = {
    // copies share their original's cell: normalize the id space first
    val base = if (id >= 2000L) id - 2000L else if (id >= 1000L) id - 1000L else id
    base % 5
  }

  private def cosine(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      dot += x(i).toDouble * y(i).toDouble
      nx += x(i).toDouble * x(i).toDouble
      ny += y(i).toDouble * y(i).toDouble
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** The declared drop rule, brute-forced on the driver. */
  private def reference(minCosine: Double): Seq[Long] = {
    val byCell = vectors.groupBy { case (id, _) => cellOf(id) }
    val dropped = byCell.values.flatMap { cell =>
      val sorted = cell.sortBy(_._1)
      sorted.zipWithIndex.collect { case ((idJ, vJ), j)
        if sorted.take(j).exists { case (idI, vI) =>
          idI != idJ && cosine(vI, vJ) >= minCosine } => idJ }
    }.toSet
    vectors.map(_._1).filterNot(dropped).sorted
  }

  private def df = vectors.toDF("vec_id", "embedding")
  private def cellsDf = vectors.map { case (id, _) => (id, cellOf(id)) }
    .toDF("vec_id", "cell")

  test("gathered form matches the brute-force drop rule at several thresholds") {
    for (t <- Seq(0.9, 0.99, 0.999999)) {
      val got = SemDedup.semanticDedupAssigned(df, cellsDf,
        "vec_id", "embedding", minCosine = t)
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(got == reference(t), s"minCosine=$t")
    }
  }

  test("gathered form (bigint ids) and legacy pair pipeline (string ids) agree") {
    // zero-padded string ids preserve the id ORDER, so the two paths
    // must keep the same survivors modulo the id representation
    val sdf = df.select(format_string("id%07d", col("vec_id")).as("vec_id"),
      col("embedding"))
    val scells = cellsDf.select(
      format_string("id%07d", col("vec_id")).as("vec_id"), col("cell"))
    val legacy = SemDedup.semanticDedupAssigned(sdf, scells,
      "vec_id", "embedding", minCosine = 0.99)
      .select("vec_id").as[String].collect()
      .map(_.stripPrefix("id").toLong).sorted.toSeq
    val gathered = SemDedup.semanticDedupAssigned(df, cellsDf,
      "vec_id", "embedding", minCosine = 0.99)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(gathered == legacy)
  }

  test("gathered form agrees in the forced shuffle_hash regime too") {
    try {
      spark.conf.set("spark.graft.semdedup.maxBroadcastVecs", "1")
      val got = SemDedup.semanticDedupAssigned(df, cellsDf,
        "vec_id", "embedding", minCosine = 0.99)
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(got == reference(0.99))
    } finally spark.conf.unset("spark.graft.semdedup.maxBroadcastVecs")
  }

  test("over-cap cell saturates to null: its ids silently survive (audit contract)") {
    // cap below the largest cell: every id of THAT cell must survive,
    // the other cells dedup normally — the pair stage's silent-drop
    // semantics, byte for byte
    val capped = SemDedup.semanticDedupAssigned(df, cellsDf,
      "vec_id", "embedding", minCosine = 0.99,
      maxCluster = 3, failOnOverCap = false)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(capped == vectors.map(_._1).sorted) // all cells > 3 members
  }

  test("null vector rows occupy cap space but never drop or get dropped") {
    val withNull = vectors.take(6).map { case (id, v) => (id, Option(v)) } ++
      Seq((9000L, Option.empty[Array[Float]]),
        (9001L, Some(vectors.head._2.clone())))
    val ndf = withNull.toDF("vec_id", "embedding")
    val ncells = withNull.map { case (id, _) => (id, 0L) }
      .toDF("vec_id", "cell")
    val out = SemDedup.semanticDedupAssigned(ndf, ncells,
      "vec_id", "embedding", minCosine = 0.95)
      .select("vec_id").as[Long].collect().sorted.toSeq
    // 9001 is an exact copy of id 0 -> dropped; 9000 (null vec) survives
    assert(out.contains(9000L) && !out.contains(9001L))
  }

  test("int ids widen losslessly through the gathered path") {
    val idf = vectors.filter(_._1 < 300L)
      .map { case (id, v) => (id.toInt, v) }.toDF("vec_id", "embedding")
    val icells = vectors.filter(_._1 < 300L)
      .map { case (id, _) => (id.toInt, cellOf(id)) }.toDF("vec_id", "cell")
    val out = SemDedup.semanticDedupAssigned(idf, icells,
      "vec_id", "embedding", minCosine = 0.999999)
    assert(out.schema("vec_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val expected = {
      val sub = vectors.filter(_._1 < 300L)
      val byCell = sub.groupBy { case (id, _) => cellOf(id) }
      val dropped = byCell.values.flatMap { cell =>
        val sorted = cell.sortBy(_._1)
        sorted.zipWithIndex.collect { case ((idJ, vJ), j)
          if sorted.take(j).exists { case (idI, vI) =>
            idI != idJ && cosine(vI, vJ) >= 0.999999 } => idJ }
      }.toSet
      sub.map(_._1).filterNot(dropped).sorted.map(_.toInt)
    }
    assert(out.select("vec_id").as[Int].collect().sorted.toSeq == expected)
  }
}
