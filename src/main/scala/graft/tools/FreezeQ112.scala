package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence generator for the q112 answer key: prints the
  * [[graft.text.Dsir.hashedSelectTopN]] output on the shared
  * [[graft.text.Dsir.CollisionFixture]] as `(doc_id, n_bigrams,
  * weight)` rows — the values frozen into the q112 oracle's VALUES
  * list. The rows are TRUSTWORTHY as an answer key because DsirSpec's
  * collision-merge test reconstructs the same output in plain Scala
  * from the enumerated xxhash64 bucket classes, independent of every
  * engine operator; this main just re-prints what that test already
  * proves. Stable across runs: xxhash64 (seed 42) is a fixed public
  * function and the fixture is a compile-time constant.
  *
  * Run: `sbt "runMain graft.tools.FreezeQ112"`.
  */
object FreezeQ112 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (t, r, c) = graft.text.Dsir.CollisionFixture.frames(spark)
    val got = graft.text.Dsir.hashedSelectTopN(
      t, r, c, n = graft.text.Dsir.CollisionFixture.candidates.size,
      buckets = graft.text.Dsir.CollisionFixture.Buckets).collect()
    got.foreach { row =>
      println(s"FROZEN|(${row.getLong(0)}, ${row.getLong(1)}, " +
        s"${row.getLong(2)})  -- avg ${row.getDouble(3)}")
    }
    spark.stop()
  }
}
