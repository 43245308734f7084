package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key ("hot" = 90% of rows) plus a long tail
  private lazy val fact = (Seq.fill(900)("hot") ++ (1 to 100).map(i => s"k$i"))
    .toDF("key")

  test("saltedCount equals the naive groupBy count") {
    val naive = fact.groupBy("key").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(fact, col("key"))
      .as[(String, Long)].collect().toMap
    assert(salted == naive)
    assert(salted("hot") == 900L)
  }

  test("saltedCount spreads the hot key over multiple partial groups") {
    val partials = fact.groupBy(col("key"),
        pmod(xxhash64(monotonically_increasing_id()), lit(16L)).as("s"))
      .count().filter("key = 'hot'").count()
    assert(partials > 1) // hot key really does split
  }

  test("saltedJoin equals the naive join") {
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "dim_val")
    val naive = fact.join(dim, "key").groupBy("key")
      .agg(count(lit(1)).as("n"), sum("dim_val").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key").groupBy("key")
      .agg(count(lit(1)).as("n"), sum("dim_val").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == naive)
  }
}
