package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Vectors

class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def setup() = {
    Vectors.register(spark)
    Rules.register(spark)
  }

  // File-backed input: ConvertToLocalRelation would eagerly evaluate a
  // LocalRelation projection before user-provided optimizer rules run.
  private lazy val vecs: String = {
    val p = Files.createTempDirectory("graft-rules").resolve("v.parquet").toString
    Seq((1L, Some(Seq(1f, 2f))), (2L, Some(Seq(0f, 0f))), (3L, None))
      .toDF("id", "v").write.parquet(p)
    p
  }

  test("FoldSelfCosine rewrites cosine_sim(x, x) to self_cosine in the plan") {
    setup()
    val df = spark.read.parquet(vecs)
      .select(Vectors.cosineSim(col("v"), col("v")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("self_cosine"))
    assert(!optimized.contains("cosine_sim"))
  }

  test("rewrite preserves semantics: 1.0 / 0.0 zero-norm / null") {
    setup()
    // note: this is the exact-math value; the unrewritten expression
    // returns 0.9999999999999998 (sqrt rounding) — the rule is the MORE
    // accurate of the two.
    val got = spark.read.parquet(vecs).orderBy("id")
      .select(Vectors.cosineSim(col("v"), col("v")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(1.0), Some(0.0), None))
  }

  test("distinct columns are left alone") {
    setup()
    val df = spark.read.parquet(vecs).as("a")
      .crossJoin(spark.read.parquet(vecs).as("b"))
      .select(Vectors.cosineSim(col("a.v"), col("b.v")).as("c"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("self_cosine"))
  }
}
