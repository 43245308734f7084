package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def segsOf(text: String, w: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(Segments.segmentsCol(col("text"), w).as("s"))
      .as[Seq[String]].head()

  test("segmentsCol: non-overlapping windows, short tail kept") {
    assert(segsOf("a b c d e", 2) == Seq("a b", "c d", "e"))
    assert(segsOf("a b c d", 2) == Seq("a b", "c d"))
    assert(segsOf("a", 3) == Seq("a"))
  }

  test("segmentsCol: blank and whitespace-only text give zero segments") {
    assert(segsOf("", 4).isEmpty)
    assert(segsOf("   \t ", 4).isEmpty)
  }

  test("segmentsCol: multi-whitespace collapses like wsTokens") {
    assert(segsOf("a   b\tc", 2) == Seq("a b", "c"))
  }

  test("filterSegments drops low-distinct-ratio windows and rebuilds") {
    val docs = Seq(
      (1L, "a b c d x y z w"),   // both windows ratio 1.0
      (2L, "a a a b c d e f"),   // w1 ratio 6/8 = 0.75 (kept at >= 0.75)
      (3L, "a a a a b b b b")    // ratio 2/8 = 0.25 (dropped)
    ).toDF("doc_id", "text")
    val out = Segments.filterSegments(docs, 8, 0.75)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 1, 1, "a b c d x y z w"))
    assert(out(1) == Row(2L, 1, 1, "a a a b c d e f"))
    assert(out(2) == Row(3L, 1, 0, ""))
  }

  test("dedupSegments: first occurrence wins in (doc_id, seg_no) order") {
    val docs = Seq(
      (10L, "a b c d"),          // segs: "a b", "c d"
      (20L, "c d a b e f"),      // "c d" and "a b" are later copies
      (30L, "e f g h")           // "e f" unique (different window), kept
    ).toDF("doc_id", "text")
    val out = Segments.dedupSegments(docs, 2)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(10L, 2L, 2L, "a b c d"))
    // doc 20 keeps only its novel tail "e f"
    assert(out(1) == Row(20L, 3L, 1L, "e f"))
    // doc 30's "e f" was already claimed by doc 20 (lower doc_id)
    assert(out(2) == Row(30L, 2L, 1L, "g h"))
  }

  test("dedupSegments: within-doc repeats collapse to the first") {
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val out = Segments.dedupSegments(docs, 2).collect()
    assert(out.head == Row(1L, 3L, 1L, "x y"))
  }

  test("dedupSegments: fully-duplicated doc survives with empty text") {
    val docs = Seq((1L, "p q"), (2L, "p q")).toDF("doc_id", "text")
    val out = Segments.dedupSegments(docs, 2).orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 1L, 1L, "p q"))
    assert(out(1) == Row(2L, 1L, 0L, ""))
  }

  test("dedupSegments: empty doc reports zero segments") {
    val docs = Seq((1L, ""), (2L, "a b")).toDF("doc_id", "text")
    val out = Segments.dedupSegments(docs, 2).orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 0L, 0L, ""))
    assert(out(1) == Row(2L, 1L, 1L, "a b"))
  }

  test("dropStopSegments: over-frac segments vanish corpus-wide, first copies included") {
    // "b p" appears in 3 of 4 docs (75%); the 0.5 rule drops it from ALL
    // of them — unlike dedupSegments there is no surviving first copy
    val docs = Seq(
      (1L, "b p a b"),   // segs: "b p", "a b"
      (2L, "b p c d"),
      (3L, "b p e f"),
      (4L, "g h i j")
    ).toDF("doc_id", "text")
    val out = Segments.dropStopSegments(docs, 2, maxDocFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 2L, 1L, "a b"))
    assert(out(1) == Row(2L, 2L, 1L, "c d"))
    assert(out(2) == Row(3L, 2L, 1L, "e f"))
    assert(out(3) == Row(4L, 2L, 2L, "g h i j"))
  }

  test("dropStopSegments: df counts distinct docs, not occurrences") {
    // "x y" occurs 3 times but in ONE doc of four: in-doc repetition must
    // not push a segment over a document-fraction rule
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "a b"), (3L, "c d"), (4L, "e f")
    ).toDF("doc_id", "text")
    val out = Segments.dropStopSegments(docs, 2, maxDocFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 3L, 3L, "x y x y x y"))
  }

  test("dropStopSegments: rule at 1.0 keeps everything; empty doc reports zero") {
    val docs = Seq((1L, ""), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    val out = Segments.dropStopSegments(docs, 2, maxDocFrac = 1.0)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 0L, 0L, ""))
    assert(out(1) == Row(2L, 1L, 1L, "a b"))
    assert(out(2) == Row(3L, 1L, 1L, "a b"))
  }

  test("dedupSegmentsIncremental: day-2 segments gate against day 1") {
    val table = s"spec_segstore_${System.nanoTime()}"
    val path = java.nio.file.Files
      .createTempDirectory("graft_segstore_spec").toString + "/" + table
    val d1 = Seq((1L, "a b c d"), (2L, "a b x y")).toDF("doc_id", "text")
    val o1 = Segments.dedupSegmentsIncremental(d1, 2, table, path)
      .orderBy("doc_id").collect()
    assert(o1(0) == Row(1L, 2L, 2L, "a b c d"))
    assert(o1(1) == Row(2L, 2L, 1L, "x y")) // "a b" claimed by doc 1
    // store holds the three distinct segment hashes: "a b","c d","x y"
    assert(spark.table(table).count() == 3)

    val d2 = Seq((10L, "c d e f"), (11L, "e f"), (12L, ""))
      .toDF("doc_id", "text")
    val o2 = Segments.dedupSegmentsIncremental(d2, 2, table, path)
      .orderBy("doc_id").collect()
    assert(o2(0) == Row(10L, 2L, 1L, "e f")) // "c d" known from day 1
    assert(o2(1) == Row(11L, 1L, 0L, ""))    // "e f" claimed in-batch by 10
    assert(o2(2) == Row(12L, 0L, 0L, ""))
    assert(spark.table(table).count() == 4)  // + "e f"

    // replaying day 2 read-only: same result through the merged store?
    // no — "e f" is now stored, so doc 10 loses it too (the gate is
    // against-the-corpus by design); the read-only half must agree
    // with the store state, not the original day-2 run
    val replay = Segments.segmentGate(d2, 2, table)
      .orderBy("doc_id").collect()
    assert(replay(0) == Row(10L, 2L, 0L, ""))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("segmentGate with no store table keeps all first occurrences") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = Segments.segmentGate(docs, 2, s"spec_missing_${System.nanoTime()}")
      .collect()
    assert(out.head == Row(1L, 2L, 1L, "a b"))
  }

  // ---- plan-shape pins for the r12 de-skew reworks: a future edit that
  // reintroduces an h-keyed window (or an h-only shuffle of the raw
  // occurrence frame) over the corpus-wide ops fails here, not at 100 TB.
  // An h-only exchange is legitimate ONLY directly above a partial
  // aggregate — map-side combine has already collapsed a hot segment to
  // one row per task before anything moves.
  private def assertDeskewedPlan(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = df.queryExecution.executedPlan
    assert(plan.collectWithSubqueries { case w: WindowExec => w }.isEmpty,
      "corpus-wide segment ops must not use window functions")
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hOnly = plan.collectWithSubqueries {
      case e: ShuffleExchangeExec if (e.outputPartitioning match {
        case hp: HashPartitioning =>
          hp.expressions.flatMap(_.references.map(_.name)).toSet == Set("h")
        case _ => false
      }) => e
    }
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    @annotation.tailrec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case other => other
    }
    hOnly.foreach { e =>
      val top = unwrap(e.child)
      assert(top.isInstanceOf[BaseAggregateExec],
        s"h-only shuffle must sit above a partial aggregate, got: ${top.nodeName}")
    }
  }

  test("dedupSegments plan is skew-free (no windows, h-shuffles pre-aggregated)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b e f")).toDF("doc_id", "text")
    assertDeskewedPlan(Segments.dedupSegments(docs, 2))
  }

  test("dropStopSegments plan is skew-free (no windows, h-shuffles pre-aggregated)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b e f")).toDF("doc_id", "text")
    assertDeskewedPlan(Segments.dropStopSegments(docs, 2, 0.4))
  }
}
