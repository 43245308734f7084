package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlTableSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(html: String): Seq[Seq[String]] =
    Seq(html).toDF("h")
      .select(HtmlTableRows.htmlTableRows(col("h")).as("r"))
      .as[Seq[Seq[String]]].head()

  test("basic table: rows and cells in order, th and td both count") {
    val got = rowsOf(
      "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>")
    assert(got == Seq(Seq("A", "B"), Seq("1", "2")))
  }

  test("attribute-tolerant, case-insensitive, nested tags stripped") {
    val got = rowsOf(
      """<TABLE class="x"><TR id="r"><TD align="c"><b>bo</b>ld</TD></TR></TABLE>""")
    assert(got == Seq(Seq("bold")))
  }

  test("entities decode; whitespace trims and collapses") {
    val got = rowsOf(
      "<table><tr><td> a &amp;\n  b&nbsp;&#33; </td><td>&lt;x&gt;</td></tr></table>")
    assert(got == Seq(Seq("a & b !", "<x>")))
  }

  test("unclosed cells/rows close implicitly; only the first table parses") {
    val got = rowsOf(
      "<table><tr><td>a<td>b<tr><td>c</table><table><tr><td>z</td></tr></table>")
    assert(got == Seq(Seq("a", "b"), Seq("c")))
  }

  test("no table -> empty; null -> null; text outside cells ignored") {
    assert(rowsOf("<p>no tables here</p>") == Seq())
    val n = Seq[Option[String]](None).toDF("h")
      .select(HtmlTableRows.htmlTableRows(col("h"))).collect()
    assert(n(0).isNullAt(0))
    assert(rowsOf("<table>noise<tr>skip<td>x</td></tr></table>") ==
      Seq(Seq("x")))
  }

  test("S1 ingest: dashboard fixture parses to the reference's case shape") {
    val path = getClass.getResource("/fixtures/dashboard.html").getPath
    val got = graft.pipelines.Ingest.readHtmlCasesTable(spark, path)
      .orderBy("case_number")
      .as[(Option[Int], String, Option[Int], String, String)].collect()
    assert(got.toSeq == Seq(
      (Some(1), "Dade", Some(23), "M", "Yes"),
      (Some(2), "Santa Rosa", None, "F", "No"), // blank age -> null
      (Some(3), "Johnson & Smith", Some(45), "U", "Unknown"),
      (Some(4), "Duval", Some(7), "M", "No"))) // &#52; decodes to 4
  }
}
