package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.catalog.Catalog

class VerifySpec extends SparkSpec {

  test("oracle_sql.json round-trips through a strict JSON parser") {
    val json = Verify.oracleJson(SparkEntry.oracleSql)
    val parsed = new ObjectMapper().readTree(json)
    assert(parsed.size() == SparkEntry.oracleSql.size)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(parsed.get(k).asText() == v)
    }
  }

  test("escaping survives hostile strings") {
    val nasty = Map(
      "q" -> "SELECT '\"quoted\"', '\\back\\', 'tab\there',\n'newline', 'ctl'")
    val parsed = new ObjectMapper().readTree(Verify.oracleJson(nasty))
    assert(parsed.get("q").asText() == nasty("q"))
  }

  private val rowsOnly = Catalog.all.collect {
    case (name, q) if q.oracle.isEmpty => name -> q
  }

  rowsOnly.foreach { case (name, q) =>
    test(s"$name (rows-only check) is deterministic across executions") {
      val a = q.fn(spark, sf).collect().toSeq
      val b = q.fn(spark, sf).collect().toSeq
      assert(a == b)
      assert(a.nonEmpty)
    }
  }
}
