package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pii semantics on hand-computed fixtures: per-type counts, ordered
  * redaction bytes, idempotence, and the clean predicate.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val mixed =
    "Contact user15@example.com soon. Origin 10.15.0.15 noted. " +
      "Call 135-555-1035 today. edge a@b.co x 1.2.3.4. end 999-999-9999-1"

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(Tuple1(mixed)).toDF("t").select(c).head()

  test("piiStats counts every type, including word-bounded edges") {
    val r = one(Pii.piiStats(col("t")))
    val s = r.getStruct(0)
    assert(s.getLong(0) == 2L) // user15@example.com, a@b.co
    assert(s.getLong(1) == 2L) // 10.15.0.15, 1.2.3.4
    assert(s.getLong(2) == 2L) // 135-555-1035, 999-999-9999 (bounded prefix)
  }

  test("redact rewrites matches to typed tokens in declared order") {
    val got = one(Pii.redact(col("t"))).getString(0)
    assert(got ==
      "Contact <EMAIL> soon. Origin <IP> noted. " +
        "Call <PHONE> today. edge <EMAIL> x <IP>. end <PHONE>-1")
  }

  test("redact is idempotent; clean text passes through untouched") {
    val clean = "no personal data here, just words and the number 42"
    val df = Seq(mixed, clean).toDF("t")
    val once = df.select(Pii.redact(col("t")).as("r"))
    val twice = once.select(Pii.redact(col("r")).as("r"))
    assert(once.as[String].collect().toSeq ==
      twice.as[String].collect().toSeq)
    assert(df.filter(col("t") === clean)
      .select(Pii.redact(col("t"))).head().getString(0) == clean)
  }

  test("isClean splits the corpus the same way the counts do") {
    val df = Seq(
      (1L, mixed),
      (2L, "an email only: someone@example.org trailing"),
      (3L, "totally clean prose"),
      (4L, "ip 192.168.0.1 only")).toDF("id", "t")
    val clean = df.filter(Pii.isClean(col("t"))).select("id")
      .as[Long].collect().sorted
    assert(clean.toSeq == Seq(3L))
    // flag agrees with the struct counts summing to zero
    val viaStats = df.select(col("id"), Pii.piiStats(col("t")).as("p"))
      .filter(col("p.n_emails") + col("p.n_ipv4") + col("p.n_phones") === 0)
      .select("id").as[Long].collect().sorted
    assert(viaStats.toSeq == clean.toSeq)
  }

  test("dotted domain never half-matches the IP rule after redaction") {
    // 'mail.10.2.3.4.com' style: email first eats the whole mailbox
    val t = "write me: bob@mail.10.2.3.4.example.com please"
    val got = Seq(Tuple1(t)).toDF("t")
      .select(Pii.redact(col("t"))).head().getString(0)
    assert(got == "write me: <EMAIL> please")
  }
}
