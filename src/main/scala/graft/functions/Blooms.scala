package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

/** SQL-callable surface over Spark's OWN Bloom filter Catalyst
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` —
  * the machinery behind runtime row-group filtering), which Spark keeps
  * internal rather than registering. Re-exposing them through the
  * session registry is maximally Spark-first: the aggregate is a
  * TypedImperativeAggregate over Spark's `util.sketch.BloomFilter`
  * with map-side partial merge, and the membership probe is a codegen
  * predicate — nothing to reimplement.
  *
  * Convention mirrors `kmv_sample_by`: the caller supplies an
  * ALREADY-hashed 64-bit key (`xxhash64(...)`), keeping the hash choice
  * auditable at the call site.
  *
  * The gate built on these ([[graft.dedup.Dedup.exactGateBloom]]) uses
  * the one property that makes an approximate sketch safe in an EXACT
  * pipeline: no false negatives. "might_contain = false" proves a key
  * is corpus-new; only the "maybe" minority pays the exact verify join.
  */
object Blooms {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Convenience fallback for the one-session case; same off-thread and
    * MULTI-SESSION caveats as `Texts.ensureRegistered` (the thread's
    * active session may not be the session that analyzes the Column —
    * the gate entry points call `register(batch.sparkSession)`
    * explicitly instead of relying on this).
    */
  private def ensureRegistered(): Unit =
    SparkSession.getActiveSession.foreach(register)

  /** `bloomAgg(hash, items, bits)` → serialized filter (`binary`).
    * `numBits` is bounded by
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 64M
    * bits = 8 MB); size the filter for the store it summarizes.
    */
  def bloomAgg(hash: Column, expectedItems: Long, numBits: Long): Column = {
    ensureRegistered()
    call_function("bloom_agg", hash, lit(expectedItems), lit(numBits))
  }

  /** `bloomMightContain(filter, hash)` → boolean; `filter` must be a
    * foldable binary (a driver-held filter passed as a literal — the
    * same shape Spark's own runtime filter injects after its subquery
    * executes) or a scalar subquery.
    */
  def bloomMightContain(filter: Column, hash: Column): Column = {
    ensureRegistered()
    call_function("bloom_might_contain", filter, hash)
  }
}
