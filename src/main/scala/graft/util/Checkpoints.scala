package graft.util

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real release of `localCheckpoint` block-store blocks.
  *
  * `Dataset.unpersist()` is NOT it: in Spark 4.x it only asks the
  * CacheManager to uncache a `persist()`/`cache()` entry, and the blocks
  * behind `RDD.localCheckpoint()` are registered with the context's
  * persistent-RDD registry directly, never with the CacheManager. So a
  * superseded checkpoint's blocks live until the internal RDD is GC'd by
  * the ContextCleaner — on a long bench run that is measurable
  * cross-query block-store pressure (a 4.6 GiB store thrashed at 8 g
  * heap in round 12's runs).
  *
  * The persisted RDD is read directly off the checkpointed Dataset:
  * `Dataset.localCheckpoint()` executes the plan, calls
  * `internalRdd.localCheckpoint()` (which persists THAT RDD), and wraps
  * it in a `LogicalRDD` — so the returned frame's logical plan names the
  * one RDD whose blocks back the checkpoint, and `release()` can
  * unpersist it by id. No registry snapshotting, and therefore no lock
  * held across job execution: concurrent streaming gates' per-batch
  * materializations and concurrent catalog-query builds checkpoint in
  * parallel, exactly as bare `localCheckpoint()` calls would. Releasing
  * a local checkpoint makes the frame unrecoverable — callers must only
  * release checkpoints they will never re-read (a superseded iteration
  * round, a previous bench rep's build).
  */
object Checkpoints {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Guards [[scopes]] only — never held while a Spark job runs. */
  private val lock = new Object

  /** A localCheckpoint'd frame plus the persistent-RDD ids backing it. */
  final case class Tracked(df: DataFrame, rddIds: Set[Int]) {
    /** Drop the checkpoint's blocks. Idempotent; the frame must not be
      * read again afterwards. */
    def release(): Unit = {
      val sc = df.sparkSession.sparkContext
      rddIds.foreach { id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Eagerly localCheckpoint `df`, recording the persistent-RDD id the
    * checkpoint created so it can later be dropped for real. */
  def tracked(df: DataFrame): Tracked = {
    val cp = df.localCheckpoint()
    val ids = cp.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Set(l.rdd.id)
      case other =>
        // unreachable on Spark 4.x (localCheckpoint always returns a
        // LogicalRDD wrapper); degrade to the pre-tracking behavior
        // (leak until ContextCleaner) rather than guess an id to kill
        log.warn(s"Checkpoints.tracked: unexpected checkpoint plan " +
          s"${other.getClass.getName}; blocks will not be releasable")
        Set.empty[Int]
    }
    Tracked(cp, ids)
  }

  // ---- keyed scope: one live checkpoint per (session, key) ------------

  /** Value = (holder, adoption nanoTime, adopting thread id) — the
    * latter two feed the fast-replacement warning below. */
  private val scopes =
    mutable.Map.empty[(SparkSession, String), (Tracked, Long, Long)]

  /** A CROSS-THREAD adoption of one key this soon after its predecessor
    * smells like the race the scope contract forbids (two concurrent
    * executions of one builder) — log loudly. Same-thread fast
    * replacement is the legitimate bench-rep / per-batch cadence and is
    * provably race-free (sequential on one thread), so it never warns.
    */
  private val FastReplaceWarnNanos = 5L * 1000 * 1000 * 1000

  /** Register an already-tracked checkpoint as the live holder of
    * (session, key), releasing the previous holder. For operators whose
    * RESULT is backed by a checkpoint (canonicalClusters' final label
    * frame, a streaming gate's per-batch materialization): execution N
    * replaces execution N−1's blocks instead of accumulating beside
    * them — the unbounded-accumulation class on a 24/7 stream, the
    * in-bench block-store-pressure class on a 94-query bench.
    *
    * Contract: at most one in-flight execution per (session, key).
    * Concurrent same-key executions would release each other's
    * still-needed blocks; a replacement arriving suspiciously fast
    * after its predecessor is logged as a likely contract violation
    * (callers that legitimately race must use distinct keys).
    */
  def adopt(key: String, t: Tracked): Tracked = {
    val k = (t.df.sparkSession, key)
    val now = System.nanoTime()
    val tid = Thread.currentThread().getId
    val prev = lock.synchronized {
      val p = scopes.get(k)
      scopes.update(k, (t, now, tid))
      p
    }
    prev.foreach { case (old, adoptedAt, oldTid) =>
      if (old.rddIds != t.rddIds) {
        if (oldTid != tid && now - adoptedAt < FastReplaceWarnNanos)
          log.warn(s"Checkpoints.adopt('$key'): thread $tid is replacing " +
            s"a checkpoint thread $oldTid adopted " +
            s"${(now - adoptedAt) / 1000000} ms ago — if two executions " +
            "of this builder are racing on one key, the loser's plan now " +
            "reads released blocks; use distinct keys")
        old.release()
      }
    }
    t
  }

  /** Checkpoint `df` under a stable key, releasing the PREVIOUS
    * checkpoint registered under the same (session, key) first.
    *
    * This is the bench-rep shape: a query builder that materializes an
    * intermediate per execution would otherwise strand one checkpoint's
    * blocks per rep (q81/q85 stranded ~20 bytes/doc/rep before this).
    * With a scope, rep N's build replaces rep N−1's blocks instead of
    * accumulating beside them. The current checkpoint stays live — the
    * returned plan (and any memoized result) still reads it.
    */
  def scoped(key: String)(df: DataFrame): DataFrame =
    adopt(key, tracked(df)).df

  /** Release and forget the live checkpoint under (session, key) — the
    * teardown half of [[scoped]]/[[adopt]] for callers whose key space
    * is not fixed (a stream that stopped, a store that was dropped).
    * No-op for unknown keys.
    */
  def close(session: SparkSession, key: String): Unit = {
    val removed = lock.synchronized(scopes.remove((session, key)))
    removed.foreach(_._1.release())
  }

  /** Release every (session, key) entry whose key satisfies `p` —
    * dataset-level teardown for keys that embed a dataset dir.
    */
  def closeMatching(session: SparkSession, p: String => Boolean): Unit = {
    val dead = lock.synchronized {
      val ks = scopes.keys.filter(k => (k._1 eq session) && p(k._2)).toSeq
      ks.flatMap(k => scopes.remove(k))
    }
    dead.foreach(_._1.release())
  }

  /** Segment-boundary test for dataset dirs embedded in scope keys
    * (always as a ':'-delimited segment): plain `contains(dir)` would
    * let releasing "data/sf1" also release "data/sf10"'s keys —
    * unpersisting blocks a still-cached frame depends on.
    */
  def keyHasDir(key: String, dir: String): Boolean =
    key.endsWith(s":$dir") || key.contains(s":$dir:")

  /** Release every checkpoint registered by `session` and drop the
    * entries (which strongly reference the session). Call on session
    * teardown in long-lived drivers: the registry itself is otherwise
    * bounded only by distinct-key count.
    */
  def closeSession(session: SparkSession): Unit = {
    val dead = lock.synchronized {
      val ks = scopes.keys.filter(_._1 eq session).toSeq
      ks.flatMap(k => scopes.remove(k))
    }
    dead.foreach(_._1.release())
  }
}
