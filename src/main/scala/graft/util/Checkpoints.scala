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
  * The reliable handle is `sc.getPersistentRDDs`: `RDD.localCheckpoint()`
  * persists the RDD, which registers it there by id. `tracked` snapshots
  * the registry around the (eager) checkpoint and records exactly the ids
  * it created, so `release()` can unpersist those RDDs directly. Releasing
  * a local checkpoint makes the frame unrecoverable — callers must only
  * release checkpoints they will never re-read (a superseded iteration
  * round, a previous bench rep's build).
  *
  * Driver-side discipline: the snapshot diff assumes no OTHER driver
  * thread checkpoints concurrently (bench and Verify run queries
  * sequentially; streaming gates checkpoint inside one foreachBatch
  * callback at a time). Worst case under a race is releasing a frame the
  * other thread still needs — hold [[lock]] around concurrent `tracked`
  * calls if that ever changes.
  */
object Checkpoints {

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

  /** Eagerly localCheckpoint `df`, recording the persistent-RDD ids the
    * checkpoint created so they can later be dropped for real. */
  def tracked(df: DataFrame): Tracked = lock.synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint()
    val created = sc.getPersistentRDDs.keySet.diff(before)
    Tracked(cp, created.toSet)
  }

  // ---- keyed scope: one live checkpoint per (session, key) ------------

  private val scopes = mutable.Map.empty[(SparkSession, String), Tracked]

  /** Register an already-tracked checkpoint as the live holder of
    * (session, key), releasing the previous holder. For operators whose
    * RESULT is backed by a checkpoint (canonicalClusters' final label
    * frame, a streaming gate's per-batch materialization): execution N
    * replaces execution N−1's blocks instead of accumulating beside
    * them — the unbounded-accumulation class on a 24/7 stream, the
    * in-bench block-store-pressure class on a 94-query bench.
    */
  def adopt(key: String, t: Tracked): Tracked = lock.synchronized {
    val k = (t.df.sparkSession, key)
    scopes.get(k).foreach(prev => if (prev.rddIds != t.rddIds) prev.release())
    scopes.update(k, t)
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
  def close(session: SparkSession, key: String): Unit = lock.synchronized {
    scopes.remove((session, key)).foreach(_.release())
  }

  /** Release every (session, key) entry whose key satisfies `p` —
    * dataset-level teardown for keys that embed a dataset dir.
    */
  def closeMatching(session: SparkSession, p: String => Boolean): Unit =
    lock.synchronized {
      val dead = scopes.keys
        .filter(k => (k._1 eq session) && p(k._2)).toSeq
      dead.foreach(k => scopes.remove(k).foreach(_.release()))
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
  def closeSession(session: SparkSession): Unit = lock.synchronized {
    val dead = scopes.keys.filter(_._1 eq session).toSeq
    dead.foreach(k => scopes.remove(k).foreach(_.release()))
  }
}
