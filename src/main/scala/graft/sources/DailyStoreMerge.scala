package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, countDistinct, lit}

/** Engine-native row-level MERGE for the dailystore — the last S8
  * surface (SURVEY.md §2.1; reference cv.py:126-132 runs `update_one`
  * per corrected case against Mongo). Rows in `updates` REPLACE
  * same-key rows wherever they currently live in the store, and new
  * keys INSERT into their update row's day — via COPY-ON-WRITE of only
  * the TOUCHED day partitions, committed through the connector's
  * existing manifest + writer-lease machinery. Crash replay
  * ([[DailyStoreRecovery]]), retention/time travel
  * ([[DailyStoreTimeTravel]] — a merge is an ordinary versioned
  * commit), and the single-writer contract cover a merge exactly as
  * they cover any other dailystore commit, and there is never a
  * reader-visible missing-path window (the rename-swap gap
  * [[graft.pipelines.Sinks.upsertByKey]]'s whole-table shape has).
  *
  * Shape — the transactional-format MERGE shape, re-expressed on the
  * dailystore's day partitioning:
  *
  *  1. DISCOVERY: one column-pruned scan of (pcol, key) over the store,
  *     semi-joined against the broadcast update keys, finds the days
  *     where updated keys CURRENTLY live; unioned with the updates' own
  *     days it yields the touched set. This is the honest cost of MERGE
  *     without a key index (Delta's MERGE pays the same
  *     find-touched-files join): two columns of the store, zero shuffle
  *     on the store side. `assumeKeyDayStable = true` skips it when the
  *     caller guarantees a key's day never changes — touched collapses
  *     to the updates' days and the full-store scan disappears; if the
  *     guarantee is violated, the old-day copy of a moved key SURVIVES
  *     (duplicate key), which is why the default is the safe scan.
  *  2. REWRITE: partition-pruned scan of ONLY the touched days,
  *     anti-joined (broadcast) against the update keys, unioned with
  *     the updates, written back through the connector with the
  *     explicit condemned-day set (`overwriteDays` → the same
  *     ValuesMode commit as a catalog `overwrite(d IN ...)`). A day
  *     emptied by key moves is condemned and REMOVED rather than left
  *     holding stale rows — the case dynamic overwrite cannot express,
  *     because the output never mentions that day.
  *
  * Days untouched by the merge are never read past discovery and never
  * written: their files stay byte-identical (DailyStoreMergeSpec pins
  * names + bytes). At 100 TB that is the difference between rewriting
  * a handful of day partitions and rewriting the store: cost is
  * O(touched days' data) + one two-column discovery scan, with the
  * updates broadcast on both joins.
  *
  * Driver state is bounded by construction: the only collects are the
  * touched-day values (≤ the store's day domain — 3,650 for a 10-year
  * daily store) and a 1-row sanity aggregate over the updates.
  *
  * Contract on `updates`: one row per key (keyed REPLACE is ambiguous
  * under duplicates — rejected loudly), non-null key and partition
  * values, and exactly the store's column set (a store column absent
  * from the updates would be silently dropped from every rewritten
  * day — rejected loudly instead).
  */
object DailyStoreMerge {

  /** Merge `updates` into the dailystore at `path` by `key` (class
    * doc). Creates the store when absent. Returns the touched day
    * values (empty = the updates were empty, nothing committed).
    */
  def mergeByKey(spark: SparkSession, path: String, updates0: DataFrame,
                 key: String, pcol: String = "d",
                 assumeKeyDayStable: Boolean = false): Seq[String] = {
    val cols = updates0.columns
    require(cols.contains(key),
      s"dailystore merge: updates lack the key column '$key'")
    require(cols.contains(pcol),
      s"dailystore merge: updates lack the partition column '$pcol'")
    // MATERIALIZE the updates once: the merge evaluates them three
    // times (contract aggregate, discovery join, rewrite union), and a
    // nondeterministic source (a sampled batch, a rand()-carrying
    // projection) would otherwise validate one row set and merge
    // another — the same reason Delta's MERGE materializes its source.
    // Updates are the SMALL side by contract, so the checkpoint is
    // cheap; the blocks are released before returning.
    val updatesCp = graft.util.Checkpoints.tracked(updates0)
    try mergeMaterialized(spark, path, updatesCp.df, key, pcol,
      assumeKeyDayStable, cols)
    finally updatesCp.release()
  }

  private def mergeMaterialized(spark: SparkSession, path: String,
      updates: DataFrame, key: String, pcol: String,
      assumeKeyDayStable: Boolean, cols: Array[String]): Seq[String] = {
    // one small-side aggregate validates the whole updates contract:
    // n == count(key)  → no null keys;  n == count(pcol) → no null days;
    // n == n_distinct(key) → one row per key
    val chk = updates.agg(
      count(lit(1)).as("n"), count(col(key)).as("nk"),
      count(col(pcol)).as("np"), countDistinct(col(key)).as("nd")).head()
    val n = chk.getLong(0)
    if (n == 0) return Nil
    require(chk.getLong(1) == n,
      s"dailystore merge: updates carry null '$key' values")
    require(chk.getLong(2) == n,
      s"dailystore merge: updates carry null '$pcol' values")
    require(chk.getLong(3) == n,
      s"dailystore merge: updates carry duplicate '$key' values — " +
        "keyed replace needs exactly one row per key")

    val hconf = spark.sessionState.newHadoopConf()
    val live = new Path(path)
    val fs = live.getFileSystem(hconf)
    // heal any torn prior commit BEFORE anything reads the LISTING or
    // the data: a pending manifest means both that a day could read
    // partially applied AND that a store torn at the all-days-deleted
    // crash point would look day-less — taking the fresh-append path
    // there would skip the anti-join while the append's own commit
    // preamble replays the manifest, resurrecting old copies of the
    // merged keys (r19 review)
    if (fs.exists(live))
      DailyStoreRecovery.recoverPendingCommits(path, hconf)
    // "fresh" includes an EXISTING dir with no day partitions (a store
    // whose days were all deleted keeps its sidecars/markers): there is
    // nothing to discover or anti-join against, and reading it for the
    // schema guard would fail on inference
    val hasDays = fs.exists(live) && fs.listStatus(live).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$pcol="))
    if (!hasDays) {
      updates.write.format("dailystore").option("path", path)
        .option("partitionCol", pcol).mode("append").save()
      return updates.select(col(pcol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }
    // column-set guard (class doc): the rewrite writes the updates'
    // columns, so the sets must match exactly
    val storeCols = spark.read.parquet(path).schema.fieldNames.toSet
    require(storeCols == cols.toSet,
      s"dailystore merge: store at $path has columns " +
        s"${storeCols.toSeq.sorted.mkString(",")} but updates carry " +
        s"${cols.sorted.mkString(",")} — a merge must preserve every " +
        "store column, so the sets must match")
    // read with the UPDATES' schema: pins the partition column's type
    // against directory-name inference (the digit-like-string hazard
    // DailyStoreRecovery.compact documents) and aligns column types for
    // the union below
    val store = spark.read.schema(updates.schema).parquet(path)
    val updKeys = updates.select(col(key)).distinct()
    val daysWithKeys: Seq[String] =
      if (assumeKeyDayStable) Nil
      else store.select(col(pcol), col(key))
        .join(broadcast(updKeys), Seq(key), "left_semi")
        .select(col(pcol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
    val insertDays: Seq[String] =
      updates.select(col(pcol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
    val touched = (daysWithKeys ++ insertDays).distinct.sorted
    // typed literals so the touched-day predicate is a PARTITION filter
    // (a string-vs-date comparison would cast the column and lose the
    // prune)
    val touchedVals: Seq[Any] = updates.schema(pcol).dataType match {
      case org.apache.spark.sql.types.DateType =>
        touched.map(java.sql.Date.valueOf)
      case _ => touched
    }
    val merged = store
      .filter(col(pcol).isin(touchedVals: _*))
      .join(broadcast(updKeys), Seq(key), "left_anti")
      .unionByName(updates.select(cols.map(col).toSeq: _*))
    merged.write.format("dailystore")
      .option("path", path).option("partitionCol", pcol)
      .option("overwriteDays", touched.mkString(","))
      .mode("overwrite").save()
    touched
  }

  /** Sniff a hive-layout partition column at `path`: the unique
    * `<name>=` directory prefix, when exactly one non-hidden prefix
    * exists. [[graft.pipelines.Sinks.upsertByKey]] uses it to route a
    * keyed upsert against a day-partitioned store through the
    * copy-on-write merge instead of the whole-table swap.
    */
  private[graft] def sniffPartitionCol(spark: SparkSession,
                                       path: String): Option[String] = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(live)) return None
    val prefixes = fs.listStatus(live)
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => n.contains("=") && !n.startsWith("_") &&
        !n.startsWith("."))
      .map(_.split("=", 2)(0)).distinct
    if (prefixes.length == 1) Some(prefixes.head) else None
  }
}
