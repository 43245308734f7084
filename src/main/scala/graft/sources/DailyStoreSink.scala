package graft.sources

import java.util
import java.util.UUID

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 WRITE connector for the date-partitioned case store —
  * the engine-native form of the reference's three sink patterns
  * (SURVEY.md §2.1 S7/S9 and the daily slice of S8): the reference
  * reloads whole Mongo collections (cv-api.py:184-207
  * delete_many+insert_many) and re-ingests per-day slices; here those
  * semantics live INSIDE the write planner instead of around it, the
  * way [[JsonPagesDataSource]] made the read pushdowns engine-native.
  *
  *   df.write.format("dailystore")
  *     .option("path", dir).option("partitionCol", "d")
  *     .mode("append" | "overwrite").save()
  *
  *  - `append`                      → S7 file-level append
  *  - `overwrite` (static)         → S9 truncate-and-reload
  *  - `overwrite` + `spark.sql.sources.partitionOverwriteMode=dynamic`
  *                                  → replace exactly the days present
  *                                    in the incoming frame (the
  *                                    reference's daily re-ingest)
  *  - `overwrite(d = v | d IN ...)` → replace the named days
  *                                    (OVERWRITE_BY_FILTER, for catalog
  *                                    /SQL `INSERT OVERWRITE` fronts)
  *
  * Scale notes. The Write declares a CLUSTERED-by-partition-column
  * required distribution, so Catalyst plans the pre-write shuffle that
  * [[graft.pipelines.Sinks.reloadPartitioned]] documents by hand — each
  * day lands wholly in one task and each partition directory gets ONE
  * file per job instead of tasks×days small files. Task writers emit
  * ordinary hive-layout parquet (`<pcol>=<value>/part-*.parquet`)
  * through parquet-hadoop's public writer into a per-query staging dir;
  * commit is directory surgery on the driver — delete the partitions the
  * mode condemns, then rename staged files in, bridged by a durable
  * manifest so a crash anywhere in the window replays mechanically
  * ([[DailyStoreRecovery]]; the next write self-heals). Rename-based
  * commit keeps the same single-writer contract as
  * [[graft.pipelines.Sinks.upsertByKey]]; concurrent readers of a torn
  * store still need a transactional table format — documented there,
  * not re-solved here.
  *
  * ABORT CONTRACT (operator-facing): once the commit manifest is
  * durable the commit is DECIDED — a job Spark reports as FAILED after
  * that point still rolls FORWARD, so the new data may be fully
  * visible despite the failure status (the inverse of the usual abort
  * contract; rollback would lose the already-condemned old rows).
  * Retrying the same write is safe — the day-replace is idempotent —
  * and the roll-forward logs a driver-side warning so the case is
  * visible. Before the manifest exists, abort rolls back normally.
  *
  * The store READS as plain partitioned parquet
  * (`spark.read.parquet(dir)` — partition pruning included); this class
  * deliberately adds no Scan: a second parquet reader would be worse
  * than Spark's own.
  *
  * Supported column types: the case-record primitives (int, long,
  * float, double, boolean, string, date, timestamp). The partition
  * column must be a date or string and non-null.
  */
class DailyStoreDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dailystore"

  // writes carry their own schema (the incoming frame's)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // read-path probes (e.g. a bare load()) see the live store's layout;
    // the store is plain parquet, so delegate to the session reader —
    // through the commit-state cache (r16), as catalog resolution does.
    // An EMPTIED store (every day partition removed by a commit) has no
    // footer to infer from — fall back to the meta sidecar every commit
    // stamps, the same self-describing contract the catalog front reads
    // FIRST (r20 review: the fix must not stop one altitude short of the
    // path front)
    val spark = org.apache.spark.sql.SparkSession.active
    val path = options.get("path")
    val base =
      try DelegateCache.schemaFor(spark, path)(spark.read.parquet(path).schema)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          val live = new org.apache.hadoop.fs.Path(path)
          val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
          SidecarJson.readRaw(fs, live, DailyStoreCatalog.MetaFile)
            .map(b => org.apache.spark.sql.types.DataType
              .fromJson(new String(b, "UTF-8")).asInstanceOf[StructType])
            .getOrElse(throw e)
      }
    // the change-data front (r20): a changesFrom read serves the store's
    // columns plus the classification column
    if (options.containsKey("changesFrom"))
      base.add(DailyStoreChanges.ChangeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "dailystore requires option(\"path\", ...)")
    val pcol = Option(properties.get("partitionCol")).getOrElse("d")
    // change-data-feed reads (r20, [[DailyStoreChangesTable]] doc):
    // option("changesFrom", <seq>) [.option("changesTo", <seq>)]
    // [.option("changesKey", <col>)] — looked up case-insensitively,
    // matching inferSchema's CaseInsensitiveStringMap (a
    // differently-cased option must not get the changes SCHEMA but a
    // plain TABLE, r20 review)
    val opts = new CaseInsensitiveStringMap(properties)
    Option(opts.get("changesFrom")) match {
      case Some(from) =>
        new DailyStoreChangesTable(path, pcol, schema, from.toLong,
          Option(opts.get("changesTo")).map(_.toLong),
          Option(opts.get("changesKey")))
      case None => new DailyStoreTable(path, pcol, schema)
    }
  }
}

/** `viaCatalog` records which front built the table: the path-based
  * writer keeps V1 file-source overwrite semantics (truncate vs dynamic
  * decided by `spark.sql.sources.partitionOverwriteMode`), while a
  * catalog table must honor the DSv2 contract — `overwrite(true)` /
  * TRUNCATE replaces ALL rows regardless of that conf (dynamic replace
  * has its own explicit front there, `overwritePartitions()`).
  *
  * READ side (r15): the table is also BATCH_READ, by delegating
  * `newScanBuilder` to Spark's own DSv2 parquet `FileTable` over the
  * store directory — so `SELECT * FROM dstore.t` / `spark.table(...)`
  * / `spark.read.format("dailystore").load()` work through the catalog
  * with the engine's vectorized reader, partition pruning, and
  * `FileScan`'s statistics report (AQE sees store sizes from the scan
  * instead of guessing). This keeps the r14 judgment — no hand-rolled
  * parquet reader — while closing the read-front gap. The delegate
  * (and its expensive leaf-file listing) is served by [[DelegateCache]]
  * (r16), keyed on the store's commit state so reads still always see
  * the CURRENT store — see its scaladoc for the measured listing costs
  * and the invalidation argument. Staging dirs and commit manifests are
  * underscore-prefixed, which Spark's file index already treats as
  * hidden.
  */
class DailyStoreTable(path: String, pcol: String, schema0: StructType,
                      viaCatalog: Boolean = false)
  extends Table with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsRead {

  /** Store location / partition column, exposed for the SQL DML rules
    * ([[graft.plans.DailyStoreDml]]) that rewrite MERGE/UPDATE/DELETE
    * on this table into the connector's copy-on-write commits. */
  private[graft] def storePath: String = path
  private[graft] def partitionCol: String = pcol

  override def name(): String = s"dailystore($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DailyStoreWriteBuilder(path, pcol, info, viaCatalog)

  // hive-layout stores carry the partition column in directory names;
  // FileTable puts partition columns after data columns, so hand it the
  // schema in that order or column resolution misaligns
  private def delegateSchema: StructType = StructType(
    schema0.fields.filter(_.name != pcol) ++
      schema0.fields.filter(_.name == pcol))

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    DelegateCache.delegateFor(org.apache.spark.sql.SparkSession.active,
      path, name(), delegateSchema).newScanBuilder(options)
}

/** Commit-state-keyed cache of the store's read delegate (r16).
  *
  * The r15 read front rebuilt the parquet `FileTable` delegate — and
  * with it the full leaf-file listing — on EVERY table resolution,
  * because a cached FileIndex can silently serve stale reads after a
  * write. `ListingProbe` swept that cost across store sizes (local FS,
  * the CHEAP case, medians-of-5): pruned single-day reads pay 1.3 s of
  * discovery at 400 day-partitions, 3.5 s at 1,600, 10.9 s at 6,400 —
  * and the catalog front doubles it (schema inference is a second full
  * listing) to 24 s at 6,400 days. Linear, and a 10-year daily store is
  * 3,650 partitions — re-listing per query is the wrong trade at scale.
  *
  * The r15 commit-manifest protocol provides the missing invalidation
  * signal: EVERY dailystore commit creates and then deletes a
  * `_commit-<queryId>.json` at the store ROOT (touching the root dir's
  * mtime twice) and renames files inside every touched `pcol=` dir
  * (touching that dir's mtime). So one cheap `listStatus` of the root —
  * N entries, not the N-dir leaf-file walk — yields an exact
  * commit-state key: the root's own mtime plus every child's
  * (name, mtime, isDir). The cached delegate (whose lazy FileIndex
  * holds the expensive leaf listing) and the cached inferred schema are
  * reused while the key matches and rebuilt the moment any commit,
  * append, truncate, compaction, or out-of-band write changes it.
  *
  * Caveats, documented not hidden: (1) the key trusts directory mtimes
  * — exact on local FS and HDFS, where rename/create/delete update the
  * parent dir; on object stores with synthetic dirs disable via
  * `spark.sql.dailystore.readCache=false` (every resolution then
  * re-lists, the r15 behavior); (2) same-dir rewrites within one mtime
  * tick could alias — sub-millisecond back-to-back commits on local FS,
  * but ALSO ordinary-speed commits on COARSE-granularity filesystems
  * (NFS and some network mounts round mtime to 1 s): two commits inside
  * one tick leave identical child names and mtimes. The key therefore
  * also folds each root child's LENGTH (free — it rides the same
  * FileStatus), which breaks most same-tick aliases (a commit changes
  * root-level marker/sidecar sizes); a store on a coarse-mtime mount
  * whose commits are faster than the tick should still run with
  * `readCache=false`;
  * (3) the key sees CREATE/DELETE/RENAME-shaped changes only — an
  * out-of-band IN-PLACE rewrite of an existing leaf file under the
  * same name (distcp -overwrite, manual fixup) touches the file's
  * mtime but not its parent dir's, so the cached FileIndex would keep
  * the old file length; such maintenance must go through the connector
  * (whose commit renames fresh names in) or run with the cache conf
  * off. Entries are per (session, store path), LRU-bounded per
  * session; a session's cache is dropped wholesale when the session is
  * GC'd (weak keys).
  */
private[sources] object DelegateCache {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable

  private final case class Entry(stateKey: Long, schema: Option[StructType],
                                 delegate: Option[ParquetTable])

  /** Stores cached per session — each Entry pins a ParquetTable whose
    * lazy FileIndex holds a full leaf listing, so the per-session map
    * is LRU-bounded (a long-lived multi-store driver must not grow
    * heap ∝ distinct store paths touched). */
  private val MaxStoresPerSession = 64

  // weak session keys: a dropped session must not pin its FileIndexes
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      java.util.LinkedHashMap[String, Entry]]()

  private def newLru() =
    new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Entry]): Boolean =
        size() > MaxStoresPerSession
    }

  /** Rebuild count, exposed for the read-after-write specs: hits don't
    * increment it. */
  @volatile private[sources] var rebuilds: Long = 0L

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.dailystore.readCache", "true").toBoolean

  /** One root listStatus → exact commit-state key (see class doc).
    * Entries are sorted by name before folding: the FileSystem contract
    * does not fix listStatus order, and an order-sensitive hash on a
    * connector with unstable enumeration would silently rebuild on
    * every resolution — defeating the cache with no error. */
  private def stateKey(spark: SparkSession, path: String): Long = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(live)) return 0L
    var h = fs.getFileStatus(live).getModificationTime
    fs.listStatus(live).sortBy(_.getPath.getName).foreach { s =>
      h = h * 31 + s.getPath.getName.hashCode
      h = h * 31 + s.getModificationTime
      h = h * 31 + s.getLen // breaks same-mtime-tick aliases (caveat 2)
      h = h * 31 + (if (s.isDirectory) 1 else 0)
    }
    h
  }

  private def entryFor(spark: SparkSession, path: String): Entry = {
    val key = stateKey(spark, path)
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) { m = newLru(); cache.put(spark, m) }
      val e = m.get(path)
      if (e != null && e.stateKey == key) e
      else { val fresh = Entry(key, None, None); m.put(path, fresh); fresh }
    }
  }

  private def update(spark: SparkSession, path: String, e: Entry): Unit =
    cache.synchronized {
      val m = cache.get(spark)
      if (m != null) m.put(path, e)
    }

  def delegateFor(spark: SparkSession, path: String, name: String,
                  delegateSchema: StructType): ParquetTable = {
    def build(): ParquetTable = {
      rebuilds += 1
      ParquetTable(name, spark, CaseInsensitiveStringMap.empty(),
        Seq(path), Some(delegateSchema),
        classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
    }
    if (!enabled(spark)) return build()
    val e = entryFor(spark, path)
    e.delegate match {
      case Some(d) if d.userSpecifiedSchema.contains(delegateSchema) => d
      case _ =>
        val d = build()
        update(spark, path, e.copy(delegate = Some(d)))
        d
    }
  }

  /** Schema-inference fallback for catalog stores without a meta
    * sidecar — the second full listing the probe measured; cached under
    * the same commit-state key. */
  def schemaFor(spark: SparkSession, path: String)
               (infer: => StructType): StructType = {
    if (!enabled(spark)) return infer
    val e = entryFor(spark, path)
    e.schema match {
      case Some(s) => s
      case None =>
        val s = infer
        update(spark, path, e.copy(schema = Some(s)))
        s
    }
  }
}

/** A second writer's commit window overlapped a live writer's lease
  * (see [[WriterLease]]) — the single-writer contract failed LOUDLY
  * instead of the second writer replaying the live peer's commit
  * manifest mid-window.
  */
class DailyStoreConcurrentWriteException(msg: String)
  extends IllegalStateException(msg)

/** The dailystore single-writer contract, ENFORCED (r15 VERDICT: it was
  * documented but trusted). A `_writer.lock` marker at the store root is
  * taken at `commit()` entry — BEFORE the recovery preamble, so a second
  * writer can never replay a LIVE peer's manifest — and released after
  * manifest cleanup. Acquisition is create-fail (`fs.create(lock,
  * overwrite = false)`, atomic on HDFS-like stores; best-effort
  * check-then-act on local FS, backed by a read-back verification of the
  * holder id so a lost race is still detected). A lock older than the
  * TTL is a crashed writer's leftover: it is taken over (deleted and
  * re-acquired), and [[DailyStoreRecovery.recoverPendingCommits]]
  * self-heals it the same way. The TTL bounds the COMMIT window
  * (driver-side directory surgery — seconds), not the write job; the
  * default is generous for that.
  */
private[sources] object WriterLease {
  val DefaultTtlMs: Long = 10 * 60 * 1000L

  def lockPath(live: Path): Path = new Path(live, "_writer.lock")

  private def holderOf(fs: org.apache.hadoop.fs.FileSystem,
                       lock: Path): Option[(String, Long)] =
    try {
      val st = fs.getFileStatus(lock)
      val in = fs.open(lock)
      val bytes = try in.readAllBytes() finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bytes)
      Some((node.get("queryId").asText(), st.getModificationTime))
    } catch { case _: Exception => None }

  /** Live (unexpired) holder's queryId, if any. An unreadable lock file
    * counts as live under an unknown holder — failing loudly beats
    * assuming a torn lock means no writer. */
  def liveHolder(fs: org.apache.hadoop.fs.FileSystem, live: Path,
                 ttlMs: Long): Option[String] = {
    val lock = lockPath(live)
    if (!fs.exists(lock)) return None
    val now = System.currentTimeMillis()
    holderOf(fs, lock) match {
      case Some((qid, mtime)) if now - mtime <= ttlMs => Some(qid)
      case Some(_) => None // expired: takeover candidate
      case None =>
        // unreadable: expired by mtime? (torn write from a crashed peer)
        try {
          if (now - fs.getFileStatus(lock).getModificationTime <= ttlMs)
            Some("<unreadable>")
          else None
        } catch { case _: java.io.FileNotFoundException => None }
    }
  }

  def acquire(fs: org.apache.hadoop.fs.FileSystem, live: Path,
              queryId: String, ttlMs: Long): Unit = {
    val lock = lockPath(live)
    fs.mkdirs(live)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lock, false)
        try out.write(
          s"""{"queryId":"$queryId","acquiredAt":${System.currentTimeMillis()}}"""
            .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      liveHolder(fs, live, ttlMs) match {
        case Some(qid) if qid != queryId =>
          throw new DailyStoreConcurrentWriteException(
            s"dailystore: $live is being written by query $qid (live " +
              "_writer.lock) — the store is single-writer; serialize " +
              "writes, or delete the lock only if that writer is known " +
              "dead (a crashed writer's lock expires after " +
              s"${ttlMs / 1000}s on its own)")
        case Some(_) => return // re-entrant: we already hold it
        case None => // expired leftover: take over
          // Compare-and-delete: a peer's JUST-COMPLETED takeover replaces
          // the expired lock with a FRESH one between our expiry check and
          // this delete; deleting blindly would remove the winner's lock
          // and both writers would pass read-back (the loser only failing
          // later at the winner's assertHeld). Re-read and delete only
          // while the lock is STILL expired — narrows the window to the
          // re-read/delete gap; the read-back + assertHeld backstops stay.
          val now = System.currentTimeMillis()
          val freshAgain = holderOf(fs, lock) match {
            case Some((_, mtime)) => now - mtime <= ttlMs
            case None => // unreadable: judge by raw mtime; vanished = stale
              try now - fs.getFileStatus(lock).getModificationTime <= ttlMs
              catch { case _: java.io.FileNotFoundException => false }
          }
          if (freshAgain) throw new DailyStoreConcurrentWriteException(
            s"dailystore: lost the lease takeover race on $live — " +
              "another writer re-acquired _writer.lock concurrently")
          fs.delete(lock, false)
          if (!tryCreate()) throw new DailyStoreConcurrentWriteException(
            s"dailystore: lost the lease takeover race on $live — " +
              "another writer acquired _writer.lock concurrently")
      }
    }
    // read-back verification: on filesystems where create(false) is
    // check-then-act rather than atomic, a racing writer may have
    // overwritten the slot — the content names the winner
    holderOf(fs, lockPath(live)) match {
      case Some((qid, _)) if qid == queryId => ()
      case Some((qid, _)) => throw new DailyStoreConcurrentWriteException(
        s"dailystore: lost the lease race on $live to query $qid")
      case None => throw new DailyStoreConcurrentWriteException(
        s"dailystore: lease on $live vanished during acquisition " +
          "(concurrent takeover)")
    }
  }

  /** Delete the lock if this writer still holds it (a pathological
    * over-TTL commit may have been taken over — don't delete the
    * taker's lock). */
  def release(fs: org.apache.hadoop.fs.FileSystem, live: Path,
              queryId: String): Unit = {
    val lock = lockPath(live)
    holderOf(fs, lock) match {
      case Some((qid, _)) if qid == queryId => fs.delete(lock, false)
      case _ => ()
    }
  }

  /** Re-verify the lease mid-window: a commit stalled past the TTL may
    * have been taken over, and continuing the directory surgery then
    * would interleave two writers' deletes/renames. Called before each
    * destructive phase — failing loudly here is the contract.
    */
  def assertHeld(fs: org.apache.hadoop.fs.FileSystem, live: Path,
                 queryId: String): Unit =
    holderOf(fs, lockPath(live)) match {
      case Some((qid, _)) if qid == queryId => ()
      case other => throw new DailyStoreConcurrentWriteException(
        s"dailystore: writer $queryId lost its lease on $live mid-commit " +
          s"(now held by ${other.map(_._1).getOrElse("nobody")}) — the " +
          "commit stalled past the lease TTL and was taken over; " +
          "aborting before touching the store further")
    }
}

/** What commit() condemns before moving staged files in. */
private[sources] sealed trait ReplaceMode
private[sources] case object AppendMode extends ReplaceMode
private[sources] case object TruncateMode extends ReplaceMode
private[sources] case object DynamicMode extends ReplaceMode
private[sources] final case class ValuesMode(vs: Seq[String]) extends ReplaceMode

class DailyStoreWriteBuilder(path: String, pcol: String,
                             info: LogicalWriteInfo,
                             viaCatalog: Boolean = false)
  extends WriteBuilder with SupportsOverwrite with SupportsDynamicOverwrite {

  private var mode: ReplaceMode = AppendMode

  /** The entry the engine uses for `mode("overwrite")` (V2Writes calls
    * `truncate()` directly for a literal-true delete condition). The
    * path-based DataFrameWriter has no front for
    * OverwritePartitionsDynamic (that needs a catalog table +
    * `writeTo().overwritePartitions()`), so the V1 file-source contract
    * is honored HERE for PATH-BASED writes only: under
    * `spark.sql.sources.partitionOverwriteMode=dynamic` (or the
    * equivalent per-write option), a full overwrite means "replace the
    * partitions the incoming data touches" — exactly as INSERT
    * OVERWRITE behaves on a V1 partitioned parquet path.
    *
    * A CATALOG-front table never consults that conf: the DSv2 contract
    * says `overwrite(lit(true))` / TRUNCATE replaces all rows, and
    * dynamic replace has its own explicit entry
    * (`overwritePartitions()` → [[overwriteDynamicPartitions]]).
    * Honoring the V1 conf there would silently retain partitions absent
    * from the incoming frame when the session conf happens to be
    * dynamic.
    */
  override def truncate(): WriteBuilder = {
    // explicit condemned-day front for PATH-BASED writes (r19): the
    // DataFrameWriter path has no way to reach overwrite(filters), but
    // a copy-on-write MERGE ([[DailyStoreMerge.mergeByKey]]) must
    // condemn days the OUTPUT may not mention (a day emptied by key
    // moves) — dynamic mode can't express that, and truncate would
    // rewrite the world. `option("overwriteDays", "v1,v2,...")` names
    // the exact day set, same ValuesMode semantics as a catalog
    // `overwrite(d IN ...)`. Honored only with mode("overwrite") on the
    // path front; catalog tables keep the DSv2 filter contract.
    Option(info.options.get("overwriteDays")).filter(_ => !viaCatalog)
      .foreach { csv =>
        val days = csv.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        require(days.nonEmpty,
          "dailystore: overwriteDays names no partition values")
        days.foreach(v => require(v.matches("[0-9A-Za-z._-]+"),
          s"dailystore: overwriteDays value '$v' contains path-unsafe " +
            "characters (allowed: [0-9A-Za-z._-])"))
        mode = ValuesMode(days.distinct.sorted)
        return this
      }
    val dynamic = !viaCatalog && {
      val opt = Option(info.options.get("partitionOverwriteMode"))
      val conf = org.apache.spark.sql.SparkSession.active.conf
        .get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      opt.getOrElse(conf).equalsIgnoreCase("dynamic")
    }
    mode = if (dynamic) DynamicMode else TruncateMode
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = DynamicMode; this
  }

  /** Partition-level filter overwrite: only conditions that name whole
    * days are accepted — anything finer would be a row-level MERGE,
    * which plain parquet cannot do atomically (use a transactional
    * format, or [[graft.pipelines.Sinks.upsertByKey]]'s documented
    * swap). Rejecting loudly here beats silently dropping rows.
    *
    * The filter ARRAY is a conjunction (the V2 contract): the condemned
    * set is the INTERSECTION of each filter's day set — a union would
    * delete days the condition does not actually select. `Or` of day
    * conditions unions within one filter (e.g. `d === a || d === b`).
    */
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    // None = "all days" (AlwaysTrue conjunct)
    def values(f: Filter): Option[Set[String]] = f match {
      case AlwaysTrue() => None
      case EqualTo(a, v) if a == pcol => Some(Set(String.valueOf(v)))
      case In(a, vs) if a == pcol =>
        Some(vs.toSeq.map(String.valueOf).toSet)
      case org.apache.spark.sql.sources.Or(l, r) =>
        (values(l), values(r)) match {
          case (Some(a), Some(b)) => Some(a union b)
          case _ => None // x OR true = true
        }
      case other => throw new IllegalArgumentException(
        s"dailystore: overwrite condition must name whole $pcol " +
          s"partitions (=, IN, or OR of those); got $other")
    }
    val days: Option[Set[String]] = filters.toSeq
      .map(values)
      .foldLeft(Option.empty[Set[String]]) {
        case (None, next) => next
        case (acc, None) => acc
        case (Some(a), Some(b)) => Some(a intersect b)
      }
    days match {
      case None => truncate() // empty array / AlwaysTrue: full overwrite,
        // routed through the dynamic-vs-static decision
      case Some(vs) => mode = ValuesMode(vs.toSeq.sorted); this
    }
  }

  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    private val pIdx = info.schema().fieldIndex(pcol)

    // one day -> one task -> one file: the engine plans the clustering
    // shuffle reloadPartitioned() documents by hand
    override def requiredDistribution(): Distribution =
      Distributions.clustered(Array(Expressions.identity(pcol)))
    override def requiredOrdering(): Array[SortOrder] = Array.empty

    override def toBatch: BatchWrite =
      new DailyStoreBatchWrite(path, pcol, pIdx, info.schema(),
        mode, info.queryId(),
        Option(info.options.get("leaseTtlMs")).map(_.toLong)
          .getOrElse(WriterLease.DefaultTtlMs))
  }
}

class DailyStoreBatchWrite(path: String, pcol: String, pIdx: Int,
                           schema: StructType, mode: ReplaceMode,
                           queryId: String,
                           leaseTtlMs: Long = WriterLease.DefaultTtlMs)
  extends BatchWrite {

  private val staging = s"$path/__stage_$queryId"
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    DailyStoreWriterFactory(staging, schema, pcol, pIdx, conf)

  /** Commit messages carry (partition value, staged file) pairs, and
    * ONLY those files are renamed into the store: a failed or
    * speculative task attempt leaves files in staging that no accepted
    * commit message names, and renaming whatever is present would
    * commit duplicate rows (two attempts of one task) or a footer-less
    * partial (executor death mid-write). Everything unnamed dies with
    * the staging root.
    *
    * Crash safety (r15): the delete-then-rename window is bridged by a
    * MANIFEST — `_commit-<queryId>.json` at the store root, written
    * BEFORE any partition is condemned, listing the condemned dirs and
    * every staged rename, deleted only after the staging root is gone.
    * A driver crash anywhere inside the window leaves the manifest
    * behind, and [[DailyStoreRecovery.recoverPendingCommits]] replays
    * it to exactly the committed end state (old files in condemned
    * dirs are those NOT named by the manifest; staged files still in
    * staging are the renames that did not happen yet). The next
    * commit() on the same store self-heals by running recovery first —
    * a torn store is repaired the moment anything writes to it again.
    * Readers between the crash and the repair see plain parquet with
    * the torn subset of files (the same non-transactional-read caveat
    * as any bare-parquet overwrite; a transactional table format is
    * the answer where that matters).
    */
  /** Stamp/refresh the durable schema sidecar (commitLocked doc) — the
    * raw-`StructType.json` format CREATE TABLE uses, written through
    * the one [[SidecarJson]] atomicity helper. Mode-aware (r20 review):
    *
    *  - no meta yet: stamp this write's schema in INFERENCE order (data
    *    columns first, partition column last) — exactly the column
    *    order a path-written store always resolved to, so positional
    *    INSERTs keep their bindings.
    *  - TRUNCATE, or ANY commit into a DAY-LESS store (a re-seed after
    *    delete-everything): all surviving data is this write's, so its
    *    schema is the truth. When the column SET is unchanged the
    *    existing meta keeps its declared order but takes this write's
    *    TYPES (a full replace may legitimately retype a column; old
    *    footers are gone); a different set restamps wholesale in
    *    inference order.
    *  - partial commits (append / day replace): restamp ONLY when this
    *    write WIDENS the set (writer-side schema evolution), and then
    *    by appending the new columns to the EXISTING meta's field list
    *    (before the partition column when it sits last) — never
    *    narrowing (a narrow frame's day write must not hide columns
    *    still alive in untouched days) and never reordering (a CREATE
    *    TABLE store keeps its declared order across evolution).
    *    Same-name type changes are deliberately NOT tracked here: with
    *    old days still holding the old type, there is no one true
    *    schema — that needs a rewriting migration, not a stamp.
    *
    * Crash-window note (r21, from the r20 review): the stamp lands
    * BEFORE the manifest, so a crash between the two applies the stamp
    * for a commit that never happened. For widen-only stamps that is
    * benign (the extra columns read as NULL until the write is
    * retried). For the TRUNCATE/re-seed RETYPE case the sidecar can
    * briefly declare types the surviving old parquet does not have —
    * until the write is retried, which recovery forces on the next
    * commit. Stamping after the manifest instead would trade this for
    * the inverse window (a REPLAYED commit whose stamp never landed),
    * so the pre-manifest order stays; the replay path re-stamps.
    */
  private def stampMeta(fs: org.apache.hadoop.fs.FileSystem,
                        live: Path, dayless: Boolean): Unit = {
    def inferenceOrdered(s: StructType) = StructType(
      s.fields.filter(_.name != pcol) ++ s.fields.filter(_.name == pcol))
    val existing: Option[StructType] =
      SidecarJson.readRaw(fs, live, DailyStoreCatalog.MetaFile).flatMap { b =>
        try Some(org.apache.spark.sql.types.DataType
          .fromJson(new String(b, "UTF-8")).asInstanceOf[StructType])
        catch { case _: Exception => None } // torn/garbled: restamp
      }
    val newByName = schema.fields.map(f => f.name -> f).toMap
    val replacement: Option[StructType] = existing match {
      case None => Some(inferenceOrdered(schema))
      case Some(cur) if dayless || mode == TruncateMode =>
        if (cur.fieldNames.toSet == schema.fieldNames.toSet)
          // same universe: keep the declared order, take this write's
          // types (the data they described is gone)
          Some(StructType(cur.fields.map(f => newByName(f.name))))
        else Some(inferenceOrdered(schema))
      case Some(cur) =>
        val curNames = cur.fieldNames.toSet
        val added = schema.fields.filter(f => !curNames.contains(f.name))
        if (added.isEmpty || !curNames.subsetOf(schema.fieldNames.toSet))
          None // identical, narrower, or diverging: keep the meta
        else if (cur.fields.lastOption.exists(_.name == pcol))
          Some(StructType(cur.fields.dropRight(1) ++ added :+ cur.fields.last))
        else Some(StructType(cur.fields ++ added))
      }
    replacement.filterNot(r => existing.contains(r)).foreach { r =>
      fs.mkdirs(live)
      SidecarJson.writeRaw(fs, live, DailyStoreCatalog.MetaFile,
        r.json.getBytes("UTF-8"))
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    val live = new Path(path)
    // the single-writer lease covers the whole window — recovery
    // preamble through manifest cleanup — so a concurrent writer fails
    // loudly instead of replaying THIS write's live manifest
    WriterLease.acquire(fs, live, queryId, leaseTtlMs)
    try commitLocked(fs, live, messages)
    finally WriterLease.release(fs, live, queryId)
  }

  private def commitLocked(fs: org.apache.hadoop.fs.FileSystem, live: Path,
                           messages: Array[WriterCommitMessage]): Unit = {
    // replay any torn commit a crashed driver left behind: its manifest
    // names a DIFFERENT queryId's staging, never this write's
    DailyStoreRecovery.recoverPendingCommits(path, conf.value,
      heldBy = Some(queryId), ttlMs = leaseTtlMs)
    def partDirs(): Seq[Path] =
      if (!fs.exists(live)) Nil
      else fs.listStatus(live).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$pcol=")).map(_.getPath).toSeq
    val committed: Seq[(String, String)] = messages.toSeq.flatMap {
      case m: DailyStoreCommit => m.files
    }
    val written = committed.map(_._1).distinct
    val condemned: Seq[Path] = mode match {
      case AppendMode => Nil
      case TruncateMode => partDirs()
      case DynamicMode => written.map(v => new Path(live, s"$pcol=$v"))
      case ValuesMode(vs) => vs.map(v => new Path(live, s"$pcol=$v"))
    }
    val manifest = DailyStoreRecovery.manifestPath(live, queryId)
    // time-travel retention (r16): when the store carries a retention
    // marker, this commit's condemned files are ARCHIVED into a version
    // dir instead of deleted, and the manifest is retained there —
    // `archiveRel` rides the manifest so crash replay does the same.
    // The seq is assigned retention ON OR OFF (r18): every state-changing
    // commit stamps the `_last_commit` sidecar with it, which is what
    // lets time-travel readers detect a retention-off commit at the
    // head that left no version dir behind
    val commitSeq = DailyStoreTimeTravel.nextSeq(fs, live)
    val archiveRel: Option[String] =
      DailyStoreTimeTravel.retentionOf(fs, live).map(_ =>
        DailyStoreTimeTravel.versionDirName(commitSeq, queryId))
    if (condemned.nonEmpty || committed.nonEmpty) {
      fs.mkdirs(live)
      // self-describing store (r20): stamp/refresh the same
      // `_dailystore_meta.json` CREATE TABLE writes, so a PATH-written
      // store resolves through the catalog (and any later statement)
      // even after a commit removes its every day partition — with
      // zero parquet footers, inference throws UNABLE_TO_INFER_SCHEMA
      // and the store is wedged for DML until data reappears (the
      // DailyStoreDmlPropertySpec delete-everything-then-UPDATE seed).
      // Inside the state-changing guard so a ZERO-row commit stays a
      // complete no-op (no ghost store dir, no metadata mutation from
      // a write that committed nothing), and BEFORE the destructive
      // phase so a crash mid-commit leaves the meta for the replay's
      // readers. `dayless` = the store holds no day partitions right
      // now, i.e. this commit re-seeds it (stampMeta doc).
      stampMeta(fs, live, dayless = partDirs().isEmpty)
      DailyStoreRecovery.writeManifest(fs, manifest, pcol,
        new Path(staging).getName, condemned.map(_.getName), committed,
        archiveRel, Some(commitSeq))
    }
    // a window stalled past the TTL may have been taken over — verify
    // before the destructive phase rather than interleave two writers'
    // surgery (the manifest is durable, so the taker's recovery
    // preamble completes this commit either way)
    WriterLease.assertHeld(fs, live, queryId)
    condemned.foreach { dir =>
      archiveRel match {
        case Some(rel) =>
          DailyStoreRecovery.archiveFiles(fs, live, rel, dir, Set.empty)
        case None => fs.delete(dir, true)
      }
    }
    // the condemned phase can be long (per-file archive renames under
    // retention) — re-verify before the second long phase too
    if (condemned.nonEmpty) WriterLease.assertHeld(fs, live, queryId)
    // staged files carry task+uuid names, so append never collides
    committed.foreach { case (pv, name) =>
      val target = new Path(live, s"$pcol=$pv")
      fs.mkdirs(target)
      val from = new Path(new Path(staging, s"$pcol=$pv"), name)
      val to = new Path(target, name)
      if (!fs.rename(from, to))
        throw new java.io.IOException(
          s"dailystore: commit rename failed: $from -> $to")
    }
    fs.delete(new Path(staging), true)
    // stamp the commit head BEFORE finalizing the manifest: a crash
    // between the stamp and the finalize leaves the manifest pending,
    // and recovery's replay re-stamps idempotently (monotone advance) —
    // so a completed commit is ALWAYS visible in the sidecar, retention
    // on or off, which is the invariant the time-travel head-gap check
    // rests on
    if (condemned.nonEmpty || committed.nonEmpty)
      DailyStoreTimeTravel.recordCommitSeq(fs, live, commitSeq)
    archiveRel match {
      case Some(rel) if fs.exists(manifest) =>
        // retain the manifest with its version (renamed OUT of the
        // pending _commit-* namespace in one atomic op), then bound
        // the archive
        val adir = new Path(live, rel)
        fs.mkdirs(adir)
        if (!fs.rename(manifest, new Path(adir, "manifest.json")))
          throw new java.io.IOException(
            s"dailystore: manifest retention rename failed: $manifest")
        DailyStoreTimeTravel.retentionOf(fs, live).foreach(k =>
          DailyStoreTimeTravel.prune(fs, live, k))
      case _ => fs.delete(manifest, false)
    }
  }

  /** Before the manifest exists the commit is undecided — roll BACK
    * (drop staging). Once the manifest is durable the commit is
    * decided — roll FORWARD (replay it), because the condemned
    * partitions may already be gone and dropping staging would lose
    * both the old and the new rows. See the class docs of
    * [[DailyStoreDataSource]] for the operator-facing consequence (a
    * FAILED overwrite may still be committed); the roll-forward logs a
    * warning so a committed-on-failure write is visible in driver logs.
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(staging).getFileSystem(conf.value)
    val live = new Path(path)
    val manifest = DailyStoreRecovery.manifestPath(live, queryId)
    if (fs.exists(manifest)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dailystore: abort after durable commit manifest for query " +
          s"$queryId on $path — rolling FORWARD (the write commits " +
          "despite the reported failure; a retry of the same day-replace " +
          "is idempotent)")
      // under the same lease as a commit; if a LIVE later writer
      // already holds it, ITS recovery preamble replays this manifest —
      // skip rather than race it
      try {
        WriterLease.acquire(fs, live, queryId, leaseTtlMs)
        try DailyStoreRecovery.recoverPendingCommits(path, conf.value,
          heldBy = Some(queryId), ttlMs = leaseTtlMs)
        finally WriterLease.release(fs, live, queryId)
      } catch {
        case e: DailyStoreConcurrentWriteException =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"dailystore: abort roll-forward deferred to the live " +
              s"writer's recovery preamble (${e.getMessage})")
      }
    } else fs.delete(new Path(staging), true)
  }
}

/** Replay of torn `dailystore` commits from their durable manifests.
  *
  * The manifest (`_commit-<queryId>.json` at the store root) is the
  * commit point: written before any partition is condemned, it lists
  * the condemned partition dirs, the staging dir name, and every
  * (partition value, staged file name) rename. Replay is idempotent
  * and correct from ANY crash point inside the window, because the two
  * halves are distinguishable by name: in a condemned dir, OLD files
  * are exactly those the manifest does not name (staged names are
  * task-id + UUID — collision-free), and the renames still outstanding
  * are exactly the manifest-named files still present in staging.
  *
  *  - crash after manifest, before deletes: old files deleted now,
  *    every rename replays;
  *  - crash mid-deletes or mid-renames: surviving old files deleted,
  *    remaining renames replay, already-renamed files are kept;
  *  - crash after renames, before cleanup: nothing to delete or
  *    rename — staging and manifest are dropped.
  *
  * [[DailyStoreBatchWrite.commit]] runs this before every write
  * (self-healing store) and [[DailyStoreBatchWrite.abort]] rolls
  * forward through it once its own manifest is durable; operators can
  * also invoke it directly on a store that crashed with no follow-up
  * write.
  */
object DailyStoreRecovery {

  def manifestPath(live: Path, queryId: String): Path =
    new Path(live, s"_commit-$queryId.json")

  /** File-count maintenance for append-heavy stores: every day partition
    * holding more than `maxFiles` data files is rewritten as ONE file.
    * The reference's daily re-ingest appends a file per day per run, so
    * a long-lived store trends toward files ∝ runs — this is the
    * scheduled compaction op, the dailystore analogue of
    * `Dedup.compactHashStore`. Returns the number of days compacted.
    *
    * Implementation is the CONNECTOR AGAINST ITSELF: read the crowded
    * days (partition-pruned scan through the plain-parquet read layout)
    * and dynamic-day-overwrite them back through the `dailystore`
    * writer — ONE distributed job, the clustered required distribution
    * yields exactly one file per day, and the staged-rename commit with
    * its durable manifest makes the self-overwrite crash-safe: source
    * files are only read while tasks run, the commit's delete-rename
    * happens after the job completes, and a crash mid-commit replays
    * via [[recoverPendingCommits]] like any other write. Single-writer
    * contract as everywhere in the store.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              pcol: String = "d", maxFiles: Int = 1): Int = {
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(live)) return 0
    recoverPendingCommits(path, spark.sessionState.newHadoopConf())
    val crowded = fs.listStatus(live)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pcol="))
      .filter(d => fs.listStatus(d.getPath).count(f => !f.isDirectory &&
        f.getPath.getName.endsWith(".parquet")) > maxFiles)
      .map(_.getPath.getName.stripPrefix(s"$pcol="))
    if (crowded.isEmpty) return 0
    import org.apache.spark.sql.functions.col
    // Resolve the read with partition-type INFERENCE OFF: a string
    // pcol holding digit-like values ("20240101") would otherwise be
    // inferred as integer and the write side would reject the rewrite
    // ("partition column must be date or string"). With inference off
    // the partition value surfaces as its exact directory string, so
    // the rewrite lands in the same `pcol=<value>` dirs for date and
    // string stores alike.
    //
    // The toggle runs on an ISOLATED session (`newSession()`: shared
    // SparkContext, own SQLConf), not the caller's: flipping the
    // session-wide conf for the duration of a distributed job would
    // make any CONCURRENT partitioned-parquet read on the caller's
    // session silently resolve its partition columns as strings — the
    // single-writer contract covers store writes, not unrelated
    // session queries (r15 ADVICE).
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val compactSession = spark.newSession()
    compactSession.conf.set(inferKey, "false")
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(compactSession)
    try
      compactSession.read.parquet(path)
        .filter(col(pcol).isin(crowded.toSeq: _*))
        .write.format("dailystore")
        .option("path", path).option("partitionCol", pcol)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").save()
    finally prevActive match {
      case Some(s) => org.apache.spark.sql.SparkSession.setActiveSession(s)
      case None => org.apache.spark.sql.SparkSession.clearActiveSession()
    }
    crowded.length
  }

  private[sources] def writeManifest(
      fs: org.apache.hadoop.fs.FileSystem, manifest: Path, pcol: String,
      stagingName: String, condemnedDirs: Seq[String],
      files: Seq[(String, String)],
      archiveRel: Option[String] = None,
      seq: Option[Long] = None): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("pcol", pcol)
    root.put("staging", stagingName)
    // retention mode: condemned files go HERE instead of being deleted
    // (replay honors the same field, so a torn commit archives too)
    archiveRel.foreach(root.put("archive", _))
    // commit seq (r18): rides the manifest so crash REPLAY stamps the
    // `_last_commit` sidecar exactly like the live commit path would
    seq.foreach(root.put("seq", _))
    val c = root.putArray("condemned")
    condemnedDirs.foreach(c.add)
    val f = root.putArray("files")
    files.foreach { case (pv, name) =>
      val a = f.addArray(); a.add(pv); a.add(name)
    }
    // write-then-RENAME so the manifest appears atomically: a crash
    // mid-write leaves only a `.tmp` the recovery filter ignores (and
    // sweeps), never a torn `.json` that would poison every later
    // commit()'s recovery preamble
    val tmp = new Path(manifest.getParent, manifest.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(om.writeValueAsBytes(root)) finally out.close()
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(
        s"dailystore: manifest rename failed: $tmp -> $manifest")
  }

  /** Replay every pending manifest under `path` to its committed end
    * state. No-op on a clean store. Manifest `.tmp` leftovers (a crash
    * mid-manifest-write — the commit was still UNDECIDED, nothing had
    * been condemned yet) are swept along with their staging dirs.
    *
    * Lease-aware (r16): recovery runs UNDER the writer lease. When the
    * caller already holds it (commit's recovery preamble passes its own
    * queryId as `heldBy`), the held lease is verified; a standalone
    * invocation ACQUIRES the lease itself — taking over an expired
    * (crashed-writer) lock, self-healing it — and releases it after
    * replay, so it can never race a newly-entering writer's preamble
    * over the same manifest (both would rename the same files). A LIVE
    * foreign lock throws [[DailyStoreConcurrentWriteException]] either
    * way: a mid-window peer's manifest must not be replayed.
    */
  def recoverPendingCommits(path: String,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      heldBy: Option[String] = None,
      ttlMs: Long = WriterLease.DefaultTtlMs): Unit = {
    val live = new Path(path)
    val fs = live.getFileSystem(hadoopConf)
    if (!fs.exists(live)) return
    heldBy match {
      case Some(qid) =>
        WriterLease.assertHeld(fs, live, qid)
        recoverLocked(fs, live)
      case None =>
        val qid = s"recovery-${java.util.UUID.randomUUID()}"
        WriterLease.acquire(fs, live, qid, ttlMs)
        try recoverLocked(fs, live)
        finally WriterLease.release(fs, live, qid)
    }
  }

  private def recoverLocked(fs: org.apache.hadoop.fs.FileSystem,
                            live: Path): Unit = {
    val entries = fs.listStatus(live).filter(!_.isDirectory)
    entries.filter(_.getPath.getName.matches("_commit-.*\\.json\\.tmp"))
      .foreach { t =>
        val qid = t.getPath.getName
          .stripPrefix("_commit-").stripSuffix(".json.tmp")
        fs.delete(new Path(live, s"__stage_$qid"), true)
        fs.delete(t.getPath, false)
      }
    entries.filter(s => s.getPath.getName.startsWith("_commit-") &&
        s.getPath.getName.endsWith(".json"))
      .foreach(m => replay(fs, live, m.getPath))
  }

  /** Move every entry of `dir` NOT named in `keep` into the version
    * archive `rel/<dirName>/`, then drop `dir` if that empties it.
    * Idempotent (an entry already archived under the same name loses
    * its source copy) — replay-safe from any crash point.
    */
  private[sources] def archiveFiles(fs: org.apache.hadoop.fs.FileSystem,
      live: Path, rel: String, dir: Path, keep: Set[String]): Unit = {
    if (!fs.exists(dir)) return
    val target = new Path(live, s"$rel/${dir.getName}")
    var kept = 0
    val entries = fs.listStatus(dir)
    if (entries.exists(e => !keep.contains(e.getPath.getName)))
      fs.mkdirs(target)
    entries.foreach { st =>
      val name = st.getPath.getName
      if (keep.contains(name)) kept += 1
      else {
        val to = new Path(target, name)
        if (fs.exists(to)) fs.delete(st.getPath, st.isDirectory)
        else if (!fs.rename(st.getPath, to))
          throw new java.io.IOException(
            s"dailystore: archive rename failed: ${st.getPath} -> $to")
      }
    }
    if (kept == 0) fs.delete(dir, true)
  }

  private def replay(fs: org.apache.hadoop.fs.FileSystem, live: Path,
                     manifest: Path): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = fs.open(manifest)
    val bytes = try in.readAllBytes() finally in.close()
    val root = try om.readTree(bytes) catch { case _: Exception => null }
    if (root == null || !root.hasNonNull("pcol") ||
        !root.hasNonNull("staging")) {
      // Unparseable manifest: under write-then-rename this can only be
      // a non-atomic-rename filesystem catching the writer INSIDE the
      // rename — and deletes start strictly after the rename returns,
      // so the commit was still undecided. Roll BACK (drop staging +
      // manifest) instead of throwing, which would brick every later
      // write to the store.
      val qid = manifest.getName
        .stripPrefix("_commit-").stripSuffix(".json")
      fs.delete(new Path(live, s"__stage_$qid"), true)
      fs.delete(manifest, false)
      return
    }
    val pcol = root.get("pcol").asText()
    val stagingName = root.get("staging").asText()
    val archiveRel =
      if (root.hasNonNull("archive")) Some(root.get("archive").asText())
      else None
    val files = root.get("files").elements().asScala.map { a =>
      (a.get(0).asText(), a.get(1).asText())
    }.toSeq
    val keepByPv: Map[String, Set[String]] =
      files.groupBy(_._1).map { case (pv, fs0) => pv -> fs0.map(_._2).toSet }
    // 1. finish the deletes: in each condemned dir, anything the
    // manifest does not name is an OLD file. Match commit()'s
    // RECURSIVE partition delete: nested junk goes too, and a
    // condemned dir receiving no renamed files is removed outright
    // rather than left behind empty. Under retention (the manifest's
    // `archive` field), old files MOVE to the version dir instead —
    // the torn commit's archive converges to the same end state.
    root.get("condemned").elements().asScala.foreach { cn =>
      val dirName = cn.asText()
      val dir = new Path(live, dirName)
      val keep = keepByPv.getOrElse(dirName.stripPrefix(s"$pcol="),
        Set.empty[String])
      archiveRel match {
        case Some(rel) => archiveFiles(fs, live, rel, dir, keep)
        case None =>
          if (fs.exists(dir)) {
            if (keep.isEmpty) fs.delete(dir, true)
            else fs.listStatus(dir).foreach { st =>
              if (!keep.contains(st.getPath.getName))
                fs.delete(st.getPath, st.isDirectory)
            }
          }
      }
    }
    // 2. finish the renames: manifest-named files still in staging
    val staging = new Path(live, stagingName)
    files.foreach { case (pv, name) =>
      val from = new Path(new Path(staging, s"$pcol=$pv"), name)
      if (fs.exists(from)) {
        val target = new Path(live, s"$pcol=$pv")
        fs.mkdirs(target)
        val to = new Path(target, name)
        if (fs.exists(to)) fs.delete(from, false) // rename already done
        else if (!fs.rename(from, to))
          throw new java.io.IOException(
            s"dailystore recovery: rename failed: $from -> $to")
      }
    }
    fs.delete(staging, true)
    // stamp the replayed commit's seq before finalizing its manifest —
    // same ordering, same idempotent monotone advance as the live
    // commit path (legacy manifests without a seq skip the stamp)
    if (root.hasNonNull("seq"))
      DailyStoreTimeTravel.recordCommitSeq(fs, live, root.get("seq").asLong())
    archiveRel match {
      case Some(rel) =>
        val adir = new Path(live, rel)
        fs.mkdirs(adir)
        val to = new Path(adir, "manifest.json")
        if (fs.exists(to)) fs.delete(manifest, false)
        else if (!fs.rename(manifest, to))
          throw new java.io.IOException(
            s"dailystore recovery: manifest retention rename failed: $manifest")
      case None => fs.delete(manifest, false)
    }
  }
}

/** (partition value, staged file name) per file this task attempt
  * committed. */
final case class DailyStoreCommit(files: Seq[(String, String)])
  extends WriterCommitMessage

case class DailyStoreWriterFactory(staging: String, schema: StructType,
    pcol: String, pIdx: Int, conf: SerializableConfiguration)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DailyStoreWriter(staging, schema, pcol, pIdx, conf, taskId)
}

/** Task-side hive-layout parquet writer over parquet-hadoop's public
  * Group API. One open writer per partition value seen (under the
  * clustered distribution that is one per task); data files exclude the
  * partition column, hive-style.
  */
class DailyStoreWriter(staging: String, schema: StructType, pcol: String,
    pIdx: Int, conf: SerializableConfiguration, taskId: Long)
  extends DataWriter[InternalRow] {

  private val dataFields: Array[(StructField, Int)] =
    schema.fields.zipWithIndex.filter(_._2 != pIdx)

  private val messageType: MessageType = {
    val b = Types.buildMessage()
    dataFields.foreach { case (f, _) =>
      val opt = Types.optional _
      val prim = f.dataType match {
        case IntegerType => opt(PrimitiveTypeName.INT32)
        case LongType => opt(PrimitiveTypeName.INT64)
        case FloatType => opt(PrimitiveTypeName.FLOAT)
        case DoubleType => opt(PrimitiveTypeName.DOUBLE)
        case BooleanType => opt(PrimitiveTypeName.BOOLEAN)
        case StringType => opt(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case DateType => opt(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampType => opt(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new IllegalArgumentException(
          s"dailystore: unsupported column type $other for ${f.name}")
      }
      b.addField(prim.named(f.name))
    }
    b.named("dailystore")
  }

  private val writers = mutable.Map.empty[String, ParquetWriter[Group]]
  private val files = mutable.Buffer.empty[(String, String, Path)]

  /** Hive-path-safe charset: the value becomes a directory name, and
    * this writer does NOT implement hive escaping — a '/' would nest a
    * directory commit() never looks into (silent row loss) and a '%XX'
    * would be UNescaped by Spark's partition discovery on read. Dates
    * always pass; arbitrary strings must be pre-sanitized by the
    * caller. Rejecting loudly beats either silent corruption.
    */
  private val SafePartitionValue = "[0-9A-Za-z._-]+".r

  private def partitionValue(row: InternalRow): String = {
    require(!row.isNullAt(pIdx),
      s"dailystore: null $pcol partition value")
    val v = schema.fields(pIdx).dataType match {
      case DateType => java.time.LocalDate.ofEpochDay(row.getInt(pIdx).toLong)
        .toString
      case StringType => row.getUTF8String(pIdx).toString
      case other => throw new IllegalArgumentException(
        s"dailystore: partition column must be date or string, got $other")
    }
    if (!SafePartitionValue.matches(v))
      throw new IllegalArgumentException(
        s"dailystore: partition value '$v' contains path-unsafe " +
          "characters (allowed: [0-9A-Za-z._-])")
    v
  }

  override def write(row: InternalRow): Unit = {
    val pv = partitionValue(row)
    val w = writers.getOrElseUpdate(pv, {
      val name = s"part-$taskId-${UUID.randomUUID()}.parquet"
      val file = new Path(s"$staging/$pcol=$pv/$name")
      files += ((pv, name, file))
      ExampleParquetWriter.builder(file)
        .withConf(conf.value).withType(messageType).build()
    })
    val g = new SimpleGroup(messageType)
    var out = 0
    while (out < dataFields.length) {
      val (f, i) = dataFields(out)
      if (!row.isNullAt(i)) f.dataType match {
        case IntegerType | DateType => g.add(out, row.getInt(i))
        case LongType | TimestampType => g.add(out, row.getLong(i))
        case FloatType => g.add(out, row.getFloat(i))
        case DoubleType => g.add(out, row.getDouble(i))
        case BooleanType => g.add(out, row.getBoolean(i))
        case StringType =>
          g.add(out, Binary.fromString(row.getUTF8String(i).toString))
        case _ => () // unreachable: messageType build rejected it
      }
      out += 1
    }
    w.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    DailyStoreCommit(files.toSeq.sortBy(f => (f._1, f._2))
      .map(f => (f._1, f._2)))
  }

  /** Delete THIS attempt's files: BatchWrite.commit only renames files
    * an accepted commit message names, so leftovers would be cleaned
    * with the staging root anyway — but a speculative attempt's files
    * should not linger for the job's lifetime, and a JOB-level abort is
    * not guaranteed to run on task-level failure. */
  override def abort(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Throwable => () })
    val fs = new Path(staging).getFileSystem(conf.value)
    files.foreach { case (_, _, f) =>
      try fs.delete(f, false) catch { case _: Throwable => () }
    }
  }

  override def close(): Unit = ()
}
