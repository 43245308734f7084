package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL time travel for dailystore tables:
  *
  *   SELECT * FROM dstore.cases VERSION AS OF 3          -- commit seq
  *   SELECT * FROM dstore.cases TIMESTAMP AS OF '...'    -- commit time
  *
  * resolved through [[DailyStoreCatalog.loadTable]]'s version overloads
  * into this READ-ONLY table, whose scan delegates to the proven
  * [[DailyStoreTimeTravel.readVersion]] reconstruction (manifest set
  * algebra over live + archived files) through Spark's `V1Scan` bridge:
  * `toV1TableScan` hands back a relation whose `buildScan()` is the
  * reconstruction DataFrame's own RDD. That keeps ONE implementation of
  * the rollback semantics — the SQL front cannot drift from the Scala
  * API, and every reconstruction invariant the property specs pin
  * (crash-torn replay, truncate-to-empty, restore-of-restore) holds
  * verbatim here.
  *
  * Why V1Scan instead of a hand-rolled DSv2 Batch: the version's file
  * set mixes live `pcol=` dirs with archived per-version dirs, so the
  * parquet `FileTable` delegation the LIVE table rides (one root, dir
  *-derived partition values) cannot serve it, and a from-scratch
  * `PartitionReaderFactory` would duplicate Spark's parquet machinery
  * for a read path whose volume is one rollback, not a steady-state
  * scan. The V1 bridge is the supported seam for exactly this shape;
  * JDBC-style sources ship on it.
  *
  * Pushdown still works — INSIDE the inner plan: pruned columns become
  * a `select` and pushed filters become `Column` predicates on the
  * reconstruction frame, so a `WHERE d = ...` reaches the untouched-day
  * parquet scans as a partition filter and the per-day archive frames
  * as ordinary data filters (PLANS-style audit in the spec). Filters
  * this translator does not cover are reported back as post-scan
  * filters and Spark evaluates them above the scan — never dropped.
  *
  * VERSION AS OF takes the ABSOLUTE commit `seq` from
  * [[DailyStoreTimeTravel.history]] (Delta's convention: version N =
  * the state AFTER commit N); TIMESTAMP AS OF takes any timestamp at or
  * after a retained commit and resolves to the newest state whose
  * commit time is <= it. Both fail loudly when the request predates
  * retained history or lands in a pruned gap.
  */
object DailyStoreVersionRead {

  /** Fail loudly when the `_last_commit` sidecar records a commit NEWER
    * than the newest retained version dir: a commit ran with retention
    * OFF after the newest version, left no manifest to roll back
    * through, and every reconstruction walking from the CURRENT live
    * state would silently include it — the blind spot the r17 scaladoc
    * documented, closed by the sidecar every commit now stamps.
    * `lastCommit = None` (a store whose commits all predate the
    * sidecar) keeps the dirs-only contract.
    */
  private[sources] def assertNoHeadGap(
      lastCommit: Option[Long],
      vs: Seq[DailyStoreTimeTravel.StoreVersion], path: String): Unit =
    lastCommit.foreach { last =>
      val head = vs.headOption.map(_.seq).getOrElse(0L)
      require(last <= head,
        s"dailystore: commit seq $last at $path ran with retention OFF " +
          s"after the newest retained version ($head) — historical states " +
          "cannot be reconstructed across an untracked commit. Re-enable " +
          "retention (DailyStoreTimeTravel.enable) and keep it on; only " +
          "states at or after the untracked commit will become " +
          "time-travelable again")
    }

  /** Map an absolute commit seq to `versionsBack`, validating that the
    * walk from the newest retained commit down to `seq` is gap-free
    * (prune keeps the NEWEST `keep`, so retained seqs are consecutive
    * from the head unless retention was toggled mid-life).
    */
  private[sources] def versionsBackFor(
      vs: Seq[DailyStoreTimeTravel.StoreVersion], seq: Long,
      path: String, lastCommit: Option[Long] = None): Int = {
    // nonEmpty FIRST: a store with a sidecar but zero retained versions
    // should get the actionable "enable retention" error, not a head-gap
    // message about a phantom version 0 (r18 ADVICE)
    require(vs.nonEmpty,
      s"dailystore: $path retains no versions — enable retention " +
        "(DailyStoreTimeTravel.enable) before time-travel reads")
    assertNoHeadGap(lastCommit, vs, path)
    val maxSeq = vs.head.seq
    require(seq <= maxSeq,
      s"dailystore: VERSION AS OF $seq is in the future for $path " +
        s"(newest committed version is $maxSeq)")
    // compare in LONG space before narrowing: a seq 2^32 below maxSeq
    // would wrap the Int to a small k and silently pass every check
    require(maxSeq - seq <= vs.size,
      s"dailystore: VERSION AS OF $seq predates retained history at " +
        s"$path (oldest reconstructable state is version ${maxSeq - vs.size})")
    val k = (maxSeq - seq).toInt
    val walked = vs.take(k).map(_.seq)
    val expected = (0 until k).map(maxSeq - _)
    require(walked == expected,
      s"dailystore: retained versions at $path have a gap " +
        s"(have ${walked.mkString(",")}, need ${expected.mkString(",")}) — " +
        "version dirs were pruned or removed out of order")
    k
  }

  /** TIMESTAMP AS OF: newest state whose commit time <= `microsSinceEpoch`
    * (commit time = the version dir's mtime, the [[DailyStoreTimeTravel
    * .history]] column). The CURRENT state's commit time is the newest
    * retained version's, so any later timestamp resolves to 0 back.
    *
    * Granularity caveat: commit times carry the filesystem's mtime
    * resolution (1 s on many local filesystems — the DelegateCache
    * coarse-mtime caveat). Two commits landing in one tick are
    * indistinguishable by timestamp, and a request at that tick
    * resolves to the NEWEST of the tie; sub-tick rollback points need
    * `VERSION AS OF` with the explicit seq from `history()`. Non-tie
    * mtime INVERSIONS (commit times not monotone in seq) fail loudly
    * below instead of resolving to a wrong adjacent version.
    */
  private[sources] def versionsBackForTimestamp(
      vs: Seq[DailyStoreTimeTravel.StoreVersion],
      fs: org.apache.hadoop.fs.FileSystem, microsSinceEpoch: Long,
      path: String, lastCommit: Option[Long] = None): Int = {
    // same ordering rationale as versionsBackFor: nonEmpty first
    require(vs.nonEmpty,
      s"dailystore: $path retains no versions — enable retention " +
        "(DailyStoreTimeTravel.enable) before time-travel reads")
    assertNoHeadGap(lastCommit, vs, path)
    val tsMs = microsSinceEpoch / 1000L
    // newest first; versionsBack = how many retained commits are STRICTLY
    // newer than the requested instant. Commit time is the version dir's
    // mtime — on coarse-mtime filesystems (1s ticks, the DelegateCache
    // caveat) two commits can share a tick, so the count-of-newer is only
    // a prefix of the seq walk if mtime order agrees with seq order WITH
    // TIES BROKEN BY SEQ; verify that instead of assuming it, because an
    // mtime INVERSION (a later commit with a smaller mtime — clock step,
    // or a version dir touched after the fact) would silently resolve to
    // the wrong adjacent version. Equal-mtime ties are fine: both sides
    // of a tie compare identically against the instant.
    val stamped = vs.map(v =>
      (v.seq, fs.getFileStatus(v.dir).getModificationTime))
    val bySeqDesc = stamped.map(_._2)
    require(bySeqDesc == bySeqDesc.sorted(Ordering[Long].reverse),
      s"dailystore: version commit times at $path are not monotone in " +
        s"commit seq (${stamped.map { case (s, m) => s"v$s@$m" }
          .mkString(", ")}) — TIMESTAMP AS OF cannot order the history; " +
        "use VERSION AS OF with an explicit seq")
    val newer = stamped.count(_._2 > tsMs)
    require(newer < vs.size,
      s"dailystore: TIMESTAMP AS OF ${new java.sql.Timestamp(tsMs)} " +
        s"predates the oldest retained commit at $path")
    // the walk back must be gap-free INCLUDING the boundary version
    // (the newest one at-or-before the instant): a commit made while
    // retention was OFF leaves no version dir, so counting dirs newer
    // than the instant would silently skip it and resolve to a state
    // that includes a LATER commit than requested. Requiring
    // vs(newer).seq consecutive with the walked dirs catches exactly
    // that boundary gap. (A retention-off commit AFTER the newest dir
    // leaves no dir either — that head gap is caught by assertNoHeadGap
    // above via the `_last_commit` sidecar, r18.)
    val walked = vs.take(newer + 1).map(_.seq)
    val expected = (0 to newer).map(vs.head.seq - _)
    require(walked == expected,
      s"dailystore: retained versions at $path have a gap across the " +
        s"requested instant (have ${walked.mkString(",")}, need " +
        s"${expected.mkString(",")}) — a commit ran with retention off, " +
        "or version dirs were removed out of order")
    newer
  }

  /** Best-effort `sources.Filter` → `Column` translation for the atoms
    * Catalyst actually pushes at scans. `None` = not translatable: the
    * filter is returned to Spark as a post-scan filter, never assumed.
    */
  private[sources] def toColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toSeq.map(lit(_)): _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case sources.Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case sources.Not(c) => toColumn(c).map(not)
    case _ => None
  }
}

/** The read-only table `loadTable(ident, version)` serves (class doc of
  * [[DailyStoreVersionRead]]).
  */
class DailyStoreVersionTable(path: String, pcol: String,
                             schema0: StructType, versionsBack: Int)
  extends Table with SupportsRead {

  override def name(): String = s"dailystore($path)@-$versionsBack"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DailyStoreVersionScanBuilder(path, pcol, schema0, versionsBack)
}

class DailyStoreVersionScanBuilder(path: String, pcol: String,
                                   schema0: StructType, versionsBack: Int)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = schema0
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (ok, rest) = filters.partition(f =>
      DailyStoreVersionRead.toColumn(f).isDefined)
    pushed = ok
    rest // Spark evaluates what the translator does not cover
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan =
    new DailyStoreVersionScan(path, pcol, versionsBack, required, pushed)
}

class DailyStoreVersionScan(path: String, pcol: String, versionsBack: Int,
                            required: StructType,
                            pushed: Array[sources.Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String =
    s"DailyStoreVersionScan(path=$path, versionsBack=$versionsBack, " +
      s"pushed=[${pushed.mkString(", ")}])"

  override def toV1TableScan[T <: sources.BaseRelation with sources.TableScan](
      context: SQLContext): T =
    new sources.BaseRelation with sources.TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def buildScan(): RDD[Row] = {
        var df = DailyStoreTimeTravel.readVersion(
          context.sparkSession, path, versionsBack, pcol)
        pushed.flatMap(DailyStoreVersionRead.toColumn)
          .foreach(p => df = df.filter(p))
        df.select(required.fieldNames.toSeq.map(col): _*).rdd
      }
    }.asInstanceOf[T]
}
