package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** S10 analog — run-summary notification hook (reference: cv.py:148-169,
  * cv-api.py:210-231 compose an SMTP mail with "N new cases added" after
  * each batch run).
  *
  * The engine-side half is a [[StreamingQueryListener]]: it accumulates
  * per-query input-row counts across micro-batches and, when a query
  * terminates, hands one formatted summary to `notify` — the transport
  * (SMTP, webhook, pager) is caller-supplied, keeping the side effect
  * outside the engine exactly as SURVEY §2.1 scopes it. Listener events
  * arrive on the driver off the query threads, so a slow transport never
  * back-pressures the stream — the reference's in-line `sendmail` stalls
  * its whole cron run instead.
  */
final class RunSummaryNotifier(notify: String => Unit)
    extends StreamingQueryListener {

  private final case class Acc(name: String, batches: Long, rows: Double)
  private val acc = new ConcurrentHashMap[java.util.UUID, Acc]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    acc.put(e.id, Acc(Option(e.name).getOrElse(e.id.toString), 0L, 0.0))

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    acc.compute(e.progress.id, (_, prev) => {
      val p = if (prev == null)
        Acc(Option(e.progress.name).getOrElse(e.progress.id.toString), 0L, 0.0)
      else prev
      p.copy(batches = p.batches + 1, rows = p.rows + e.progress.numInputRows)
    })

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    val a = acc.remove(e.id)
    val name = if (a != null) a.name else e.id.toString
    val rows = if (a != null) a.rows.toLong else 0L
    val batches = if (a != null) a.batches else 0L
    val status = e.exception.map(ex => s"FAILED: $ex").getOrElse("completed")
    // the reference's mail body shape: what ran, how much, how it ended
    notify(s"run summary [$name]: $rows new rows in $batches batch(es), $status")
  }
}

object RunSummaryNotifier {
  /** Attach a notifier to the session; returns it for later removal. */
  def attach(spark: SparkSession)(notify: String => Unit): RunSummaryNotifier = {
    val l = new RunSummaryNotifier(notify)
    spark.streams.addListener(l)
    l
  }
}
