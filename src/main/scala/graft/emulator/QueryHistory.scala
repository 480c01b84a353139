package graft.emulator

import java.util.concurrent.ConcurrentLinkedDeque
import scala.jdk.CollectionConverters._

/** Append-only query history (reference `_metadata_query_history`,
  * `pkg/metadata/repository.go:87-99,1213-1313`): one start record per
  * statement, completed with status/rows/elapsed on success or failure.
  * In-memory ring capped at `capacity` — the reference's table grows
  * unboundedly; a cap is the scale-sane default.
  */
final class QueryHistory(capacity: Int = 10000) {

  final case class Record(
      queryId: String,
      sqlText: String,
      status: String, // RUNNING | SUCCESS | FAILED
      rows: Long,
      elapsedMs: Long,
      errorMessage: String,
      startedAt: Long)

  private val records = new ConcurrentLinkedDeque[Record]()

  def start(queryId: String, sql: String): Long = {
    push(Record(queryId, sql, "RUNNING", 0, 0, "", System.currentTimeMillis()))
    System.nanoTime()
  }

  def success(queryId: String, sql: String, rows: Long, t0Nanos: Long): Unit =
    complete(queryId, "SUCCESS", rows, t0Nanos, "")

  def failure(queryId: String, sql: String, err: String, t0Nanos: Long): Unit =
    complete(queryId, "FAILED", 0, t0Nanos, err)

  private def complete(queryId: String, status: String, rows: Long,
      t0Nanos: Long, err: String): Unit = {
    val elapsed = (System.nanoTime() - t0Nanos) / 1000000L
    records.asScala.find(_.queryId == queryId) match {
      case Some(r) =>
        records.remove(r)
        push(r.copy(status = status, rows = rows, elapsedMs = elapsed,
          errorMessage = err))
      case None => ()
    }
  }

  private def push(r: Record): Unit = {
    records.addFirst(r)
    while (records.size > capacity) records.pollLast()
  }

  /** Most-recent-first (reference `ORDER BY started_at DESC LIMIT ?`,
    * `repository.go:1268-1272`). */
  def recent(limit: Int = 100): Seq[Record] =
    records.asScala.take(limit).toSeq
}
