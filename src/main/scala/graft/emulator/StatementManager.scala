package graft.emulator

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Async statement-handle store (reference
  * `pkg/query/statement_manager.go:16-207`): handles are `"01" + 32 hex`
  * (`:204-207`), lifecycle pending -> running -> success/failed/canceled,
  * completed handles GC'd after a TTL (`:181-201`), cancel fires a stored
  * cancel action (`:136-171`) — here `SparkContext.cancelJobGroup`, which is
  * strictly stronger than the reference's gosnowflake abort stub
  * (`server/handlers/query.go:149-165`).
  */
final class StatementManager(resultTtlMillis: Long = 3600L * 1000) {

  sealed trait Status { def name: String }
  case object Pending extends Status { val name = "pending" }
  case object Running extends Status { val name = "running" }
  case object Success extends Status { val name = "success" }
  case object Failed extends Status { val name = "failed" }
  case object Canceled extends Status { val name = "canceled" }

  final class Statement(
      val handle: String,
      val sql: String,
      @volatile var status: Status,
      @volatile var result: Option[Executor.Result] = None,
      @volatile var error: Option[SnowflakeError] = None,
      @volatile var completedAt: Long = 0L,
      @volatile var cancelAction: Option[() => Unit] = None)

  private val statements = new ConcurrentHashMap[String, Statement]()

  def newHandle(): String =
    "01" + UUID.randomUUID().toString.replace("-", "")

  def create(sql: String): Statement = {
    gc()
    val st = new Statement(newHandle(), sql, Pending)
    statements.put(st.handle, st)
    st
  }

  def get(handle: String): Option[Statement] = Option(statements.get(handle))

  def markRunning(st: Statement, cancel: () => Unit): Unit = {
    st.status = Running
    st.cancelAction = Some(cancel)
  }

  def complete(st: Statement, result: Executor.Result): Unit = {
    st.result = Some(result)
    st.status = Success
    st.completedAt = System.currentTimeMillis()
    st.cancelAction = None
  }

  def fail(st: Statement, err: SnowflakeError): Unit = {
    st.error = Some(err)
    st.status = Failed
    st.completedAt = System.currentTimeMillis()
    st.cancelAction = None
  }

  /** Cancel a running statement; true if a cancel action fired. */
  def cancel(handle: String): Boolean =
    get(handle).exists { st =>
      st.status match {
        case Running | Pending =>
          st.cancelAction.foreach(f => f())
          st.status = Canceled
          st.completedAt = System.currentTimeMillis()
          true
        case _ => false
      }
    }

  /** Drop completed statements older than the TTL (reference `:181-201`
    * runs this on a goroutine; here it piggybacks on create). */
  def gc(): Unit = {
    val cutoff = System.currentTimeMillis() - resultTtlMillis
    statements.values.asScala
      .filter(s => s.completedAt > 0 && s.completedAt < cutoff)
      .foreach(s => statements.remove(s.handle))
  }

  def count: Int = statements.size
}
