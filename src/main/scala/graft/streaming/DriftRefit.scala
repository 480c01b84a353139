package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Automated drift→refit loop over a staleness monitor
  * ([[EventStreams.indexDriftStream]] / [[EventStreams.lmDriftStream]] —
  * any `modelDir => DataFrame` factory whose output carries
  * `window_start` and `refit_due` columns).
  *
  * The monitor runs through `foreachBatch`; when a NEW window (strictly
  * newer than anything seen before the last refit) raises `refit_due`,
  * the controller — on its own thread, never the micro-batch thread —
  *   1. calls `refit(activeDir)`, which stages fresh artifacts into a
  *      NEW versioned directory (the live one is never mutated),
  *   2. atomically publishes the new directory (pointer file written via
  *      temp file + ATOMIC_MOVE, plus the controller's volatile field),
  *   3. stops the monitor query and resumes it FROM ITS CHECKPOINT
  *      against the new artifacts — the same restart pattern the
  *      checkpoint-recovery specs pin for the dedup/sketch streams. The
  *      monitor's baseline recomputes from the new model at relaunch, so
  *      post-refit windows read healthy.
  *
  * Scale notes: monitor output is window-grain, so the results buffer and
  * Complete output mode are bounded by wall-clock, not corpus size; the
  * refit cost equals the deterministic batch stage-fit; detection adds one
  * driver-side scan of an already-tiny batch.
  */
final class DriftRefitController(
    spark: SparkSession,
    makeMonitor: String => DataFrame,
    refit: String => String,
    checkpointDir: String,
    pointerFile: Option[Path] = None) {

  private val latest =
    scala.collection.mutable.LinkedHashMap.empty[Timestamp, Row]
  private val resultsLock = new Object
  /** Guards query handle + restart; micro-batch threads never take it. */
  private val restartLock = new Object
  private val refitting = new AtomicBoolean(false)
  private val refitsDone = new AtomicInteger(0)
  /** Windows at or before this mark are history: a Complete-mode batch
    * re-emits them after a restart and they must not re-trigger. */
  private val handledUpTo = new AtomicReference[Timestamp](new Timestamp(0L))
  private val worker = java.util.concurrent.Executors.newSingleThreadExecutor(
    (r: Runnable) => { val t = new Thread(r, "drift-refit"); t.setDaemon(true); t })

  @volatile private var active: String = _
  @volatile private var query: StreamingQuery = _
  @volatile private var lastError: Option[Throwable] = None

  def start(initialDir: String): Unit = restartLock.synchronized {
    require(query == null, "controller already started")
    active = initialDir
    publish(initialDir)
    query = launch()
  }

  private def launch(): StreamingQuery =
    makeMonitor(active).writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect()
        resultsLock.synchronized {
          rows.foreach(r => latest(r.getAs[Timestamp]("window_start")) = r)
        }
        val mark = handledUpTo.get()
        val due = rows.exists(r =>
          r.getAs[Boolean]("refit_due") &&
            r.getAs[Timestamp]("window_start").after(mark))
        if (due && refitting.compareAndSet(false, true)) {
          worker.submit(new Runnable { def run(): Unit = doRefit() })
          ()
        }
      }
      .start()

  private def doRefit(): Unit =
    try restartLock.synchronized {
      // everything emitted so far is history once the model changes
      val mark = resultsLock.synchronized {
        latest.keys.foldLeft(new Timestamp(0L))((a, b) => if (b.after(a)) b else a)
      }
      val newDir = refit(active)
      val old = query
      old.stop()
      old.awaitTermination()
      handledUpTo.set(mark)
      active = newDir
      publish(newDir)
      query = launch()
      refitsDone.incrementAndGet()
      ()
    } catch {
      case t: Throwable => lastError = Some(t)
    } finally refitting.set(false)

  /** Atomic pointer publish: readers of the pointer file always see a
    * complete path — temp file in the same directory + ATOMIC_MOVE. */
  private def publish(dir: String): Unit = pointerFile.foreach { p =>
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempFile(
      Option(p.getParent).getOrElse(Paths.get(".")), ".ptr", ".tmp")
    Files.write(tmp, dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Drain the CURRENT query; a refit may still be scheduled after this
    * returns — pair with [[awaitRefits]] when one is expected. */
  def processAll(): Unit = {
    val q = restartLock.synchronized(query)
    q.processAllAvailable()
    lastError.foreach(t => throw new IllegalStateException("refit failed", t))
  }

  /** Wait until `n` refits completed (true) or the timeout passed. */
  def awaitRefits(n: Int, timeoutMs: Long = 60000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (refitsDone.get() < n && System.nanoTime() < deadline) {
      lastError.foreach(t => throw new IllegalStateException("refit failed", t))
      Thread.sleep(50)
    }
    refitsDone.get() >= n
  }

  def refitCount: Int = refitsDone.get()
  def activeDir: String = active

  /** Latest emitted row per window, ordered by window start. */
  def results(): Seq[Row] = resultsLock.synchronized {
    latest.toSeq.sortBy(_._1.getTime).map(_._2)
  }

  def stop(): Unit = {
    restartLock.synchronized(Option(query).foreach(_.stop()))
    worker.shutdown()
  }
}
