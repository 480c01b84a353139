package graft.emulator

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.stage.StageManager

/** Degenerate-corpus robustness sweep over the whole pipeline TABLE()
  * surface (r14 VERDICT "Next round" #3): EVERY pipeline entry is executed
  * at the wire — `SELECT * FROM TABLE(PIPELINE('<entry>', '<dir>'))`, the
  * same path a client's SQL takes — against an EMPTY corpus and a ONE-DOC
  * corpus, asserting the outcome is always either a clean result (possibly
  * zero rows) or a deliberate SnowflakeError with a human-readable
  * message. What must never reach the wire: an NPE, a MatchError, a
  * `.head`/`next on empty iterator`, a Spark task-failure dump, or any
  * other internal-exception text — `SnowflakeError.fromThrowable` wraps
  * every Throwable, so without this sweep an unguarded `.collect()(0)`
  * surfaces as `[001007] null`.
  *
  * The corpora are real sf0.001 rows (schema-faithful, including the
  * events `ts` physical type) truncated to 0 and 1 rows, so every staged
  * intermediate (shingles, pairs, PQ codebooks, segment tables, …) is
  * exercised in its degenerate form too.
  */
class TinyCorpusSweepSpec extends AnyFunSuite {

  private lazy val spark = graft.GraftSession.local(4)
  private lazy val executor = {
    val catalog = new Catalog(spark)
    catalog.createDatabase("SWEEP_DB")
    new Executor(catalog,
      new StageManager(Files.createTempDirectory("graft_sweep_stages")),
      new WarehouseManager(), new QueryHistory())
  }
  private def ctx = Executor.Context("sweep_sess", "SWEEP_DB", "PUBLIC")

  private val srcDir = "/root/testdata/sf0.001"

  /** Write documents/embeddings/events truncated to `n` rows (ordered by
    * key for determinism) under a fresh temp dir shaped like a testdata
    * SF dir. */
  private def corpus(n: Int): String = {
    val d = Files.createTempDirectory(s"graft_sweep_sf_$n").toString
    Seq("documents" -> "doc_id", "embeddings" -> "vec_id",
        "events" -> "event_id").foreach { case (t, key) =>
      val full = spark.read.parquet(s"$srcDir/$t.parquet")
      full.orderBy(key).limit(n)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  private lazy val emptyDir = corpus(0)
  private lazy val oneDir = corpus(1)

  /** Exception text that means an INTERNAL error leaked to the wire
    * instead of a deliberate refusal. */
  private val internalMarkers = Seq(
    "NullPointerException", "Cannot invoke", "MatchError",
    "NoSuchElementException", "head of empty", "next on empty",
    "ArrayIndexOutOfBounds", "IndexOutOfBounds", "key not found",
    "Job aborted", "INTERNAL_ERROR", "SparkException",
    "UnsupportedOperationException", "ClassCastException")

  private def checkClean(entry: String, label: String, dir: String): Unit =
    try {
      val r = executor.execute(ctx,
        s"SELECT * FROM TABLE(PIPELINE('$entry', '$dir'))", Map.empty)
      assert(r.rows != null) // any row count is fine; reaching here = clean
    } catch {
      case e: SnowflakeError =>
        val m = Option(e.getMessage).getOrElse("")
        assert(m.trim.nonEmpty && m.trim != s"[${e.code}] null",
          s"$entry/$label: blank error at the wire")
        internalMarkers.foreach { bad =>
          assert(!m.contains(bad),
            s"$entry/$label: internal error leaked to the wire: $m")
        }
    }

  private val entries: Seq[String] =
    graft.SparkEntry.queries.keys.filter(_.startsWith("p")).toSeq.sorted

  entries.foreach { entry =>
    test(s"sweep $entry: empty + one-doc corpus clean at the wire") {
      checkClean(entry, "empty", emptyDir)
      checkClean(entry, "one-doc", oneDir)
    }
  }

  test("conformalThreshold refuses an empty calibration split cleanly") {
    // not reachable from any QDef (only the streaming gate calls it), so
    // the wire sweep can't cover it: the empty-corpus NPE class of r14
    // VERDICT "What's wrong" #1 is pinned directly here
    val e = intercept[IllegalStateException] {
      graft.queries.Pipeline.conformalThreshold(spark, emptyDir)
    }
    assert(e.getMessage.contains("calibration split is empty"))
    // the streaming gate wraps the same fit: same clean refusal
    val e2 = intercept[IllegalStateException] {
      graft.streaming.EventStreams.conformalGateStream(spark, emptyDir,
        spark.read.parquet(s"$oneDir/documents.parquet"))
    }
    assert(e2.getMessage.contains("calibration split is empty"))
  }

  test("conformalThreshold on a one-doc corpus fits or refuses cleanly") {
    // md5 of the single doc_id decides which half the doc lands in: a
    // calibration doc yields a real threshold, a test doc yields the
    // clean refusal — never an NPE
    try {
      val thr = graft.queries.Pipeline.conformalThreshold(spark, oneDir)
      assert(thr >= 0 && thr <= 1023)
    } catch {
      case e: IllegalStateException =>
        assert(e.getMessage.contains("calibration split is empty"))
    }
  }

  test("sweep BM25_SEARCH: empty + one-doc corpus clean at the wire") {
    Seq("empty" -> emptyDir, "one-doc" -> oneDir).foreach { case (label, dir) =>
      try {
        val r = executor.execute(ctx,
          s"SELECT * FROM TABLE(BM25_SEARCH('alpha beta', '$dir'))", Map.empty)
        assert(r.rows != null)
      } catch {
        case e: SnowflakeError =>
          val m = Option(e.getMessage).getOrElse("")
          assert(m.trim.nonEmpty, s"BM25/$label: blank error")
          internalMarkers.foreach(bad => assert(!m.contains(bad),
            s"BM25/$label: internal error leaked: $m"))
      }
    }
  }
}
