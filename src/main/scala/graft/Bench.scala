package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the OS page cache over every input file so per-query numbers
    // measure compute, not whatever the previous process evicted —
    // observed 53s vs 74s totals for the same jar depending on what ran
    // before. Sequential byte read, no parsing, not part of any timing.
    Tables.all.foreach { t =>
      val dir = new java.io.File(s"$sfDir/$t.parquet")
      val files = if (dir.isDirectory) dir.listFiles().toSeq else Seq(dir)
      val buf = new Array[Byte](1 << 20)
      files.filter(_.isFile).foreach { f =>
        val in = new java.io.FileInputStream(f)
        try { while (in.read(buf) >= 0) () } finally in.close()
      }
    }
    // Warm the JVM/codegen path once so per-query numbers measure the
    // engine, not first-query classloading.
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => () })
    // The shared shingle front (p02/p03/p20/p21) stages once per JVM;
    // time it as its OWN entry (sorts first as p00_*) so the first
    // consumer's number is self-contained and per-query timings stay
    // comparable across rounds instead of order-dependent.
    val stageT0 = System.nanoTime()
    val stageErr = try { queries.Pipeline.ShingleStage.load(spark, sfDir); None: Option[String] }
      catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}") }
    val stageEntry = ("p00_shingle_stage", (System.nanoTime() - stageT0) / 1e9, 0L, stageErr)
    // Optional comma-separated allowlist (SPARK_GRAFT_ONLY=p05,p20) for
    // profiling individual queries / interaction effects; production runs
    // leave it unset and time everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = stageEntry +: selected.map { case (name, fn) =>
      // Isolation between timed queries, regardless of heap state:
      // drop every block a predecessor pinned (cached tables, persisted
      // or locally-checkpointed RDDs left behind by iterative queries),
      // blocking so the release completes before the clock starts, then
      // let GC trigger the ContextCleaner for shuffle files/broadcasts.
      // Without this a heavy-persist predecessor taxes its successors
      // (observed 152s -> 5.7s on a heavy-shuffle successor).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      // A failed query must be distinguishable from a slow success: record
      // the error alongside the wall time instead of swallowing it (r4's
      // one broadcast-timeout failure was recorded as a plausible 300 s
      // timing and only forensics on the exact value exposed it).
      val (rows, err) = try { (fn(spark, sfDir).count(), None: Option[String]) }
        catch { case e: Throwable =>
          (-1L, Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")) }
      (name, (System.nanoTime() - t0) / 1e9, rows, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val details = results.map { case (k, v, rows, err) =>
      "\"" + k + "\":{\"sec\":" + v + ",\"rows\":" + rows +
        ",\"err\":" + err.map(jstr).getOrElse("null") + "}"
    }.mkString("{", ",", "}")
    val nErr = results.count(_._4.isDefined)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"details":$details,"errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
