package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.forMain(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // VERIFY_PASSES=N (default 1) runs the whole surface N times in ONE
    // session — the block-manager leak regression harness (r14 VERDICT
    // "Next round" #6): after each pass the persistent-RDD count and
    // block-manager memory must return to the pass-1 baseline, proving
    // no entry leaks storage per execution (the p90b class of r13).
    // Run it under checkpointMode=reliable/stage: `local` mode's
    // fire-and-forget fronts pin blocks for the session BY CONTRACT.
    val passes = sys.env.get("VERIFY_PASSES")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(1)
    var baseline: Option[(Int, Long)] = None
    for (pass <- 1 to passes) {
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
      if (passes > 1) {
        // let the ContextCleaner drain async unpersists/broadcast cleanup
        // before snapshotting, so the numbers measure leaks, not lag
        System.gc(); Thread.sleep(3000)
        val rdds = spark.sparkContext.getPersistentRDDs.size
        val usedMB = spark.sparkContext.getExecutorMemoryStatus.values
          .map { case (tot, free) => tot - free }.sum >> 20
        println(s"""{"leakcheck":{"pass":$pass,"persistentRdds":$rdds,"blockMemUsedMB":$usedMB}}""")
        baseline match {
          case None => baseline = Some((rdds, usedMB))
          case Some((r0, m0)) =>
            if (rdds > r0 || usedMB > m0 + 64) {
              System.err.println(s"[verify] LEAK: pass $pass holds " +
                s"$rdds persistent RDDs / ${usedMB} MB vs baseline " +
                s"$r0 / ${m0} MB")
              spark.stop()
              sys.exit(1)
            }
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
