package graft
import org.apache.spark.sql.SparkSession

/** Throwaway plan-dump main (not part of the driver contract). */
object XPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args(1).split(',').toSeq else Seq.empty
    // 3rd arg "exec": run the query first and print the AQE FINAL plan
    // (ReusedExchange/AQEShuffleRead only exist post-execution)
    val exec = args.length > 2 && args(2) == "exec"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // collect(), not a noop write: the write builds its OWN
      // QueryExecution, leaving df.queryExecution un-executed (its AQE
      // plan would still print isFinalPlan=false). Only use exec mode on
      // small-output queries.
      if (exec) { df.collect(); () }
      println(s"XPLAN ===== $n =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.map("XPLAN " + _).mkString("\n"))
    }
    spark.stop()
  }
}
