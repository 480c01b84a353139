package graft
import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the driver contract). */
object XTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(',').toSeq else Seq("p02_dedup_ngram_jaccard")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      println(s"XTIME $n ${(System.nanoTime() - t0) / 1e9} s rows=$rows")
    }
    spark.stop()
  }
}
