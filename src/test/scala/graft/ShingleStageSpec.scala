package graft

/** The staged shingle front honors `-Dgraft.shingleStageDir`, the hook a
  * production deployment uses to point staging at a shared filesystem /
  * object store instead of a node-local temp dir.
  */
class ShingleStageSpec extends SparkSpecBase {

  test("explicit graft.shingleStageDir receives the staged parquet") {
    val dir = java.nio.file.Files.createTempDirectory("shingle_override")
    sys.props("graft.shingleStageDir") = dir.toString
    try {
      val df = queries.Pipeline.ShingleStage.load(spark, sf0001)
      assert(df.columns.toSet == Set("doc_id", "h", "df"))
      assert(df.count() > 0)
      val staged = dir.toFile.listFiles()
      assert(staged != null && staged.exists(_.getName.startsWith("sh_")),
        s"no staged table under $dir: ${Option(staged).map(_.toSeq)}")
    } finally {
      sys.props -= "graft.shingleStageDir"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  test("explicit staging dir is reused across JVMs, not rebuilt") {
    val dir = java.nio.file.Files.createTempDirectory("shingle_reuse")
    sys.props("graft.shingleStageDir") = dir.toString
    try {
      queries.Pipeline.ShingleStage.load(spark, sf0001).count()
      val staged = dir.toFile.listFiles().filter(_.getName.startsWith("sh_"))
      assert(staged.nonEmpty)
      val before = staged.head.listFiles().map(f => f.getName -> f.lastModified()).toMap
      // a fresh JVM has an empty staging map but sees the committed table
      queries.Pipeline.ShingleStage.resetForTest()
      queries.Pipeline.ShingleStage.load(spark, sf0001).count()
      val after = staged.head.listFiles().map(f => f.getName -> f.lastModified()).toMap
      assert(after == before, "staged table was rebuilt instead of reused")
    } finally {
      queries.Pipeline.ShingleStage.resetForTest()
      sys.props -= "graft.shingleStageDir"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }
}
