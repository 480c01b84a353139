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
}
