package graft.server

/** Standalone emulator entry point: starts the HTTP server on
  * GRAFT_PORT (default 8085) against a local Spark session, the
  * counterpart of the reference's `cmd/server/main.go`. */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("GRAFT_PORT", "8085").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val server = EmulatorServer(graft.GraftSession.local(cpus), port)
    server.start()
    println(s"graft emulator listening on 127.0.0.1:${server.actualPort}")
    Thread.currentThread().join()
  }
}
