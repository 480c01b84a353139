ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "snowflakeemulatorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Run suites CONCURRENTLY inside each forked test JVM: the main
// group's suites share one SparkSession (SharedSpark) and Spark
// schedules concurrent queries fine. The suites that mutate
// LOAD-BEARING process globals — the staging-dir redirect
// (KMeansCellsSpec, ShingleStageSpec), valid dial overrides
// (KMeansCellsSpec), and session-wide block/result-cap accounting
// (SessionStateSpec) — are quarantined below into their own JVMs so
// the parallelism cannot race them. The remaining sys.props writers
// (DialGuardSpec garbage values, LexRankCheckpointSpec) set values
// that are result-neutral by construction. Wall: 9m22s sequential ->
// ~5m with concurrent suites + parallel groups.
Test / testForkedParallel := true
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val isolated = Map(
    "graft.KMeansCellsSpec" -> "knobs",
    "graft.ShingleStageSpec" -> "staging",
    "graft.SessionStateSpec" -> "session",
    // flips graft.checkpointMode and asserts on the session-global
    // persistent-RDD set — must not share a JVM with anything
    "graft.MaterializeSpec" -> "mat",
    // graft.sketchAgreement=off CHANGES VALUES of the agreement entries
    "graft.SketchAgreementSpec" -> "sketchdial",
    // redirects graft.shingleStageDir + flips fit dials + deletes its
    // staging root mid-run — in the main group this raced sibling suites
    // into staging under a root it then deleted (r16: 8 failures across
    // 4 suites, FILE_NOT_EXIST on dial_audit_stage* paths)
    "graft.DialCacheAuditSpec" -> "dialaudit",
    // sets a VALID non-default graft.evalQueries + staging-root redirect
    "graft.EvalSampleSpec" -> "evalsample")
  val (iso, main) = (Test / definedTests).value
    .partition(t => isolated.contains(t.name))
  Tests.Group("main", main, Tests.SubProcess(opts)) +:
    iso.groupBy(t => isolated(t.name)).toSeq.map { case (g, ts) =>
      Tests.Group(g, ts, Tests.SubProcess(opts))
    }
}
// sbt's default restrictions serialize forked test groups; allow the
// quarantined groups to run alongside the main one.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, 4))
run / fork := true
// Forked run's default LoggedOutput prefixes every program line with
// "[info] ", which makes the bench's machine-readable JSON lines
// unparseable to a line-oriented consumer (json.loads fails on
// '[info] {...}'). StdoutOutput passes the child's stdout through
// verbatim so the bench summary is a bare JSON line.
run / outputStrategy := Some(StdoutOutput)
// Drop sbt's trailing "[success] Total time: ..." so the LAST stdout
// line of `sbt run` is the program's own last line (the bench summary).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Catalyst generates one class set per (plan, exprIds); a long session
  // (65+ bench queries, iterative loops) accumulates thousands of JIT'd
  // generated classes. With the default 240m reserved code cache the JIT
  // intermittently disables itself ("CodeCache is full") and hot task
  // code runs INTERPRETED — observed as a bimodal bench where the same
  // 418-task query burns 8x the CPU with 30x the GC. Reserve enough that
  // flushing never races compilation.
  "-XX:ReservedCodeCacheSize=512m",
)
// Extra -D dials for a forked run/test JVM without editing this file:
// GRAFT_JAVA_OPTS="-Dgraft.checkpointMode=stage" sbt "runMain graft.Verify …"
javaOptions ++= sys.env.get("GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
// Tests default to the DURABLE checkpoint mode: localCheckpoint blocks
// are executor-lifetime and non-replicated, and the parallel suite
// load is exactly the pressure that evicted them in r13
// (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND in AuditFamilySpec p85). The
// library default stays `local` (single-tenant bench speed);
// MaterializeSpec pins all three modes bit-equal. A mode set via
// GRAFT_JAVA_OPTS wins — the default is only appended when the env
// didn't choose one (the JVM takes the LAST duplicate -D, so
// unconditionally appending here would silently override the env).
Test / javaOptions ++= (
  if (sys.env.get("GRAFT_JAVA_OPTS").exists(_.contains("-Dgraft.checkpointMode=")))
    Seq.empty
  else Seq("-Dgraft.checkpointMode=reliable"))
