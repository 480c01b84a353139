package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet testdata
  * (see TESTDATA.md). Each table is one parquet file under the
  * scale-factor directory.
  *
  * At 100 TB each of these would be a partitioned parquet dataset; the
  * reader path is identical (`spark.read.parquet(dir)`), so nothing here
  * assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale. */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Loaded-frame cache (r17): the input dirs are immutable for the life
    * of a run (UPDATE/DELETE are pure copy-on-write transformations, the
    * emulator catalog manages its own dirs), yet every query re-ran
    * schema inference — a serial driver footer read per table per query.
    * One DataFrame per (session, dir, table); Spark plans are immutable,
    * so reuse is free. Keyed by session so test sessions never share.
    *
    * WEAKLY keyed by session (r18, ADVICE): a long-lived server churning
    * sessions would otherwise pin every dead session's plans forever —
    * the per-session map is dropped when the session itself becomes
    * unreachable. The inner (dir, table) keys assume IMMUTABLE dirs
    * (regenerating a corpus dir in-place within one JVM would serve the
    * old schema); that assumption is shared with every staged artifact
    * and the dir-keyed count memos in Pipeline. */
  private val frameCache = new java.util.WeakHashMap[
    SparkSession,
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  private def sessionFrames(spark: SparkSession) = frameCache.synchronized {
    var m = frameCache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
      frameCache.put(spark, m)
    }
    m
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    sessionFrames(spark).computeIfAbsent((sfDir, name), _ => {
      // events.ts has shipped as two physical types across testdata
      // generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
      // rejects — read nanos as long and rebuild; `div` integer division is
      // required: float division loses precision above 2^53 ns) and plain
      // TIMESTAMP(MICROS) isAdjustedToUTC=false (reads as TIMESTAMP_NTZ —
      // cast to session-time timestamp; the session is pinned to UTC so the
      // wall-clock values are the same instants either way). Dispatch on the
      // observed schema so both generations load identically.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events") {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.{LongType, TimestampNTZType}
        df.schema("ts").dataType match {
          case LongType =>
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case TimestampNTZType =>
            df.withColumn("ts", col("ts").cast("timestamp"))
          case _ => df
        }
      } else df
    })

  // weakly keyed like frameCache (r18): dead sessions must be collectable
  private val registeredDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table as a temp view named after the table, so
    * `spark.sql` text matches the DuckDB oracle SQL verbatim. Registration
    * is skipped when this session already has views for this sfDir: each
    * `load` reads parquet footers for schema inference, so re-registering
    * ten tables on every SQL-text query costs ~2 s of pure metadata I/O.
    * Switching a session to a different sfDir re-registers. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.put(spark, sfDir) != sfDir)
      all.foreach { t => load(spark, sfDir, t).createOrReplaceTempView(t) }
}
