package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{CopyInto, MergeInto, MutableOps}
import graft.queries.Q._

/** Statement-level operators (SURVEY.md §2.10) surfaced as verifiable
  * queries: each runs the real graft operator (single-join MERGE,
  * copy-on-write UPDATE/DELETE, vectorized COPY) and the oracle expresses
  * the *expected final table state* in plain ANSI SQL, so the operator's
  * semantics are hash-checked against DuckDB, not just row-counted.
  */
object Dml {

  val defs: Seq[QDef] = Seq(

    // ---- MERGE INTO: matched-update (conditional) + not-matched-insert.
    // Source = per-customer spend from orders, plus a shifted-key copy so
    // the insert branch actually fires (order custkeys all match customer).
    QDef("q29_merge_into",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val src0 = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("cust_id"))
          .agg(sumd(d(col("o_totalprice"))).as("total_spend"))
        val source = src0.select(col("cust_id"), col("total_spend"))
          .union(src0.select((col("cust_id") + 1000000L).as("cust_id"), col("total_spend")))
        MergeInto(
          target = customer,
          source = source,
          condition = customer("c_custkey") === source("cust_id"),
          matched = Seq(MergeInto.WhenMatched(
            Some(source("total_spend") > 300000.0),
            MergeInto.Update(Map("c_acctbal" -> source("total_spend"))))),
          notMatched = Seq(MergeInto.WhenNotMatched(None, Map(
            "c_custkey" -> source("cust_id"),
            "c_name" -> concat(lit("New#"), source("cust_id").cast("string")),
            "c_nationkey" -> (source("cust_id") % 25),
            "c_acctbal" -> source("total_spend"),
            "c_mktsegment" -> lit("NEW"))))
        ).orderBy(col("c_custkey"))
      },
      Some("""WITH src0 AS (
          SELECT o_custkey AS cust_id,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
          FROM orders GROUP BY o_custkey),
        src AS (SELECT cust_id, total_spend FROM src0
                UNION ALL SELECT cust_id + 1000000, total_spend FROM src0)
        SELECT c_custkey, c_name, c_nationkey,
          CASE WHEN s.cust_id IS NOT NULL AND s.total_spend > 300000.0
               THEN s.total_spend ELSE c_acctbal END AS c_acctbal,
          c_mktsegment
        FROM customer LEFT JOIN src s ON c_custkey = s.cust_id
        UNION ALL
        SELECT s.cust_id, 'New#' || CAST(s.cust_id AS VARCHAR),
          CAST(s.cust_id % 25 AS INTEGER), s.total_spend, 'NEW'
        FROM src s WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = s.cust_id)
        ORDER BY c_custkey""")),

    // ---- UPDATE (copy-on-write): full table state after the update ----
    QDef("q30_update_cow",
      (s, dir) => MutableOps.update(
        t(s, dir, "lineitem"),
        col("l_quantity") >= 45,
        Map("l_discount" -> lit(0.0), "l_returnflag" -> lit("U")))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        l_extendedprice,
        CASE WHEN l_quantity >= 45 THEN 0.0 ELSE l_discount END AS l_discount,
        l_tax,
        CASE WHEN l_quantity >= 45 THEN 'U' ELSE l_returnflag END AS l_returnflag,
        l_linestatus, l_shipdate
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- DELETE (copy-on-write): table state after the delete ---------
    QDef("q31_delete_cow",
      (s, dir) => MutableOps.delete(
        t(s, dir, "orders"),
        col("o_orderstatus") === "F" && col("o_totalprice") < 50000.0)
        .orderBy(col("o_orderkey")),
      Some("""SELECT * FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000.0)
        ORDER BY o_orderkey""")),

    // ---- COPY INTO (CSV): stage round-trip must reproduce the table ---
    QDef("q32_copy_csv",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val stage = fixtureDir(s, dir, "csv") { d =>
          customer.coalesce(2).write.mode("overwrite")
            .option("header", "true").csv(d.resolve("data").toString)
        }
        val (df, _) = CopyInto.load(s, stage.resolve("data"), customer.schema,
          CopyInto.Options(format = "CSV", skipHeader = 1,
            pattern = Some(".*\\.csv")))
        df.orderBy(col("c_custkey"))
      },
      Some("SELECT * FROM customer ORDER BY c_custkey")),

    // ---- COPY INTO (JSON): stage round-trip over JSON-lines -----------
    QDef("q33_copy_json",
      (s, dir) => {
        val supplier = t(s, dir, "supplier")
        val stage = fixtureDir(s, dir, "json") { d =>
          supplier.coalesce(2).write.mode("overwrite")
            .json(d.resolve("data").toString)
        }
        val (df, _) = CopyInto.load(s, stage.resolve("data"), supplier.schema,
          CopyInto.Options(format = "JSON", pattern = Some(".*\\.json")))
        df.orderBy(col("s_suppkey"))
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey"))
  )

  /** Stage-fixture directory for the COPY round-trip queries, written once
    * per (sfDir, format) per JVM so repeated runs (bench warmup + timed
    * pass) time the COPY load itself, not the fixture export. */
  private def fixtureDir(s: org.apache.spark.sql.SparkSession, sfDir: String,
      tag: String)(write: java.nio.file.Path => Unit): java.nio.file.Path = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_fixture_${tag}_${Integer.toHexString(sfDir.hashCode)}")
    val done = root.resolve("_done")
    this.synchronized {
      if (!Files.exists(done)) {
        Files.createDirectories(root)
        write(root)
        Files.createFile(done)
      }
    }
    root
  }
}
