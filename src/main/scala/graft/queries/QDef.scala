package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator/query: the Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs on DuckDB over
  * the same parquet tables. Column names are aligned on both sides — the
  * driver's compare sorts columns by name before hashing.
  *
  * Laziness contract: `fn` normally returns an UNEVALUATED plan — cheap to
  * construct, executed only when the caller acts on it. The documented
  * exceptions are the `localized` entries (p85*, p90b), whose construction
  * eagerly runs the corpus job and a bounded driver collect so their
  * materialized fronts release inside the entry instead of pinning
  * block-manager storage for the session; plan-only consumers (EXPLAIN
  * tooling, schema inspection) pay that execution on construction.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Money columns: exact decimal so Spark and DuckDB aggregate to the
    * identical value regardless of accumulation order, then cast the final
    * aggregate to double on BOTH sides. */
  def d(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rate columns (discount/tax in [0,1]). */
  def r(c: Column): Column = c.cast(DecimalType(4, 2))
  def sumd(c: Column): Column = sum(c).cast("double")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.Tables.load(spark, sfDir, name)

  /** Register all tables as temp views and run SQL text (used where
    * subqueries read better than the DataFrame API; same Catalyst plan). */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame = {
    graft.Tables.registerAll(spark, sfDir)
    spark.sql(text)
  }
}
