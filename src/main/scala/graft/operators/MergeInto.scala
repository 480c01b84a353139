package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO, re-expressed as ONE declarative join plan.
  *
  * The reference decomposes MERGE into up to three sequential statements —
  * `UPDATE..FROM`, `DELETE..USING`, `INSERT..SELECT..WHERE NOT EXISTS`
  * (reference `pkg/query/merge_processor.go:446-631`) — which is non-atomic
  * between statements and scans the target up to three times. Here the whole
  * MERGE is a single full-outer join of target and source followed by a
  * per-row action decision, so the target is scanned once, the shuffle on
  * the join key happens once, and the result is produced atomically by a
  * single overwrite. Skew on the join key is handled by AQE's skew-join
  * splitting (enabled in GraftSession).
  *
  * Clause semantics follow Snowflake/ANSI MERGE: WHEN [NOT] MATCHED clauses
  * are evaluated in declaration order, the first clause whose AND-condition
  * holds wins, a matched row with no applicable clause passes through
  * unchanged, a source-only row with no applicable insert clause is dropped
  * (reference grammar: `merge_processor.go:174-272`).
  */
object MergeInto {

  sealed trait MatchedAction
  /** UPDATE SET col -> expr (expr over joined target+source columns). */
  final case class Update(set: Map[String, Column]) extends MatchedAction
  case object Delete extends MatchedAction

  final case class WhenMatched(condition: Option[Column], action: MatchedAction)
  /** INSERT with explicit value per target column (missing cols -> NULL). */
  final case class WhenNotMatched(condition: Option[Column], values: Map[String, Column])

  private val TMark = "__graft_t_mark"
  private val SMark = "__graft_s_mark"
  private val ActionCol = "__graft_action"

  /** Pass-through action index for matched rows with no applicable clause. */
  private val Keep = -1

  /** Execute the merge and return the new target content (same schema as
    * `target`). Column expressions in clauses/condition may reference
    * `target("col")` / `source("col")` or plain `col("name")` when
    * unambiguous.
    */
  def apply(
      target: DataFrame,
      source: DataFrame,
      condition: Column,
      matched: Seq[WhenMatched] = Nil,
      notMatched: Seq[WhenNotMatched] = Nil): DataFrame = {

    val targetCols = target.columns.toSeq
    val t = target.withColumn(TMark, lit(1))
    val s = source.withColumn(SMark, lit(1))

    val joined = t.join(s, condition, "full_outer")
    val isMatched = col(TMark).isNotNull && col(SMark).isNotNull
    val targetOnly = col(TMark).isNotNull && col(SMark).isNull
    val sourceOnly = col(TMark).isNull && col(SMark).isNotNull

    // First applicable clause index (evaluated in declaration order).
    def firstApplicable(conds: Seq[Option[Column]]): Column =
      conds.zipWithIndex.foldRight(lit(Keep)) { case ((c, i), rest) =>
        c.map(cc => when(cc, lit(i)).otherwise(rest)).getOrElse(lit(i))
      }

    val matchedIdx = firstApplicable(matched.map(_.condition))
    val insertIdx = firstApplicable(notMatched.map(_.condition))

    val withAction = joined.withColumn(
      ActionCol,
      when(isMatched, matchedIdx)
        .when(targetOnly, lit(Keep))
        .otherwise(insertIdx))

    val deleteIdxs = matched.zipWithIndex.collect {
      case (WhenMatched(_, Delete), i) => i
    }.toSet

    // Row survives unless a DELETE clause selected it, or it is a
    // source-only row with no applicable insert clause.
    val survives =
      when(sourceOnly, col(ActionCol) =!= lit(Keep))
        .otherwise(
          if (deleteIdxs.isEmpty) lit(true)
          else !col(ActionCol).isin(deleteIdxs.toSeq.map(_.asInstanceOf[Any]): _*)
            || !isMatched)

    val outCols = targetCols.map { name =>
      val base = target(name)
      val matchedValue = matched.zipWithIndex.foldRight(base) {
        case ((WhenMatched(_, Update(set)), i), rest) if set.contains(name) =>
          when(col(ActionCol) === lit(i), set(name)).otherwise(rest)
        case (_, rest) => rest
      }
      val insertValue = notMatched.zipWithIndex.foldRight(lit(null).cast(target.schema(name).dataType): Column) {
        case ((WhenNotMatched(_, values), i), rest) =>
          when(col(ActionCol) === lit(i),
            values.getOrElse(name, lit(null)).cast(target.schema(name).dataType))
            .otherwise(rest)
      }
      when(isMatched || targetOnly, matchedValue)
        .otherwise(insertValue)
        .as(name)
    }

    withAction.filter(survives).select(outCols: _*)
  }

  /** Per-action row counts (inserted / updated / deleted), mirroring the
    * reference's MergeResult (`pkg/query/result.go:43-47`). Computed as a
    * single aggregate over the same one-pass join plan.
    */
  final case class Counts(inserted: Long, updated: Long, deleted: Long)

  def counts(
      target: DataFrame,
      source: DataFrame,
      condition: Column,
      matched: Seq[WhenMatched] = Nil,
      notMatched: Seq[WhenNotMatched] = Nil): Counts = {
    val t = target.withColumn(TMark, lit(1))
    val s = source.withColumn(SMark, lit(1))
    val joined = t.join(s, condition, "full_outer")
    val isMatched = col(TMark).isNotNull && col(SMark).isNotNull
    val sourceOnly = col(TMark).isNull && col(SMark).isNotNull

    def firstApplicable(conds: Seq[Option[Column]]): Column =
      conds.zipWithIndex.foldRight(lit(Keep)) { case ((c, i), rest) =>
        c.map(cc => when(cc, lit(i)).otherwise(rest)).getOrElse(lit(i))
      }
    val matchedIdx = firstApplicable(matched.map(_.condition))
    val insertIdx = firstApplicable(notMatched.map(_.condition))
    val deleteIdxs = matched.zipWithIndex.collect {
      case (WhenMatched(_, Delete), i) => i
    }.toSet
    val updateIdxs = matched.indices.filterNot(deleteIdxs.contains).toSet

    def cnt(cond: Column): Column =
      sum(when(cond, 1L).otherwise(0L))

    val row = joined.agg(
      cnt(sourceOnly && insertIdx =!= lit(Keep)).as("ins"),
      cnt(isMatched && (if (updateIdxs.isEmpty) lit(false)
        else matchedIdx.isin(updateIdxs.toSeq.map(_.asInstanceOf[Any]): _*))).as("upd"),
      cnt(isMatched && (if (deleteIdxs.isEmpty) lit(false)
        else matchedIdx.isin(deleteIdxs.toSeq.map(_.asInstanceOf[Any]): _*))).as("del")
    ).collect()(0)

    def l(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    Counts(l(0), l(1), l(2))
  }
}
