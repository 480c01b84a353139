package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MutableOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    (1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)
  ).toDF("id", "name", "bal")

  test("update applies set only to matching rows, keeps schema/order") {
    val out = MutableOps.update(df, col("bal") >= 20.0,
      Map("name" -> lit("HIT"), "bal" -> (col("bal") * 2)))
      .orderBy("id").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1, "x", 10.0), (2, "HIT", 40.0), (3, "HIT", 60.0)))
  }

  test("update with NULL condition treats row as no-match") {
    val d = Seq((1, Option.empty[Double]), (2, Some(25.0))).toDF("id", "bal")
    val out = MutableOps.update(d, col("bal") > 20.0, Map("id" -> lit(99)))
      .orderBy("bal").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 99))
  }

  test("delete drops matching rows; NULL condition keeps the row") {
    val d = Seq((1, Option.empty[Double]), (2, Some(25.0)), (3, Some(5.0)))
      .toDF("id", "bal")
    val out = MutableOps.delete(d, col("bal") > 20.0).orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 3))
  }

  test("affectedCount counts only definite matches") {
    val d = Seq((1, Option.empty[Double]), (2, Some(25.0)), (3, Some(30.0)))
      .toDF("id", "bal")
    assert(MutableOps.affectedCount(d, col("bal") > 20.0) == 2)
  }
}
