package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** MERGE semantics from the reference's grammar and tests
  * (reference `pkg/query/merge_processor.go:174-272`,
  * `tests/e2e/gosnowflake_test.go:427`): matched-update, matched-delete,
  * conditional clauses in declaration order, not-matched-insert,
  * pass-through for untouched rows, and per-action counts.
  */
class MergeIntoSpec extends SparkSpecBase {
  import spark.implicits._

  private def target = Seq(
    (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)
  ).toDF("id", "name", "bal")

  private def source = Seq(
    (2, 200.0), (3, -1.0), (4, 400.0)
  ).toDF("sid", "amount")

  test("matched update + not matched insert") {
    val t = target; val s = source
    val out = MergeInto(
      target = t, source = s,
      condition = t("id") === s("sid"),
      matched = Seq(MergeInto.WhenMatched(None,
        MergeInto.Update(Map("bal" -> s("amount"))))),
      notMatched = Seq(MergeInto.WhenNotMatched(None, Map(
        "id" -> s("sid"), "name" -> lit("new"), "bal" -> s("amount"))))
    ).orderBy("id").collect()

    assert(out.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1, "a", 10.0), (2, "b", 200.0), (3, "c", -1.0), (4, "new", 400.0)))
  }

  test("conditional matched clauses evaluated in declaration order") {
    val t = target; val s = source
    val out = MergeInto(
      target = t, source = s,
      condition = t("id") === s("sid"),
      matched = Seq(
        MergeInto.WhenMatched(Some(s("amount") < 0), MergeInto.Delete),
        MergeInto.WhenMatched(None, MergeInto.Update(Map("bal" -> s("amount")))))
    ).orderBy("id").collect()

    // id=3 matched the delete clause (amount<0); id=2 the update; id=1 kept;
    // id=4 dropped (no insert clause).
    assert(out.map(r => (r.getInt(0), r.getDouble(2))).toSeq ==
      Seq((1, 10.0), (2, 200.0)))
  }

  test("matched row with non-applicable conditions passes through") {
    val t = target; val s = source
    val out = MergeInto(
      target = t, source = s,
      condition = t("id") === s("sid"),
      matched = Seq(MergeInto.WhenMatched(Some(lit(false)),
        MergeInto.Update(Map("bal" -> lit(0.0)))))
    ).orderBy("id").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 20.0, 30.0))
  }

  test("conditional insert clause filters source-only rows") {
    val t = target; val s = source
    val out = MergeInto(
      target = t, source = s,
      condition = t("id") === s("sid"),
      notMatched = Seq(MergeInto.WhenNotMatched(Some(s("amount") > 1000), Map(
        "id" -> s("sid"), "name" -> lit("new"), "bal" -> s("amount"))))
    ).orderBy("id").collect()
    // amount=400 fails the insert condition -> row dropped
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("counts reports inserted/updated/deleted") {
    val t = target; val s = source
    val c = MergeInto.counts(
      target = t, source = s,
      condition = t("id") === s("sid"),
      matched = Seq(
        MergeInto.WhenMatched(Some(s("amount") < 0), MergeInto.Delete),
        MergeInto.WhenMatched(None, MergeInto.Update(Map("bal" -> s("amount"))))),
      notMatched = Seq(MergeInto.WhenNotMatched(None, Map("id" -> s("sid")))))
    assert(c == MergeInto.Counts(inserted = 1, updated = 1, deleted = 1))
  }
}
