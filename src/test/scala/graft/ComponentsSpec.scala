package graft

import org.apache.spark.sql.functions._

/** minLabelComponents must reach the fixpoint on graphs whose diameter
  * exceeds any fixed iteration budget — a capped loop silently returns
  * split components, which is the worst possible failure mode for a
  * dedup clustering (r5 shipped a hard 20-iteration cap).
  */
class ComponentsSpec extends SparkSpecBase {

  test("chain with diameter 25 converges to a single component") {
    import spark.implicits._
    // path graph 100-101-...-125: min-label needs ~25 rounds to reach
    // the far end, past the old cap of 20
    val pairs = (100L until 125L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comps = queries.Pipeline.minLabelComponents(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 26)
    assert(comps.values.forall(_ == 100L), s"split components: $comps")
  }

  test("two disjoint chains keep distinct labels") {
    import spark.implicits._
    val pairs = ((1L to 3L).map(i => (i, i + 1)) ++
      (10L to 12L).map(i => (i, i + 1))).toDF("a_id", "b_id")
    val comps = queries.Pipeline.minLabelComponents(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(comps(_) == 1L))
    assert((10L to 13L).forall(comps(_) == 10L))
  }

  test("unconverged loop throws instead of returning split components") {
    import spark.implicits._
    val pairs = (1L to 5L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    assertThrows[IllegalStateException] {
      queries.Pipeline.minLabelComponents(spark, pairs, maxIter = 2).count()
    }
  }
}
