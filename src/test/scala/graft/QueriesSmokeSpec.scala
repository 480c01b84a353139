package graft

/** Every SparkEntry query must run on sf0.001 and produce a schema and
  * rows. This is the driver's t1 smoke contract, run per query so a single
  * regression is pinpointed by name.
  */
class QueriesSmokeSpec extends SparkSpecBase {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.schema.fields.nonEmpty)
      val n = df.count()
      assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
