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

  test("p35 releases its persisted truth sets (no pinned blocks leak)") {
    // p35 persists the two exact truth sets internally; a library caller
    // invoking it directly must not inherit pinned tables in the session
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = SparkEntry.queries("p35_ann_recall")(spark, sf0001)
    assert(df.count() == 6)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"p35 leaked persisted RDDs: ${after -- before}")
  }

  test("exact all-pairs baselines refuse to run above the size guard") {
    sys.props("graft.exactBaselineMaxRows") = "10"
    try {
      Seq("p05_knn_exact", "p14_embedding_neardup").foreach { name =>
        val e = intercept[IllegalStateException] {
          SparkEntry.queries(name)(spark, sf0001).count()
        }
        assert(e.getMessage.contains("exact all-pairs baseline"), e.getMessage)
        assert(e.getMessage.contains("p06_knn_lsh"), e.getMessage)
      }
    } finally sys.props.remove("graft.exactBaselineMaxRows")
  }
}
