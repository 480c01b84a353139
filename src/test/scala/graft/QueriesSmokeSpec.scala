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

  test("p39 estimate is exactly the estimator applied to p39b's registers") {
    // the sketch-contents entry (p39b) and the answer entry (p39) must be
    // two views of ONE state: recomputing the raw-HLL estimate from the
    // pinned register table reproduces n_est_r bit-for-bit
    val regs = SparkEntry.queries("p39b_hll_registers")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(regs.map(_._1).distinct.length == regs.length)
    assert(regs.forall { case (i, rho) => i >= 0 && i < 256 && rho >= 1 && rho <= 53 })
    val sScaled = (256L - regs.length) * (1L << 53) +
      regs.map { case (_, rho) => 1L << (53 - rho) }.sum
    val est = queries.Pipeline.hllEstConst / sScaled.toDouble
    val estR = math.floor(est * 10000.0 + 0.5) / 10000.0
    val row = SparkEntry.queries("p39_vocab_hll")(spark, sf0001).collect().head
    assert(row.getAs[Double]("n_est_r") == estR)
  }

  test("sketch dials do not change answers: p38 result-invariant, CMS dominates") {
    // the Bloom prescreen is result-invariant BY CONSTRUCTION (no false
    // negatives; false positives die in the verify join) — so any dial,
    // including a deliberately collision-heavy one, must reproduce the
    // default-dial answer exactly
    val base = SparkEntry.queries("p38_contamination_bloom")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    try {
      sys.props("graft.bloomBits") = "4096" // 16x the false-positive mass
      sys.props("graft.bloomProbes") = "2"
      val coarse = SparkEntry.queries("p38_contamination_bloom")(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      assert(coarse == base, "Bloom prescreen must be result-invariant at any dial")
      // the CMS estimate must dominate the exact count at any dial (the
      // sketch's one-sided error guarantee), including a narrow noisy one
      sys.props("graft.cmsWidth") = "1024"
      sys.props("graft.cmsDepth") = "2"
      val cms = SparkEntry.queries("p40_bigram_cms")(spark, sf0001).collect()
      assert(cms.nonEmpty && cms.forall(_.getAs[Long]("overcount") >= 0L),
        "CMS estimate must be >= the exact count at any dial")
    } finally Seq("graft.bloomBits", "graft.bloomProbes", "graft.cmsWidth",
      "graft.cmsDepth").foreach(sys.props.remove)
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
