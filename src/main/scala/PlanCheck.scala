object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q05_nation_revenue", "q03_top_orders", "q10_scalar_subquery",
      "p05_knn_exact", "p12_events_hourly", "q04_semi_join_priority", "p02_dedup_ngram_jaccard")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val t0 = System.nanoTime()
      df.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime()
      df.count()
      val t3 = (System.nanoTime() - t2) / 1e9
      println(f"PLANCHECK $n cold=$t1%.2f warm=$t3%.2f")
    }
    // explain the worst
    println("PLANCHECK === q05 plan ===")
    println(graft.SparkEntry.queries("q05_nation_revenue")(spark, dir)
      .queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
