package graft

import org.apache.spark.sql.functions._

/** p103 on adversarial corpora: the duplicated-window >= 2 filter must
  * survive a degenerate corpus (megabytes of ONE repeated character —
  * every stride-1 window hashes identically) that hot-spotted the old
  * h-partitioned count window into a single task. The fixed plan
  * (partial-aggregated groupBy(h) + join back) is pinned here twice:
  * values against a plain-Scala interval-union re-derivation, and plan
  * shape (no window operator keyed on the corpus-scaled h — the only
  * windows left are the per-doc gaps-and-islands ones). */
class DuplicatedWindowSpec extends SparkSpecBase {

  /** Write a documents.parquet-shaped corpus to a temp dir. */
  private def corpusDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_p103").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Plain-Scala re-derivation of Lee et al.'s measurement: a position
    * is duplicated iff inside some 30-char window occurring >= 2 times
    * corpus-wide; coverage is the per-doc interval union. */
  private def oracle(rows: Seq[(Long, String, String)]): Map[Long, (Long, Long)] = {
    val L = 30
    val winCount = scala.collection.mutable.HashMap[String, Int]()
    for ((_, text, _) <- rows; i <- 0 to text.length - L)
      winCount.updateWith(text.substring(i, i + L))(c => Some(c.getOrElse(0) + 1))
    rows.map { case (id, text, _) =>
      val spans = (0 to text.length - L)
        .filter(i => winCount(text.substring(i, i + L)) >= 2)
        .map(i => (i + 1, i + L)) // 1-based inclusive, like the entry
      // interval union
      var runs = 0L; var chars = 0L
      var curS = -1; var curE = -2
      for ((s0, e0) <- spans) {
        if (s0 > curE + 1) {
          if (curS >= 0) { runs += 1; chars += curE - curS + 1 }
          curS = s0; curE = e0
        } else curE = math.max(curE, e0)
      }
      if (curS >= 0) { runs += 1; chars += curE - curS + 1 }
      id -> (runs, chars)
    }.toMap
  }

  private val mega = "a" * 200000 // the degenerate one-character doc
  private val shared = "The quick brown fox jumps over the lazy dog tonight."
  private val corpus = Seq(
    (1L, mega, "crawl"),                                  // one hash, 199971 windows
    (2L, "short", "crawl"),                               // < 30 chars: zero windows
    (3L, s"prefix one $shared and a unique tail xyz", "web"),
    (4L, s"$shared totally different remainder text here!!", "web"),
    (5L, "b" * 40 + "unique-middle-part-1234567890" + "b" * 40, "web"))

  test("degenerate one-character corpus: exact interval union, no single-task funnel") {
    val dir = corpusDir(corpus)
    val exp = oracle(corpus)
    val got = SparkEntry.queries("p103_dup_span_coverage")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)), r.getLong(2), r.getDouble(5))).toMap
    assert(got.keySet == corpus.map(_._1).toSet)
    for ((id, text, _) <- corpus) {
      val (runs, chars) = exp(id)
      assert(got(id)._1 == ((runs, chars)), s"doc $id: got ${got(id)._1}, want ($runs, $chars)")
      assert(got(id)._2 == text.length.toLong)
    }
    // the megadoc is fully covered by its own within-doc repeats
    assert(got(1L)._1 == ((1L, 200000L)))
    assert(got(1L)._3 == 1.0)
    // the 'b'-runs doc: both 40-char b-runs share windows with doc 1? No —
    // 'b' != 'a'; its only >= 2 windows are its OWN repeated all-b windows
    assert(exp(5L)._1 == got(5L)._1._1)
  }

  test("plan: no window operator keyed on the corpus-scaled hash") {
    val plan = SparkEntry.queries("p103_dup_span_coverage")(spark, sf0001)
      .queryExecution.optimizedPlan.toString()
    // per-doc islands windows remain; an h-keyed window must not
    val winSpecs = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).mkString("\n")
    assert(!winSpecs.contains("windowspecdefinition(h#") &&
      !winSpecs.replaceAll("\\s+", "").contains("windowspecdefinition(h,"),
      s"h-partitioned window resurfaced:\n$winSpecs")
    assert(plan.contains("count"), plan.take(400))
  }
}
