package graft

/** The statistics/audit family added in r13 (p91 edit similarity, p92
  * exact quantiles, p93 conformal gate, p94 A/B z-test, p95 tf-idf
  * keywords, p96 rater kappa, p97 hash-order k-samples, p98 Welch
  * t-test) against independent plain-Scala re-derivations at sf0.001.
  */
class StatsFamilySpec extends SparkSpecBase with PlainScalaFixtures {

  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  /** The DF-guarded distinct 3-shingle md560 set per doc (sf0.001). */
  private lazy val shingleSets: Map[Long, Set[Long]] = {
    val raw = corpus.collect { case (id, text, _) if toks(text).length >= 3 =>
      id -> toks(text).sliding(3).map(w => md560(w.mkString(" "))).toSet
    }.toMap
    val n = corpus.size
    val df = raw.values.flatten.groupBy(identity)
      .map { case (h, g) => h -> g.size }
    val hot = df.collect {
      case (h, c) if c.toDouble > math.max(5.0, n * 0.01) => h }.toSet
    raw.map { case (id, s) => id -> (s -- hot) }
  }

  test("p91: Levenshtein + normalized similarity on the Jaccard>=0.3 front equals plain Scala") {
    val texts = corpus.map(d => d._1 -> d._2).toMap
    val expected = (for {
      (a, sa) <- shingleSets.toSeq; (b, sb) <- shingleSets.toSeq
      if a < b
      inter = (sa & sb).size if inter > 0
      jr = r6(inter.toDouble / (sa.size + sb.size - inter)) if jr >= 0.3
    } yield {
      val (ta, tb) = (texts(a), texts(b))
      val lv = lev(ta, tb)
      (a, b, jr, lv.toLong, r6(1.0 - lv.toDouble / math.max(ta.length, tb.length)))
    }).sortBy(p => (p._1, p._2))
    val got = SparkEntry.queries("p91_edit_similarity")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    assert(expected.nonEmpty) // the family must actually exercise the kernel
  }

  test("p92: the five percentiles equal plain sorted order statistics") {
    val lens = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val n = lens.length.toLong
    val expected = Seq(25, 50, 75, 90, 99).map { pct =>
      // smallest v with count(<= v) * 100 >= pct * n == the
      // ceil(pct*n/100)-th order statistic
      val k = (pct * n + 99) / 100
      (pct, lens(k.toInt - 1), n)
    }
    val got = SparkEntry.queries("p92_exact_quantiles")(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"$got vs $expected")
  }

  /** Plain-Scala Flesch metrics in p82's exact arithmetic: (fre_r, fre_s). */
  private def flesch(text: String): (Double, Long) = {
    val words = toks(text).length.toLong
    val sentences = math.max(1, "[.!?]+".r.findAllIn(text).size).toLong
    val syll = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong
    val fre = 206.835 - 1.015 * (words.toDouble / sentences) -
      84.6 * (syll.toDouble / words)
    (r6(fre), new java.math.BigDecimal(fre * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
  }

  test("p93: threshold is the ceil((n_cal+1)/4)-th smallest calibration bucket; admits match") {
    def hexDigit(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (d(0) >> 4) & 0xf
    }
    val meta = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val scored = meta.map { case (id, src, text) =>
      val q = math.min(1023, math.max(0,
        math.floor((flesch(text)._1 + 100.0) * 4.0).toInt))
      (id, src, q, hexDigit(id) < 8)
    }
    val cal = scored.filter(_._4).map(_._3).sorted
    val k = ((cal.length + 1) + 3) / 4 // ceil((n_cal+1)/4)
    val thr = cal(k - 1)
    val test0 = scored.filterNot(_._4)
    val expected = test0.groupBy(_._2).map { case (src, g) =>
      (src, thr, g.length.toLong, g.count(_._3 >= thr).toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("p93_conformal_gate")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"$got vs $expected")
    // the split-conformal bound: miscoverage on the test side should not
    // wildly exceed alpha = 1/4 (quantization only ADMITS more via ties)
    val admitted = got.map(_._4).sum.toDouble / got.map(_._3).sum
    assert(admitted >= 0.7, s"admit rate $admitted")
  }

  test("p94: two-proportion z on first-event conversion equals the plain formula") {
    val ev = graft.queries.Q.t(spark, sf0001, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val firsts = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val f = rows.minBy(r => (r._2, r._3))
      (u % 2, if (f._4 == "purchase") 1L else 0L)
    }
    val byArm = firsts.groupBy(_._1).map { case (v, g) =>
      v -> ((g.size.toLong, g.map(_._2).sum)) }
    val (n0, c0) = byArm(0); val (n1, c1) = byArm(1)
    val p0 = c0.toDouble / n0; val p1 = c1.toDouble / n1
    val pp = (c0 + c1).toDouble / (n0 + n1)
    val invn = (n0 + n1).toDouble / (n0 * n1).toDouble
    val z = r6((p0 - p1) / math.sqrt((pp * (1.0 - pp)) * invn))
    val row = SparkEntry.queries("p94_ab_ztest")(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n0, c0, n1, c1)))
    assert(row.getDouble(6) == z, s"${row.getDouble(6)} vs $z")
    assert(row.getBoolean(7) == (math.abs(z) >= 1.959964))
  }

  test("p95: per-doc top-3 tf-idf keywords equal plain Scala (sln idf, tie -> token asc)") {
    val n = corpus.size.toLong
    val docToks = corpus.map { case (id, text, _) => id -> toks(text).toSeq }
    val df = docToks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val expected = docToks.flatMap { case (id, ts) =>
      val tf = ts.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      tf.toSeq.map { case (t, f) =>
        (id, t, f, df(t), f * (sln(n + 1) - sln(df(t) + 1)))
      }.sortBy { case (_, t, _, _, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((i, t, f, d0, s), r) => (i, r + 1, t, f, d0, s) }
    }.sortBy(p => (p._1, p._2))
    val got = SparkEntry.queries("p95_tfidf_keywords")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"${got.take(4)} vs ${expected.take(4)}")
  }

  test("p96: Cohen's kappa between the p09 and Flesch raters equals plain Scala") {
    val rated = corpus.map { case (_, text, _) =>
      val nt = toks(text).length
      val atl = text.replace(" ", "").length.toDouble / nt
      val pr = (text.length -
        text.replaceAll("[A-Za-z0-9 ]", "").length).toDouble / text.length
      val q = (if (nt >= 5 && nt <= 1000) 0.4 else 0.0) +
        (if (atl >= 3.0 && atl <= 10.0) 0.3 else 0.0) +
        (if (pr < 0.1) 0.3 else 0.0)
      (q >= 0.7, flesch(text)._2 >= 50000000L)
    }
    val n = rated.size.toLong
    val n11 = rated.count(r => r._1 && r._2).toLong
    val n10 = rated.count(r => r._1 && !r._2).toLong
    val n01 = rated.count(r => !r._1 && r._2).toLong
    val n00 = rated.count(r => !r._1 && !r._2).toLong
    val po = (n11 + n00).toDouble / n
    val pa1 = (n11 + n10).toDouble / n
    val pb1 = (n11 + n01).toDouble / n
    val pe = (pa1 * pb1) + ((1.0 - pa1) * (1.0 - pb1))
    val kappa = r6((po - pe) / (1.0 - pe))
    val row = SparkEntry.queries("p96_rater_kappa")(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((n, n11, n10, n01, n00)))
    assert(row.getDouble(5) == po && row.getDouble(6) == kappa,
      s"(${row.getDouble(5)}, ${row.getDouble(6)}) vs ($po, $kappa)")
    // both raters fire on a nontrivial slice — the kappa is meaningful
    assert(n11 + n10 > 0 && n11 + n01 > 0)
  }

  test("p97/p97b: hash-order k-samples equal plain md5-hex ordering") {
    def hk(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"ks:$id".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val meta = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expGlobal = meta.map { case (id, src) => (id, src, hk(id)) }
      .sortBy(_._3).take(20).toSeq
    val gotGlobal = SparkEntry.queries("p97_uniform_ksample")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(gotGlobal == expGlobal)
    val expStrat = meta.groupBy(_._2).toSeq.flatMap { case (src, g) =>
      g.map { case (id, _) => (id, hk(id)) }.sortBy(_._2).take(3).zipWithIndex
        .map { case ((id, h), i) => (src, i + 1, id, h) }
    }.sortBy(p => (p._1, p._2))
    val gotStrat = SparkEntry.queries("p97b_stratified_ksample")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(gotStrat == expStrat)
  }

  test("p99: the transition matrix equals plain consecutive-pair counting; rows sum to 1") {
    val ev = graft.queries.Q.t(spark, sf0001, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4)
      s.zip(s.tail)
    }
    val counts = pairs.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val totals = counts.groupBy(_._1._1).map { case (c, g) => c -> g.values.sum }
    val expected = counts.toSeq.map { case ((c, nx), n) =>
      (c, nx, n, totals(c), r6(n.toDouble / totals(c)))
    }.sortBy(p => (p._1, p._2))
    val got = SparkEntry.queries("p99_event_transitions")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    // each cur row's probabilities sum to ~1 (6dp rounding slack)
    got.groupBy(_._1).foreach { case (c, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, c)
    }
  }

  test("p100: RFM scores equal plain tertile cuts; every score in 1..3") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val ev = graft.queries.Q.t(spark, sf0001, "events")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val maxDay = ev.map(_._2.toLocalDateTime.toLocalDate).maxBy(_.toEpochDay)
    val rfm = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val rec = maxDay.toEpochDay -
        rows.map(_._2.toLocalDateTime.toLocalDate.toEpochDay).max
      val mon = rows.filter(_._3 == "purchase")
        .map(r => JBD.valueOf(r._4).setScale(2, RM.HALF_UP))
        .foldLeft(JBD.ZERO)(_.add(_))
        .setScale(0, RM.FLOOR).longValueExact()
      (u, rec, rows.size.toLong, mon)
    }
    def cuts(vs: Seq[Long]): (Long, Long) = {
      val sorted = vs.sorted; val n = vs.size
      def b(mult: Int) = sorted((n * mult + 2) / 3 - 1) // smallest v with cnt*3 >= n*mult
      (b(1), b(2))
    }
    val (rb1, rb2) = cuts(rfm.map(_._2))
    val (fb1, fb2) = cuts(rfm.map(_._3))
    val (mb1, mb2) = cuts(rfm.map(_._4))
    def sc(v: Long, b1: Long, b2: Long): Int =
      1 + (if (v > b1) 1 else 0) + (if (v > b2) 1 else 0)
    val expected = rfm.map { case (u, r, f, m) =>
      val (rs, fs, ms) = (sc(r, rb1, rb2), sc(f, fb1, fb2), sc(m, mb1, mb2))
      (u, r, f, m, rs, fs, ms, s"R${rs}F${fs}M$ms")
    }.sortBy(_._1)
    val got = SparkEntry.queries("p100_rfm_segments")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    got.foreach { r =>
      assert(r._5 >= 1 && r._5 <= 3 && r._6 >= 1 && r._6 <= 3 &&
        r._7 >= 1 && r._7 <= 3, r.toString)
    }
  }

  test("p101: PMI collocations equal the plain sln-integer ranking") {
    val allToks = corpus.flatMap(d => toks(d._2))
    val n1 = allToks.size.toLong
    val uni = allToks.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val allBg = corpus.flatMap(d => bigrams(d._2))
    val n2 = allBg.size.toLong
    val expected = allBg.groupBy(identity).toSeq
      .map { case ((w1, w2), g) => (w1, w2, g.size.toLong) }
      .filter(_._3 >= 5)
      .map { case (w1, w2, c12) =>
        (w1, w2, c12, uni(w1), uni(w2),
          (sln(c12) + 2 * sln(n1)) - (sln(n2) + sln(uni(w1)) + sln(uni(w2))))
      }.sortBy { case (w1, w2, _, _, _, s) => (-s, w1, w2) }.take(25)
    val got = SparkEntry.queries("p101_pmi_collocations")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    assert(got.nonEmpty)
  }

  test("p102: the weighted k-sample equals the plain Efraimidis-Spirakis key order") {
    def h16(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    val meta = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = meta.map { case (id, nc) =>
      val lnuS = sln(h16(id) + 1) - sln(65537L)
      (id, nc, lnuS, lnuS.toDouble / nc)
    }
    val expected = keyed.sortBy { case (id, _, _, k) => (-k, id) }.take(20)
      .map { case (id, nc, lnuS, k) => (id, nc, lnuS, r6(k)) }
      .sortBy { case (id, _, _, kr) => (-kr, id) }.toSeq
    val got = SparkEntry.queries("p102_weighted_ksample")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    // heavier docs are overrepresented vs the uniform sample: the mean
    // sampled length exceeds the corpus mean (the weighting is real)
    val corpusMean = meta.map(_._2).sum.toDouble / meta.length
    val sampleMean = got.map(_._2).sum.toDouble / got.size
    assert(sampleMean > corpusMean, s"$sampleMean <= $corpusMean")
  }

  test("p103: duplicated-substring coverage equals the plain interval union; " +
      "exact-dup docs are fully covered") {
    val L = 30
    val wins = corpus.flatMap { case (id, text, _) =>
      if (text.length >= L)
        (1 to text.length - L + 1).map(i =>
          (id, i, md560(text.substring(i - 1, i - 1 + L))))
      else Nil
    }
    val cnt = wins.groupBy(_._3).map { case (h, g) => h -> g.size }
    val dupByDoc = wins.filter(w => cnt(w._3) >= 2).groupBy(_._1)
    val srcById = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = corpus.map { case (id, text, _) =>
      val starts = dupByDoc.getOrElse(id, Seq.empty).map(_._2).sorted
      val runs = scala.collection.mutable.Buffer.empty[(Int, Int)]
      for (st <- starts) {
        val en = st + L - 1
        if (runs.nonEmpty && st <= runs.last._2 + 1)
          runs(runs.size - 1) = (runs.last._1, math.max(runs.last._2, en))
        else runs += ((st, en))
      }
      val dc = runs.map { case (s0, e0) => (e0 - s0 + 1).toLong }.sum
      (id, srcById(id), text.length.toLong, runs.size.toLong, dc,
        r6(dc.toDouble / text.length))
    }.sortBy(_._1)
    val got = SparkEntry.queries("p103_dup_span_coverage")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    // the criterion is exact at the extremes: a doc with an identical
    // twin has EVERY window duplicated, so coverage is exactly 1.0
    val twinned = corpus.groupBy(_._2).filter(_._2.size >= 2)
      .values.flatten.map(_._1).toSet
    // (conditional at this SF: the sf0.001 corpus has near-dups, not
    // byte-identical twins — when twins exist they must be fully covered)
    got.filter(r => twinned(r._1) && r._3 >= L)
      .foreach(r => assert(r._6 == 1.0, r.toString))
    // the measurement is non-degenerate: full, zero AND partial coverage
    // all occur (near-dup docs share long runs; unique docs share none)
    assert(got.exists(_._6 == 1.0) || twinned.isEmpty)
    assert(got.exists(_._6 == 0.0))
    assert(got.exists(r => r._6 > 0.0 && r._6 < 1.0))
  }

  test("p104: the SPRT trajectory equals the plain cumulative LLR; boundaries respected") {
    import java.time.{Instant, ZoneOffset}
    import java.time.temporal.ChronoUnit
    def sl(x: Double): Long = math.round(math.log(x) * 1e8)
    val (l1, l0) = (sl(0.25 / 0.15), sl(0.75 / 0.85))
    val (a, b) = (sl(0.95 / 0.05), sl(0.05 / 0.95))
    val ev = graft.queries.Q.t(spark, sf0001, "events")
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), Instant.ofEpochMilli(r.getTimestamp(1).getTime)
        .atZone(ZoneOffset.UTC).truncatedTo(ChronoUnit.HOURS).toInstant,
        r.getString(2)))
      .filter(_._1 % 2 == 1)
    val hourly = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (h, g) =>
      (h, g.size.toLong, g.count(_._3 == "purchase").toLong)
    }
    var (nc, cc) = (0L, 0L)
    val expected = hourly.map { case (h, n, c) =>
      nc += n; cc += c
      val llr = cc * l1 + (nc - cc) * l0
      val d = if (llr >= a) "accept_h1" else if (llr <= b) "accept_h0" else "continue"
      (h, nc, cc, llr, d)
    }
    val decidedAt = expected.collectFirst { case (h, _, _, _, d) if d != "continue" => h }
    val got = SparkEntry.queries("p104_sprt")(spark, sf0001).collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4),
        Option(r.getTimestamp(5)).map(_.toInstant))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == expected,
      s"${got.take(2)} vs ${expected.take(2)}")
    got.foreach(t => assert(t._6 == decidedAt, s"${t._6} vs $decidedAt"))
  }

  test("p105: the CUSUM prefix form equals the plain sequential recursion") {
    import java.time.{Instant, ZoneOffset}
    import java.time.temporal.ChronoUnit
    val ev = graft.queries.Q.t(spark, sf0001, "events")
      .select("ts").collect()
      .map(r => Instant.ofEpochMilli(r.getTimestamp(0).getTime)
        .atZone(ZoneOffset.UTC).truncatedTo(ChronoUnit.HOURS).toInstant)
    val hourly = ev.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (h, g) => (h, g.size.toLong) }
    val kS = hourly.map(_._2).sum * 1000000L / hourly.size
    // the DEFINITIONAL recursion S_t = max(0, S_{t-1} + x - k) — the
    // entry computes the prefix form; they must agree exactly
    var s0 = 0L
    val expected = hourly.map { case (h, x) =>
      s0 = math.max(0L, s0 + x * 1000000L - kS)
      (h, x, kS, s0, s0 > kS * 3)
    }
    val got = SparkEntry.queries("p105_cusum")(spark, sf0001).collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
  }

  test("p106: median/MAD outlier flags equal plain sorted order statistics") {
    val lens = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    def medOf(vs: Seq[Long]): Long = {
      val s0 = vs.sorted; s0((vs.size + 1) / 2 - 1) // smallest v with cnt*2 >= n
    }
    val med = medOf(lens.map(_._2).toIndexedSeq)
    val mad = medOf(lens.map(v => math.abs(v._2 - med)).toIndexedSeq)
    val expected = lens.map { case (id, nc) =>
      val adev = math.abs(nc - med)
      (id, nc, med, adev, mad, adev * 10000L > 44478L * mad)
    }.toSeq
    val got = SparkEntry.queries("p106_robust_outliers")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    // robustness sanity: the rule flags at most a small minority (this
    // corpus's lengths are well-behaved — zero flags is legitimate),
    // and the MAD is a real spread, not a degenerate zero
    assert(got.count(_._6) * 4 < got.size)
    assert(mad > 0 && got.exists(_._4 > 0))
  }

  test("p107: the KM log-survival trajectory equals the plain product estimator") {
    val ev = graft.queries.Q.t(spark, sf0001, "events")
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2)))
    val durs = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val fe = rows.map(_._2).min
      val fp = rows.filter(_._3 == "purchase").map(_._2).minOption
      val durH = fp.map(p => (p - fe) / 3600000L)
      val evt = durH.exists(_ <= 24)
      (if (evt) durH.get else 24L, evt)
    }
    val total = durs.size.toLong
    val pts = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, g.count(_._2).toLong, g.count(!_._2).toLong)
    }
    var removed = 0L; var km = 0L; var extinct = false
    val expected = pts.map { case (d, dt, ct) =>
      val nRisk = total - removed
      removed += dt + ct
      if (dt > 0) km += sln(math.max(nRisk - dt, 1L)) - sln(nRisk)
      extinct ||= dt == nRisk
      (d, nRisk, dt, ct, km, extinct)
    }
    val got = SparkEntry.queries("p107_kaplan_meier")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
    // survival only decreases, risk sets only shrink
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._5 <= a._5 && b._2 < a._2, s"$a -> $b")
      case _ =>
    }
  }

  test("p108: the Poisson-bootstrap CI equals the plain derandomized resampling") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val thresholds = {
      var acc = 0.0
      (0 to 5).map { k =>
        acc += math.exp(-1.0) / (1 to k).foldLeft(1L)(_ * _)
        math.floor(acc * 65536.0).toLong
      }
    }
    def u16(eid: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bs:$eid:$b".getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    def pois(u: Long): Long =
      thresholds.indexWhere(u < _) match { case -1 => 6L; case k => k.toLong }
    val pv = graft.queries.Q.t(spark, sf0001, "events")
      .select("event_id", "event_type", "value").collect()
      .filter(_.getString(1) == "purchase")
      .map(r => (r.getLong(0), JBD.valueOf(r.getDouble(2)).setScale(2, RM.HALF_UP)))
    val means = (0 until 200).map { b =>
      var sw = 0L; var swv = JBD.ZERO
      pv.foreach { case (eid, vd) =>
        val w = pois(u16(eid, b))
        sw += w; swv = swv.add(vd.multiply(JBD.valueOf(w)))
      }
      swv.doubleValue / sw
    }.sorted
    val (ciLo, ciHi) = (means(4), means(194)) // smallest m with rk*40 >= 200 / >= 39*200
    val mean = pv.map(_._2).foldLeft(JBD.ZERO)(_.add(_)).doubleValue / pv.length
    val row = SparkEntry.queries("p108_poisson_bootstrap")(spark, sf0001).collect().head
    assert(row.getLong(0) == pv.length && row.getLong(2) == 200L)
    assert(row.getDouble(1) == r6(mean))
    assert((row.getDouble(3), row.getDouble(4)) == ((r6(ciLo), r6(ciHi))),
      s"(${row.getDouble(3)}, ${row.getDouble(4)}) vs (${r6(ciLo)}, ${r6(ciHi)})")
    // the interval is a real interval and brackets the point estimate
    assert(row.getDouble(3) < row.getDouble(4))
    assert(row.getDouble(3) <= row.getDouble(1) && row.getDouble(1) <= row.getDouble(4))
  }

  test("p108 degenerate corpus: zero-weight replicas drop identically and the CI stays defined") {
    // two purchases: P(all-zero replica) = e^-2 per replica, so a real
    // fraction of the 200 replicas has no mean — the r13 ADVICE
    // cross-engine NULL-ordering divergence class. The entry must (a)
    // drop them before ranking and (b) scale the percentile ranks to
    // the survivors so neither cut selects over an empty set.
    import java.math.{BigDecimal => JBD}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_p108").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    Seq(
      (1L, t0, 100L, "purchase", 10.0, "{}"),
      (2L, t0, 101L, "purchase", 30.0, "{}"),
      (3L, t0, 102L, "click", 99.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val thresholds = {
      var acc = 0.0
      (0 to 5).map { k =>
        acc += math.exp(-1.0) / (1 to k).foldLeft(1L)(_ * _)
        math.floor(acc * 65536.0).toLong
      }
    }
    def u16(eid: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bs:$eid:$b".getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    def pois(u: Long): Long =
      thresholds.indexWhere(u < _) match { case -1 => 6L; case k => k.toLong }
    val pv = Seq((1L, JBD.valueOf(10.0).setScale(2)), (2L, JBD.valueOf(30.0).setScale(2)))
    val means = (0 until 200).flatMap { b =>
      var sw = 0L; var swv = JBD.ZERO
      pv.foreach { case (eid, vd) =>
        val w = pois(u16(eid, b))
        sw += w; swv = swv.add(vd.multiply(JBD.valueOf(w)))
      }
      if (sw > 0) Some(swv.doubleValue / sw) else None
    }.sorted
    assert(means.size < 200, "expected the tiny corpus to drop some replicas")
    def cutAt(rank40: Long): Double =
      means((((rank40 + 39) / 40) - 1).toInt) // smallest m with rk*40 >= rank40
    val ciLo = cutAt(means.size.toLong)
    val ciHi = cutAt(39L * means.size)
    val row = SparkEntry.queries("p108_poisson_bootstrap")(spark, dir).collect().head
    assert(row.getLong(0) == 2L && row.getLong(2) == 200L)
    assert(row.getDouble(1) == r6(20.0))
    assert(!row.isNullAt(3) && !row.isNullAt(4), row.toString)
    assert((row.getDouble(3), row.getDouble(4)) == ((r6(ciLo), r6(ciHi))),
      s"(${row.getDouble(3)}, ${row.getDouble(4)}) vs (${r6(ciLo)}, ${r6(ciHi)})")
  }

  test("p98: Welch t and df on purchase values equal the plain decimal-exact formula") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val ev = graft.queries.Q.t(spark, sf0001, "events")
      .select("user_id", "event_type", "value").collect()
      .filter(_.getString(1) == "purchase")
      .map(r => (r.getLong(0) % 2, JBD.valueOf(r.getDouble(2))
        .setScale(2, RM.HALF_UP)))
    val byArm = ev.groupBy(_._1).map { case (v, g) =>
      val sv = g.map(_._2).reduce(_.add(_))
      val sv2 = g.map(x => x._2.multiply(x._2)).reduce(_.add(_))
      v -> ((g.size.toLong, sv.doubleValue, sv2.doubleValue))
    }
    def stats(n: Long, sv: Double, sv2: Double): (Double, Double) = {
      val m = sv / n
      val s2 = (sv2 - (sv * sv) / n) / (n - 1)
      (m, s2 / n)
    }
    val (n0, sv0, sv20) = byArm(0); val (n1, sv1, sv21) = byArm(1)
    val (m0, vn0) = stats(n0, sv0, sv20); val (m1, vn1) = stats(n1, sv1, sv21)
    val se2 = vn0 + vn1
    val t = r6((m0 - m1) / math.sqrt(se2))
    val dfw = r6((se2 * se2) /
      ((vn0 * vn0) / (n0 - 1) + (vn1 * vn1) / (n1 - 1)))
    val row = SparkEntry.queries("p98_welch_ttest")(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((n0, n1)))
    assert((row.getDouble(2), row.getDouble(3)) == ((r6(m0), r6(m1))))
    assert((row.getDouble(4), row.getDouble(5)) == ((t, dfw)),
      s"(${row.getDouble(4)}, ${row.getDouble(5)}) vs ($t, $dfw)")
  }
}
