package graft

/** The tokenizer-training family (p66 unigram Viterbi, p67 WordPiece
  * greedy, p71 MaxSim, p72 Gear-CDC, p73 containment, p74 calibration,
  * p75 funnel) against the plain-Scala re-derivations — split from
  * SelectionFamilySpec so the test wall parallelizes across suites.
  */
class TokenizerFamilySpec extends SparkSpecBase with PlainScalaFixtures {

  test("p66b: Viterbi segmentations equal the plain-Scala re-derivation") {
    val (_, segs, freqs) = uniFit
    val got = SparkEntry.queries("p66b_unigram_segments")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { case (w, f, seg) =>
      assert(freqs(w) == f, s"freq mismatch for $w")
      assert(segs(w).mkString("|") == seg, s"segmentation drift for $w")
      // coverage invariant: pieces concatenate back to the word
      assert(seg.replace("|", "") == w, s"coverage broken for $w")
    }
  }

  test("p66: lexicon counts/scores and E-step usage equal plain Scala") {
    val (vocab, segs, freqs) = uniFit
    val used = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- freqs; p <- segs(w)) used(p) += f
    val got = SparkEntry.queries("p66_unigram_vocab")(spark, sf0001)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == vocab.size, s"${got.size} vs ${vocab.size}")
    vocab.foreach { case (p, (c, sc)) =>
      assert(got(p) == ((c, sc, used(p))), s"piece $p: ${got(p)} vs ($c, $sc, ${used(p)})")
    }
  }

  test("p67: greedy segmentations equal the plain-Scala re-derivation") {
    val (segs, freqs) = wpFit
    val got = SparkEntry.queries("p67_wordpiece_segments")(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { case (w, f, seg, n) =>
      assert(freqs(w) == f, s"freq mismatch for $w")
      assert(segs(w).mkString("|") == seg, s"greedy drift for $w: $seg")
      assert(segs(w).size == n, s"n_pieces mismatch for $w")
      // detokenization invariant: strip '##' marks, rejoin, recover w
      assert(seg.replace("|", "").replace("##", "") == w,
        s"lossless detok broken for $w")
    }
  }

  test("p67b: fertility histogram equals plain Scala") {
    val (segs, freqs) = wpFit
    val hist = scala.collection.mutable.Map
      .empty[Int, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    for ((w, f) <- freqs) {
      val n = segs(w).size
      val cont = segs(w).count(_.startsWith("##")).toLong
      val (a, b, c) = hist(n)
      hist(n) = (a + 1, b + f, c + f * cont)
    }
    val got = SparkEntry.queries("p67b_wordpiece_fertility")(spark, sf0001)
      .collect().map(r =>
        r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == hist.keySet, s"${got.keySet} vs ${hist.keySet}")
    hist.foreach { case (n, t) =>
      assert(got(n) == t, s"bucket $n: ${got(n)} vs $t")
    }
  }

  test("p71: MaxSim top-10 equals the plain-Scala late-interaction scoring") {
    def vec(tok: String): IndexedSeq[Long] =
      (1 to 8).map(j => md560(s"li_${tok}_$j") % 2001 - 1000)
    val qvs = Seq("spark", "vector", "merge").map(vec)
    def cos(a: IndexedSeq[Long], b: IndexedSeq[Long]): Double = {
      val ww = a.map(x => x * x).sum
      if (ww == 0L) 0.0
      else a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(ww.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val expect = corpus.map { case (id, text, _) =>
      val dvs = toks(text).distinct.map(vec)
      val ms = qvs.map(q => dvs.map(d => cos(d, q)).max)
      (id, ms.map(r6), r6(ms.sum))
    }.sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = SparkEntry.queries("p71_maxsim_rerank")(spark, sf0001).collect()
      .map(r => (r.getLong(0),
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)), r.getDouble(4)))
    assert(got.length == 10)
    expect.zip(got).foreach { case (e, g) => assert(e == g, s"$e vs $g") }
  }

  test("p73: containment dominates Jaccard and subsumes p02's high-overlap pairs") {
    val rows = SparkEntry.queries("p73_containment")(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getBoolean(7))))
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (inter, sza, szb, cont, jac, asym)) =>
      assert(a < b)
      assert(inter <= math.min(sza, szb), s"($a,$b)")
      // containment >= Jaccard algebraically (min <= union)
      assert(cont >= jac, s"($a,$b): $cont < $jac")
      assert(cont >= 0.7 && cont <= 1.0)
      assert(asym == (jac < 0.5), s"($a,$b)")
      // exact rational re-check of both ratios
      assert(cont == r6(inter.toDouble / math.min(sza, szb)))
      assert(jac == r6(inter.toDouble / (sza + szb - inter)))
    }
    // every p02 pair with jaccard >= 0.7 MUST reappear (containment >=
    // jaccard, same staged shingles): the two views agree on the overlap
    val strong = SparkEntry.queries("p02_dedup_ngram_jaccard")(spark, sf0001)
      .collect().filter(_.getDouble(2) >= 0.7)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mine = rows.map(_._1).toSet
    assert(strong.subsetOf(mine), s"missing: ${strong -- mine}")
  }

  test("p74: calibration bins are consistent with the p55 scoring front") {
    val bins = SparkEntry.queries("p74_lr_calibration")(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val sc = SparkEntry.queries("p55_lr_quality_select")(spark, sf0001).collect()
      .map(r => (r.getInt(1), r.getDouble(2)))
    // mass conservation: every scored doc lands in exactly one bin
    assert(bins.map(_._2).sum == sc.length.toLong)
    assert(bins.map(_._3).sum == sc.map(_._1.toLong).sum)
    bins.foreach { case (b, n, np, pred, obs, gap) =>
      assert(b >= 0 && b <= 9 && np <= n)
      assert(obs == r6(np.toDouble / n))
      assert(gap == r6(obs - pred))
      assert(pred >= 0.0 && pred <= 1.0)
      // the mean predicted rate lives in (or hugs) its bin
      assert(pred >= b / 10.0 - 1e-6 && pred <= (b + 1) / 10.0 + 1e-6, s"bin $b pred $pred")
    }
    // per-bin counts re-derived from the score column itself
    val expect = sc.groupBy { case (_, s0) =>
      math.min(9, math.max(0, math.floor(s0 * 10.0).toInt)) }
      .map { case (b, xs) => b -> (xs.size.toLong, xs.map(_._1.toLong).sum) }
    assert(bins.map(x => x._1 -> ((x._2, x._3))).toMap == expect)
  }

  test("p75: the funnel's stages equal the standalone entries' own flags") {
    // every per-doc flag re-derived from the oracle-pinned standalone
    // entries, then AND-folded — the funnel must report exactly these
    def q(name: String) = SparkEntry.queries(name)(spark, sf0001).collect()
    val f1 = q("p52_gopher_rules").map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    val f3 = q("p53_lm_perplexity").map(r => r.getLong(0) -> (r.getString(4) != "tail")).toMap
    val keepers = q("p01_dedup_exact").map(_.getLong(1)).toSet
    val f5 = q("p61_pareto_sample").map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // the C4 flag re-derived in plain Scala (p17 only reports per-source)
    val meta = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val f2 = corpus.map { case (id, text, _) =>
      val nTok = toks(text).length
      val atl = text.replace(" ", "").length.toDouble / nTok
      val pr = text.count(c => !c.isLetterOrDigit && c != ' ').toDouble / text.length
      val qual = (if (nTok >= 5 && nTok <= 1000) 0.4 else 0.0) +
        (if (atl >= 3.0 && atl <= 10.0) 0.3 else 0.0) +
        (if (pr < 0.1) 0.3 else 0.0)
      id -> (Seq("en", "es").contains(meta(id)) && nTok >= 10 && nTok <= 400 && qual >= 0.7)
    }.toMap
    val ids = corpus.map(_._1)
    def cnt(fs: (Long => Boolean)*): Long =
      ids.count(id => fs.forall(f => f(id))).toLong
    def g(m: Map[Long, Boolean])(id: Long) = m.getOrElse(id, false)
    val expect = Seq(
      (1, "gopher_rules", ids.size.toLong, cnt(g(f1))),
      (2, "c4_filter", cnt(g(f1)), cnt(g(f1), g(f2))),
      (3, "lm_tail_cut", cnt(g(f1), g(f2)), cnt(g(f1), g(f2), g(f3))),
      (4, "exact_dedup", cnt(g(f1), g(f2), g(f3)),
        cnt(g(f1), g(f2), g(f3), keepers.contains)),
      (5, "pareto_classifier", cnt(g(f1), g(f2), g(f3), keepers.contains),
        cnt(g(f1), g(f2), g(f3), keepers.contains, g(f5))))
    val got = q("p75_quality_funnel")
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expect, s"$got vs $expect")
  }

  test("p72: Gear-CDC stats equal the TRUE rolling-recurrence re-derivation") {
    // the plan computes the windowed closed form Σ_j G[c_{i-j}]·2^j; this
    // re-derivation runs the actual h = (h<<1) + G[b] recurrence over the
    // full prefix — they must agree under the mask (shifted-out bits
    // cannot reach the low 7), so a window-size or indexing drift breaks
    // here even though both engines agree with each other
    val gear = (0 until 256).map(c => md560(s"gear_$c") % 1048576L)
    val srcOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mod = 1L << 7
    def chunks(text: String): Seq[String] = {
      val n = text.length
      var h = 0L
      val cuts = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 1
      while (i <= n) {
        h = (h << 1) + gear(text.charAt(i - 1).toInt % 256)
        if (i >= 13 && i < n && (h % mod + mod) % mod == 0L) cuts += i
        i += 1
      }
      val starts = 1 +: cuts.map(_ + 1).toSeq
      val ends = cuts.toSeq :+ n
      starts.zip(ends).map { case (a, b) => text.substring(a - 1, b) }
    }
    val bySrc = corpus.flatMap { case (id, text, _) =>
      chunks(text).map(srcOf(id) -> _) }.groupBy(_._1)
    val expect = bySrc.map { case (src, cs) =>
      val all = cs.map(_._2)
      val uniq = all.groupBy(identity).toSeq
        .map { case (t, o) => (t.length.toLong, o.size.toLong) }
      src -> ((all.size.toLong, uniq.size.toLong,
        uniq.map { case (l, c) => c * l }.sum,
        uniq.map { case (l, c) => (c - 1) * l }.sum))
    }
    val got = SparkEntry.queries("p72_cdc_chunks")(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (src, e) => assert(got(src) == e, s"$src: ${got(src)} vs $e") }
  }
}
