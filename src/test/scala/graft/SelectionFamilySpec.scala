package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** The corpus quality & data-selection family (p52 Gopher rules, p53/p53b
  * CCNet-style LM perplexity, p54 DSIR importance resampling) re-derived by
  * an INDEPENDENT plain-Scala implementation over the same sf0.001 corpus:
  * driver-collected strings, Scala collections, Math.log — no Spark
  * expressions. Every row of every entry must agree exactly, so a drift in
  * tokenization, smoothing, scaling, hashing or tie-breaking anywhere in the
  * DataFrame plans breaks this suite even without the DuckDB oracle.
  */
class SelectionFamilySpec extends SparkSpecBase {

  private val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Spark round(col, 6) semantics: HALF_UP over the decimal string form. */
  private def r6(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** The sln() scaling: floor(ln(x)·1e8 + 0.5) as Long (Spark ln = Math.log). */
  private def sln(x: Long): Long =
    math.floor(math.log(x.toDouble) * 100000000.0 + 0.5).toLong

  /** The engine-portable 60-bit md5 hash (first 15 hex chars, base 16). */
  private def md560(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private lazy val corpus: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sortBy(_._1)

  private def toks(text: String): Array[String] = text.split(" ", -1)
  private def bigrams(text: String): Array[(String, String)] = {
    val a = toks(text)
    if (a.length < 2) Array.empty else a.zip(a.tail)
  }

  test("p52: every row equals the plain-Scala Gopher metrics") {
    val got = SparkEntry.queries("p52_gopher_rules")(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.size == corpus.size)
    corpus.foreach { case (id, text, _) =>
      val arr = toks(text)
      val n = arr.length.toLong
      val mwl = text.replace(" ", "").length.toDouble / n
      val stw = ((text.length - text.replace("#", "").length).toDouble +
        (text.length - text.replace("...", "").length).toDouble / 3.0) / n
      val alr = arr.count(w => w.exists(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toDouble / n
      val nStop = arr.count(stops.contains).toLong
      val pass = n >= 50 && n <= 100000 && mwl >= 3.0 && mwl <= 10.0 &&
        stw <= 0.1 && alr >= 0.8 && nStop >= 2
      assert(got(id) == ((n, r6(mwl), r6(stw), r6(alr), nStop, pass)), s"doc $id")
    }
  }

  /** The reference LM fitted in plain Scala: (c2, c1, V). */
  private lazy val lm: (Map[(String, String), Long], Map[String, Long], Long) = {
    val en = corpus.filter(_._3 == "en")
    val bg = en.flatMap(d => bigrams(d._2))
    val c2 = bg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = bg.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = en.flatMap(d => toks(d._2)).distinct.size.toLong
    (c2, c1, v)
  }

  test("p53: per-doc nll/oov/bucket equal the plain-Scala LM scoring") {
    val (c2, c1, v) = lm
    val perDoc = corpus.map { case (id, text, _) =>
      val bs = bigrams(text)
      val nls = bs.map { b =>
        sln(c1.getOrElse(b._1, 0L) + v) - sln(c2.getOrElse(b, 0L) + 1L)
      }.sum
      val nOov = bs.count(b => !c2.contains(b)).toLong
      (id, bs.length.toLong, r6(nOov.toDouble / bs.length),
        r6(nls.toDouble / 100000000.0 / bs.length))
    }
    val nd = perDoc.size
    val rank = perDoc.sortBy(d => (d._4, d._1)).zipWithIndex
      .map { case (d, i) => d._1 -> (i + 1) }.toMap
    val expect = perDoc.map { case (id, n, oov, nll) =>
      val rn = rank(id)
      val bucket = if (rn * 3 <= nd) "head"
        else if (rn * 3 <= nd * 2) "middle" else "tail"
      id -> ((n, oov, nll, bucket))
    }.toMap
    val got = SparkEntry.queries("p53_lm_perplexity")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getString(4)))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
  }

  test("p53b: the pinned model rows are exactly the Scala fit's top-100") {
    val (c2, c1, v) = lm
    val expect = c2.toSeq
      .map { case ((w1, w2), c) => (w1, w2, c, sln(c1(w1) + v) - sln(c + 1L)) }
      .sortBy { case (w1, w2, c, _) => (-c, w1, w2) }.take(100)
    val got = SparkEntry.queries("p53b_lm_model")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("p54: weights and selection equal the plain-Scala DSIR computation") {
    val b = queries.Pipeline.dsirBuckets
    def feats(text: String): Array[Long] =
      toks(text).map(w => md560(w) % b) ++
        bigrams(text).map(p => md560(p._1 + " " + p._2) % b)
    val all = corpus.map { case (id, text, lang) => (id, lang, feats(text)) }
    val tgt = all.filter(_._2 == "en").flatMap(_._3)
    val raw = all.flatMap(_._3)
    val ct = tgt.groupBy(identity).map { case (k, x) => k -> x.size.toLong }
    val cr = raw.groupBy(identity).map { case (k, x) => k -> x.size.toLong }
    val (nt, nr) = (tgt.size.toLong, raw.size.toLong)
    val lwt = cr.map { case (k, c) =>
      k -> (sln(ct.getOrElse(k, 0L) + 1L) - sln(nt + b) - sln(c + 1L) + sln(nr + b))
    }
    val perDoc = all.map { case (id, _, fs) =>
      (id, fs.length.toLong, r6(fs.map(lwt).sum.toDouble / 100000000.0 / fs.length))
    }
    val sel = perDoc.sortBy(d => (-d._3, d._1)).take(100).map(_._1).toSet
    val got = SparkEntry.queries("p54_dsir_select")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.size == perDoc.size)
    perDoc.foreach { case (id, n, w) =>
      assert(got(id) == ((n, w, sel.contains(id))), s"doc $id")
    }
  }

  /** The whole LR fit re-derived in plain Scala: hashed features,
    * integer-scaled tf, lrIters (12) rounds of integer-state GD. */
  private lazy val lrFit: (Map[Long, Long], Seq[(Long, Int, Long)]) = {
    val b = queries.Pipeline.dsirBuckets
    val eta = queries.Pipeline.lrEtaAt _
    def feats(text: String): Array[Long] =
      toks(text).map(w => md560(w) % b) ++
        bigrams(text).map(p => md560(p._1 + " " + p._2) % b)
    // (doc_id, y, Map(bucket -> scaled tf)) with the intercept bucket -1
    val docsF = corpus.map { case (id, text, lang) =>
      val fs = feats(text)
      val dl = fs.length
      val tf = fs.groupBy(identity).map { case (k, v) =>
        k -> math.floor(v.size.toDouble * 1000000.0 / dl + 0.5).toLong
      } + (-1L -> 1000000L)
      (id, if (lang == "en") 1 else 0, tf)
    }
    val n = docsF.size
    var wm = Map.empty[Long, Long].withDefaultValue(0L)
    (1 to queries.Pipeline.lrIters).foreach { it =>
      val pds = docsF.map { case (id, y, tf) =>
        val ms = tf.map { case (k, c) => c * wm(k) }.sum
        val p = 1.0 / (1.0 + math.exp(-(ms.toDouble / 100000000000000.0)))
        (id, math.floor((p - y) * 100000000.0 + 0.5).toLong)
      }.toMap
      val g = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      docsF.foreach { case (id, _, tf) =>
        tf.foreach { case (k, c) => g(k) += c * pds(id) }
      }
      g.foreach { case (k, gg) =>
        wm = wm.updated(k, wm(k) -
          math.floor(gg.toDouble / 1000000.0 / n * eta(it) + 0.5).toLong)
      }
    }
    val scores = docsF.map { case (id, y, tf) =>
      val ms = tf.map { case (k, c) => c * wm(k) }.sum
      (id, y, ms)
    }
    (wm.filter(_._2 != 0L), scores)
  }

  test("p55b: the staged LR weights equal the plain-Scala full-GD fit") {
    val (wm, _) = lrFit
    val got = SparkEntry.queries("p55b_lr_weights")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == wm,
      s"weight divergence: ${got.size} vs ${wm.size} non-zero weights")
  }

  test("LR fit: the dial-guarded driver path and the distributed path are bit-identical") {
    // the stage picks the driver loop under the row dial and the fused
    // per-round jobs above it; both must produce the same weight table
    // (exact integer state; same IEEE residual expression)
    val driver = queries.Pipeline.LrStage.fitWeights(spark, sf0001)
    val dist = queries.Pipeline.LrStage.fitWeights(spark, sf0001,
      forceDistributed = true)
    assert(driver == dist,
      s"path divergence: ${driver.size} vs ${dist.size} weights")
  }

  test("p55: scores and top-k selection equal the plain-Scala scoring") {
    val (_, scores) = lrFit
    val expect = scores.map { case (id, y, ms) =>
      (id, y, r6(1.0 / (1.0 + math.exp(-(ms.toDouble / 100000000000000.0)))))
    }
    val sel = expect.sortBy(d => (-d._3, d._1)).take(100).map(_._1).toSet
    val got = SparkEntry.queries("p55_lr_quality_select")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (id, y, s) =>
      assert(got(id) == ((y, s, sel.contains(id))), s"doc $id")
    }
    // the classifier must LIFT the reference class in its selection
    val base = expect.count(_._2 == 1).toDouble / expect.size
    val inSel = expect.filter(e => sel.contains(e._1)).count(_._2 == 1) / 100.0
    assert(inSel > base,
      s"selection precision $inSel must beat the base rate $base")
  }

  test("p61: Pareto-threshold sampling equals the plain-Scala mechanism and favors high scores") {
    val (_, scores) = lrFit
    val expect = scores.map { case (id, y, ms) =>
      val score = r6(1.0 / (1.0 + math.exp(-(ms.toDouble / 100000000000000.0))))
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map(b => f"${b & 0xff}%02x").mkString
      val u = java.lang.Integer.parseInt(h, 16).toDouble / 65536.0
      val x = math.pow(1.0 - u, -1.0 / 9.0) - 1.0
      id -> ((y, score, r6(x), x > 1.0 - score))
    }.toMap
    val got = SparkEntry.queries("p61_pareto_sample")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // the mechanism's closed form: P(keep | score s) = (2 - s)^-9, so
    // the realized keep rate must sit within binomial noise of the
    // per-doc expectation (deterministic given the fixed corpus)
    val vals = expect.values.toSeq
    val expKeep = vals.map(v => math.pow(2.0 - v._2, -9.0)).sum / vals.size
    val gotKeep = vals.count(_._4).toDouble / vals.size
    val sd = math.sqrt(expKeep * (1 - expKeep) / vals.size)
    assert(math.abs(gotKeep - expKeep) < 4 * sd,
      s"keep rate $gotKeep vs Lomax expectation $expKeep (sd $sd)")
    assert(vals.exists(_._4) && vals.exists(!_._4))
  }

  test("p55c: the one-cut sketch selects near-100 docs, overwhelmingly inside the exact top-100") {
    val r = SparkEntry.queries("p55c_lr_select_sketch")(spark, sf0001).collect()
    assert(r.length == 1)
    val (cut, nSel, nAgree) =
      (r(0).getDouble(0), r(0).getLong(1), r(0).getLong(2))
    assert(cut > 0.0 && cut < 1.0)
    // the threshold form targets k=100; interpolation in a dense
    // boundary bucket trades recall for precision, never the reverse
    assert(nSel > 0 && nSel <= 150, s"selected $nSel")
    assert(nAgree.toDouble / nSel >= 0.9,
      s"sketch precision $nAgree/$nSel vs the exact top-100")
  }

  test("p55 scores against the STAGED weight table (fit-once discipline)") {
    val p = SparkEntry.queries("p55_lr_quality_select")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("lr[0-9a-f]{6}_".r.findFirstIn(p).isDefined,
      s"p55 must scan the staged lr weights:\n$p")
  }

  test("p53c: sketch cut-points bucket nearly all docs like the exact terciles") {
    val r = SparkEntry.queries("p53c_lm_buckets_sketch")(spark, sf0001).collect()
    assert(r.length == 1)
    val row = r(0)
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    assert(lo <= hi, s"$lo > $hi")
    val (nh, nm, nt, agree) =
      (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    val total = nh + nm + nt
    assert(total == corpus.size)
    // threshold buckets from a 1024-bucket histogram must track the
    // exact global-rank terciles on ≥ 90% of documents
    assert(agree.toDouble / total >= 0.9, s"agreement $agree/$total")
    // and each sketch bucket must hold roughly a third (±20% absolute)
    Seq(nh, nm, nt).foreach(n =>
      assert(math.abs(n.toDouble / total - 1.0 / 3) < 0.2, s"$nh/$nm/$nt"))
  }

  test("p56: temperature weights equal the plain-Scala computation and up-weight minorities") {
    val byLang = corpus.groupBy(_._3).map { case (l, ds) => l -> ds.size.toLong }
    val nt = corpus.size.toLong
    val pa = byLang.map { case (l, n) =>
      l -> math.floor(math.pow(n.toDouble / nt, 0.3) * 1000000000000.0 + 0.5).toLong
    }
    val spa = pa.values.sum
    val expect = byLang.keys.toSeq.sorted.map { l =>
      val (n, a) = (byLang(l), pa(l))
      (l, n, r6(n.toDouble / nt), r6(a.toDouble / spa),
        r6((a.toDouble / spa) / (n.toDouble / nt)))
    }
    val got = SparkEntry.queries("p56_temperature_mix")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expect)
    // α < 1 up-weights minority languages, down-weights the majority
    val maxLang = byLang.maxBy(_._2)._1
    got.foreach { case (l, _, _, _, boost) =>
      if (l == maxLang) assert(boost < 1.0) else assert(boost > 1.0, l)
    }
  }

  test("plan shapes: p52 is map-only; p53/p54 join only by broadcast") {
    val p52 = SparkEntry.queries("p52_gopher_rules")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p52.contains("Join"), s"p52 must not join:\n$p52")
    assert(!p52.contains("HashAggregate"), s"p52 must not aggregate:\n$p52")
    Seq("p53_lm_perplexity", "p53b_lm_model", "p54_dsir_select").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin"),
        s"$q: vocabulary/bucket-bounded sides must broadcast, not sort-merge:\n$p")
    }
  }

  /** The unigram tokenizer (p66/p66b) re-derived in plain Scala: piece
    * counting, top-200+chars lexicon, sln scores, the exact Viterbi DP
    * with the COALESCE-to-sentinel miss rule and smallest-start
    * tie-break, and the back-walk. */
  private lazy val uniFit
      : (Map[String, (Long, Long)], Map[String, Seq[String]], Map[String, Long]) = {
    val words = corpus.flatMap(_._2.toLowerCase.split(" ", -1))
      .filter(w => w.matches("[a-z]+") && w.length <= 12)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val cnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      cnt(w.substring(i, i + l)) += f
    val top = cnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(200)
    val vocab = (top ++ cnt.filter(_._1.length == 1)).toMap
    val tot = vocab.values.sum
    val score = vocab.map { case (p, c) => p -> (sln(c) - sln(tot)) }
    val SENT = -1000000000000000L
    def segment(w: String): Seq[String] = {
      val L = w.length
      val best = Array.fill(L + 1)(0L)
      val bp = Array.fill(L + 1)(-1)
      for (j <- 1 to L) {
        var bs = Long.MinValue; var bi = -1
        for (i <- math.max(0, j - 4) until j) {
          val c = score.get(w.substring(i, j)) match {
            case Some(sc) => best(i) + sc
            case None => SENT
          }
          if (c > bs) { bs = c; bi = i }
        }
        best(j) = bs; bp(j) = bi
      }
      val out = scala.collection.mutable.Buffer.empty[String]
      var e = L
      while (e > 0) { val s0 = bp(e); out.prepend(w.substring(s0, e)); e = s0 }
      out.toSeq
    }
    val segs = words.keys.map(w => w -> segment(w)).toMap
    val used = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- words; p <- segs(w)) used(p) += f
    (vocab.map { case (p, c) => p -> ((c, score(p))) }, segs,
      words.map { case (w, f) => w -> f })
  }

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

  /** The WordPiece tokenizer (p67/p67b) re-derived in plain Scala:
    * position-classed piece counting, top-200+chars lexicon with the
    * (cnt DESC, p, init) tie order, and the greedy longest-match walk
    * with '##' continuation marking. */
  private lazy val wpFit: (Map[String, Seq[String]], Map[String, Long]) = {
    val words = corpus.flatMap(_._2.toLowerCase.split(" ", -1))
      .filter(w => w.matches("[a-z]+") && w.length <= 12)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val cnt = scala.collection.mutable.Map
      .empty[(String, Int), Long].withDefaultValue(0L)
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      cnt((w.substring(i, i + l), if (i == 0) 1 else 0)) += f
    val top = cnt.toSeq
      .sortBy { case ((p, init), c) => (-c, p, init) }.take(200).map(_._1)
    val vocab = (top ++ cnt.keys.filter(_._1.length == 1)).toSet
    def segment(w: String): Seq[String] = {
      val out = scala.collection.mutable.Buffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val init = if (pos == 0) 1 else 0
        val l = (math.min(4, w.length - pos) to 1 by -1)
          .find(l => vocab((w.substring(pos, pos + l), init))).get
        out += (if (pos == 0) "" else "##") + w.substring(pos, pos + l)
        pos += l
      }
      out.toSeq
    }
    (words.keys.map(w => w -> segment(w)).toMap, words)
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

  test("p70: the Hedge trajectory equals the plain-Scala MWU re-derivation") {
    val (c2, c1, v) = lm
    val srcOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = corpus.flatMap { case (id, text, _) =>
      val bs = bigrams(text)
      if (bs.isEmpty) None
      else Some((id, srcOf(id),
        bs.map(b => sln(c1.getOrElse(b._1, 0L) + v) -
          sln(c2.getOrElse(b, 0L) + 1L)).sum,
        bs.length.toLong))
    }
    // per-(shard, source) floor-div mean loss, per-round per-mille vs max
    val rt = perDoc.groupBy(d => (d._1 % 6, d._2)).map { case (k, ds) =>
      k -> ds.map(_._3).sum / ds.map(_._4).sum
    }
    val shards = rt.keys.map(_._1).toSeq.distinct.sorted
    val lmax = shards.map(t => t -> rt.collect {
      case ((`t`, _), l) => l }.max).toMap
    val sources = srcOf.values.toSeq.distinct.sorted
    val mpm = (for { t <- shards; s0 <- sources } yield
      (t, s0) -> rt.getOrElse((t, s0), lmax(t)) * 1000L /
        math.max(lmax(t), 1L)).toMap
    // the exact-integer MWU fold, one prefix per round
    val wMap = sources.map { s0 =>
      val fs = shards.map(t => 1000000L - 300L * mpm((t, s0)))
      s0 -> (1 to 6).map(t =>
        fs.take(t).foldLeft(1000000000000L)((a, b) => a * b / 1000000L))
    }.toMap
    val rows = SparkEntry.queries("p70_hedge_mix")(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.size == shards.size * sources.size, rows.size.toString)
    (1 to 6).filter(t => shards.contains((t - 1).toLong)).foreach { t =>
      val sw = sources.map(s0 => wMap(s0)(t - 1)).sum
      sources.foreach { s0 =>
        val e = (mpm(((t - 1).toLong, s0)), wMap(s0)(t - 1),
          r6(wMap(s0)(t - 1).toDouble / sw))
        assert(rows((t, s0)) == e, s"t=$t src=$s0: ${rows((t, s0))} vs $e")
      }
    }
    // weights per round are a distribution up to readout rounding
    (1 to 6).foreach { t =>
      val ws = rows.collect { case ((`t`, _), (_, _, wr)) => wr }
      assert(math.abs(ws.sum - 1.0) < 1e-4, s"round $t sums ${ws.sum}")
    }
  }

  test("p78: Kneser-Ney doc scores equal the plain-Scala re-derivation; " +
    "the smoothed distribution normalizes EXACTLY per context") {
    // independent model fit over the English slice, plain collections
    val ref = corpus.filter(_._3 == "en")
    val refBigs = ref.flatMap { case (_, text, _) => bigrams(text) }
    val c2 = refBigs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = refBigs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1v = c2.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1w = c2.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val vocab = ref.flatMap { case (_, text, _) => toks(text) }.distinct
    val dd = c2.size.toLong + vocab.size.toLong
    def num(w1: String, w2: String): Long =
      math.max(4L * c2.getOrElse((w1, w2), 0L) - 3L, 0L) * dd +
        3L * n1v(w1) * (n1w.getOrElse(w2, 0L) + 1L)
    def nls(w1: String, w2: String): Long = c1.get(w1) match {
      case None => sln(dd) - sln(n1w.getOrElse(w2, 0L) + 1L)
      case Some(cc1) => sln(4L * dd * cc1) - sln(num(w1, w2))
    }
    val expected = corpus.flatMap { case (id, text, _) =>
      val bs = bigrams(text)
      if (bs.isEmpty) None else {
        val n = bs.length.toLong
        val oov = bs.count { case (w1, _) => !c1.contains(w1) }.toLong
        val s = bs.map { case (w1, w2) => nls(w1, w2) }.sum
        Some(id -> ((n, oov, r6(oov.toDouble / n), r6(s.toDouble / 1e8 / n))))
      }
    }.toMap
    val got = SparkEntry.queries("p78_kn_perplexity")(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected,
      s"${got.size} vs ${expected.size}; diff=${
        (got.keySet | expected.keySet).find(k => got.get(k) != expected.get(k))}")
    // KN with the add-one continuation distribution is a PROPER
    // distribution: for every seen context, the integer numerators over
    // the whole reference vocabulary sum to exactly the denominator
    // 4·D·c1 (sum of (n1w+1) over the vocab = B + V = D by construction)
    c1.foreach { case (w1, cc1) =>
      val mass = vocab.iterator.map(w2 => num(w1, w2)).sum
      assert(mass == 4L * dd * cc1, s"context $w1: $mass != ${4L * dd * cc1}")
    }
    // unseen-context arm too: sum over vocab of (n1w+1) = D exactly
    assert(vocab.iterator.map(w2 => n1w.getOrElse(w2, 0L) + 1L).sum == dd)
    // and the surfaced model table (p78b) matches the same fit
    val model = SparkEntry.queries("p78b_kn_model")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(model.keySet == c1.keySet)
    c1.foreach { case (w1, cc1) =>
      assert(model(w1) ==
        ((cc1, n1v(w1), r6((3L * n1v(w1)).toDouble / (4L * cc1)))), w1)
    }
  }

  test("p80: the integer PageRank trajectory equals a plain-Scala walk " +
    "over the pinned p02 edge set; isolated docs sit at the damping floor") {
    // edges re-read from p02's already-oracle-pinned output (NOT from
    // p80's own plan), symmetrized; 5 exact-integer damping rounds
    val pairs = SparkEntry.queries("p02_dedup_ngram_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges: Seq[(Long, Long)] =
      pairs.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg: Map[Long, Long] =
      edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = corpus.map(_._1)
    var rank: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val mass: Map[Long, Long] = edges
        .map { case (src, dst) => dst -> rank(src) / deg(src) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      rank = nodes.map(n => n -> (150000L + 85L * mass.getOrElse(n, 0L) / 100L)).toMap
    }
    val got = SparkEntry.queries("p80_lexrank")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { n =>
      assert(got(n) == ((deg.getOrElse(n, 0L), rank(n))),
        s"doc $n: ${got(n)} vs (${deg.getOrElse(n, 0L)}, ${rank(n)})")
    }
    // no in-edges => rank is exactly the damping floor, every round
    nodes.filterNot(deg.contains).foreach { n =>
      assert(got(n)._2 == 150000L, s"isolated doc $n")
    }
    // the damping floor is a universal lower bound
    nodes.foreach(n => assert(got(n)._2 >= 150000L, s"doc $n below floor"))
  }

  test("p85: every pairwise JS divergence equals the plain-Scala " +
    "re-derivation; scores live in [0,1] and p85b picks the argmin") {
    val bkts = graft.queries.Pipeline.dsirBuckets
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // counts per (source, bucket) and totals, plain collections
    val cnt: Map[(String, Long), Long] = rows
      .flatMap { case (src, text) =>
        toks(text).map(w => (src, md560(w) % bkts)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tot: Map[String, Long] =
      cnt.groupBy(_._1._1).map { case (s0, m) => s0 -> m.values.sum }
    val srcs = tot.keys.toSeq.sorted
    // ordered-direction exact-integer KL sums
    def sOrd(a: String, b: String): Long = {
      val (ta, tb) = (tot(a), tot(b))
      cnt.collect { case ((`a`, bk), na) =>
        val nb = cnt.getOrElse((b, bk), 0L)
        na * (sln(2L * na * tb) - sln(na * tb + nb * ta))
      }.sum
    }
    val expected = (for {
      a <- srcs; b <- srcs if a < b
    } yield (a, b) -> ((tot(a), tot(b), r6(
      (sOrd(a, b).toDouble / tot(a) + sOrd(b, a).toDouble / tot(b)) /
        (2.0 * math.log(2.0) * 100000000.0))))).toMap
    val got = SparkEntry.queries("p85_source_divergence")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expected, s"${got.size} vs ${expected.size}; diff=${
      (got.keySet | expected.keySet).find(k => got.get(k) != expected.get(k))}")
    // JS normalized by ln 2 is bounded: [0, 1] (integer rounding slack)
    got.values.foreach { case (_, _, js) =>
      assert(js >= -1e-6 && js <= 1.0 + 1e-6, js.toString)
    }
    // p85b: for each source, the (js, name)-min over its row+column
    val nn = SparkEntry.queries("p85b_source_neighbors")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(nn.keySet == srcs.toSet)
    srcs.foreach { s0 =>
      val cands = expected.collect {
        case ((a, b), (_, _, js)) if a == s0 => (js, b)
        case ((a, b), (_, _, js)) if b == s0 => (js, a)
      }.toSeq.sorted
      assert(nn(s0) == ((cands.head._2, cands.head._1)), s0)
    }
  }

  test("p81: fingerprints and pairs equal the plain-Scala winnowing " +
    "re-derivation; each fingerprint set is a sub-sample of the doc's grams") {
    val w = 4
    // plain-Scala winnowing: positional 3-gram hashes, window minima
    val fps: Map[Long, Set[Long]] = corpus.flatMap { case (id, text, _) =>
      val arr = toks(text)
      if (arr.length < 3) None else {
        val hs = (0 to arr.length - 3)
          .map(i => md560(s"${arr(i)} ${arr(i + 1)} ${arr(i + 2)}"))
        val mins = (0 to hs.length - w).map(p => hs.slice(p, p + w).min)
        Some(id -> mins.toSet)
      }
    }.toMap
    val nDocs = corpus.size.toLong
    val dfCap = math.max(5.0, nDocs * 0.01)
    val dfm = fps.toSeq.flatMap(_._2.toSeq).groupBy(identity)
      .map { case (h, v) => h -> v.size.toLong }
    val kept: Map[Long, Set[Long]] = fps.map { case (id, s0) =>
      id -> s0.filter(h => dfm(h).toDouble <= dfCap)
    }
    val expected = (for {
      (a, sa) <- kept.toSeq; (b, sb) <- kept.toSeq
      if a < b
      shared = (sa & sb).size.toLong
      if shared > 0
      score = shared.toDouble / math.min(sa.size, sb.size)
      if score >= 0.5
    } yield (a, b) -> ((shared, sa.size.toLong, sb.size.toLong, r6(score)))).toMap
    val got = SparkEntry.queries("p81_winnow_dedup")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == expected, s"${got.size} vs ${expected.size}; diff=${
      (got.keySet | expected.keySet).find(k => got.get(k) != expected.get(k))}")
    // the winnowing density property: every fingerprint is one of the
    // doc's own gram hashes, and there are at most #windows of them —
    // in expectation 2/(w+1) of the grams (MOSS, SIGMOD 2003 §4)
    corpus.foreach { case (id, text, _) =>
      val arr = toks(text)
      if (arr.length >= 3 + w - 1) {
        val grams = (0 to arr.length - 3)
          .map(i => md560(s"${arr(i)} ${arr(i + 1)} ${arr(i + 2)}")).toSet
        assert(fps(id).subsetOf(grams), s"doc $id")
        assert(fps(id).size <= arr.length - 3 - w + 2, s"doc $id")
      }
    }
  }

  test("p86/p86b: lexical stats and the Zipf OLS equal the plain-Scala " +
    "re-derivation; entropy <= log2(types) and slopes are negative") {
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val wc: Map[String, Map[String, Long]] = rows.groupBy(_._1).map {
      case (src, v) =>
        src -> v.flatMap(t => toks(t._2)).groupBy(identity)
          .map { case (w, o) => w -> o.size.toLong }
    }
    val got = SparkEntry.queries("p86_lexical_stats")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == wc.keySet)
    wc.foreach { case (src, m) =>
      val t = m.values.sum
      val hs = sln(t) * t - m.values.map(n => n * sln(n)).sum
      val ent = r6(hs.toDouble / (t.toDouble * 1e8 * math.log(2.0)))
      val simp = r6(m.values.map(n => n * (n - 1)).sum.toDouble /
        (t.toDouble * math.max(t - 1, 1)))
      assert(got(src) ==
        ((t, m.size.toLong, r6(m.size.toDouble / t), ent, simp)), src)
      // Shannon bound: H <= log2(V), equality iff uniform
      assert(ent <= math.log(m.size.toDouble) / math.log(2.0) + 1e-6, src)
      assert(got(src)._3 <= 1.0 + 1e-9)
    }
    // Zipf: OLS over the top-256 by (freq desc, word asc), exact sums
    val zg = SparkEntry.queries("p86b_zipf_fit")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    wc.foreach { case (src, m) =>
      val top = m.toSeq.sortBy { case (w, n) => (-n, w) }.take(256)
      val xy = top.zipWithIndex.map { case ((_, n), i) =>
        (sln(i + 1L) / 1000L, sln(n) / 1000L) }
      val r = xy.size.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxx = xy.map(p => p._1 * p._1).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val syy = xy.map(p => p._2 * p._2).sum
      val num = r * sxy - sx * sy
      val den = r * sxx - sx * sx
      val slope = r6(num.toDouble / den.toDouble)
      val r2 = r6(num.toDouble * num.toDouble /
        (den.toDouble * (r * syy - sy * sy).toDouble))
      assert(zg(src) == ((r, slope, r2)), s"$src: ${zg(src)} vs ($r, $slope, $r2)")
      // rank-frequency law: frequency falls with rank
      assert(slope < 0.0, src)
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, src)
    }
  }

  test("p87: excess losses equal the plain-Scala two-model re-derivation; " +
    "kept is exactly the top quarter") {
    def fit(sel: Seq[(Long, String, String)])
        : (Map[(String, String), Long], Map[String, Long], Long) = {
      val bs = sel.flatMap { case (_, t, _) => bigrams(t) }
      (bs.groupBy(identity).map { case (k, v) => k -> v.size.toLong },
        bs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong },
        sel.flatMap { case (_, t, _) => toks(t) }.distinct.size.toLong)
    }
    val (rc2, rc1, rv) = fit(corpus.filter(_._3 == "en"))
    val (ac2, ac1, av) = fit(corpus)
    def nllSum(t: String, c2: Map[(String, String), Long],
        c1: Map[String, Long], v: Long): Long =
      bigrams(t).map { case (w1, w2) =>
        sln(c1.getOrElse(w1, 0L) + v) - sln(c2.getOrElse((w1, w2), 0L) + 1L)
      }.sum
    val per = corpus.flatMap { case (id, t, _) =>
      val n = bigrams(t).length.toLong
      if (n == 0) None else {
        val rs = nllSum(t, rc2, rc1, rv)
        val cs = nllSum(t, ac2, ac1, av)
        Some(id -> ((n, r6(rs.toDouble / 1e8 / n), r6(cs.toDouble / 1e8 / n),
          r6((cs - rs).toDouble / 1e8 / n))))
      }
    }.toMap
    val nd = per.size.toLong
    val ranked = per.toSeq.sortBy { case (id, (_, _, _, ex)) => (-ex, id) }
    val keptIds = ranked.zipWithIndex
      .filter { case (_, i) => (i + 1).toLong * 4 <= nd }.map(_._1._1).toSet
    val got = SparkEntry.queries("p87_excess_loss")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got.size == per.size)
    per.foreach { case (id, (n, nr, nc, ex)) =>
      assert(got(id) == ((n, nr, nc, ex, keptIds.contains(id))),
        s"doc $id: ${got(id)} vs ($n, $nr, $nc, $ex, ${keptIds.contains(id)})")
    }
    // the keep budget is exactly floor(nd/4)
    assert(got.values.count(_._5).toLong == nd / 4)
    // the excess identity holds row-by-row on the rounded columns too
    got.values.foreach { case (_, nr, nc, ex, _) =>
      assert(math.abs((nc - nr) - ex) < 2e-6, s"$nc - $nr != $ex")
    }
  }

  test("p90: Borda fusion equals the re-ranking of the three pinned " +
    "signals; ranks are permutations and the keep budget is floor(n/4)") {
    def scores(name: String, idCol: Int, scoreCol: Int): Map[Long, Double] =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(r => r.getLong(idCol) -> r.getDouble(scoreCol)).toMap
    val q = scores("p09_quality_score", 0, 4)
    val l = scores("p55_lr_quality_select", 0, 2)
    val f = scores("p82_readability", 0, 4)
    def rk(m: Map[Long, Double]): Map[Long, Long] =
      m.toSeq.sortBy { case (id, v) => (v, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val (rq, rl, rf) = (rk(q), rk(l), rk(f))
    val borda = q.keys.map(id => id -> (rq(id) + rl(id) + rf(id))).toMap
    val nd = borda.size.toLong
    val keptIds = borda.toSeq.sortBy { case (id, b) => (-b, id) }
      .zipWithIndex.filter { case (_, i) => (i + 1).toLong * 4 <= nd }
      .map(_._1._1).toSet
    val got = SparkEntry.queries("p90_quality_fusion")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.size == borda.size)
    borda.keys.foreach { id =>
      assert(got(id) == ((rq(id), rl(id), rf(id), borda(id),
        keptIds.contains(id))), s"doc $id: ${got(id)}")
    }
    // each rank column is a permutation of 1..n
    Seq(got.values.map(_._1), got.values.map(_._2), got.values.map(_._3))
      .foreach(c => assert(c.toSeq.sorted == (1L to nd).toSeq))
    assert(got.values.count(_._5).toLong == nd / 4)
  }
}
