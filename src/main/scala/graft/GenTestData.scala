package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic testdata generator for scales the driver does not ship.
  *
  * The driver provides sf0.001/0.01/0.1 (TESTDATA.md, seed=42, read-only);
  * the r15 verdict's #1 ask is to run the full gates at sf1 — 10× sf0.1 —
  * and its #2 ask is an adversarial skewed corpus. Both need a generator.
  * This one mirrors the driver tables' schemas, value domains and
  * categorical sets exactly (verified against the shipped parquet: region
  * names, Brand#N, order priorities, 30-word document vocabulary, 64-dim
  * unit-norm embeddings, `{"k": N}` event props), so every literal
  * predicate in the 184 oracle entries keeps selecting real rows at sf1.
  *
  * Correctness at any scale is self-contained: the oracle gate compares
  * Spark vs DuckDB over the SAME generated parquet, so the gate's validity
  * never depends on matching the driver's RNG — only the distributions
  * matter, and those are matched.
  *
  * Design rules (the same ones the engine is graded on):
  *  - fully distributed: `spark.range(n)` + column expressions only; no
  *    driver-side row synthesis, no RNG state — every value is a
  *    deterministic `xxhash64(id, salt)` function of the row id, so the
  *    output is identical for any partitioning and any cluster size;
  *  - write-side partitioning: one file for dimension tables, core-count
  *    files for facts, so downstream scans start embarrassingly parallel;
  *  - PHYSICAL TYPES mirror the driver parquet exactly: decimal literals
  *    inside expr() strings silently promote money columns to
  *    DECIMAL(32,2) (Spark SQL parses `0.1` as decimal) while the driver
  *    ships DOUBLE — the r16 sf1 gate caught 6 dtype-canon mismatches on
  *    numerically equal values, so every money/value column is cast
  *    explicitly.
  *
  * Usage:
  *   runMain graft.GenTestData <outDir> <sf>            # e.g. 1.0
  *   runMain graft.GenTestData <outDir> <sf> adversarial
  *
  * Adversarial mode (r15 verdict #2) reshapes `documents` only — the
  * dedup/pair/CC/p91 stress surface — and keeps every other table at the
  * given sf:
  *  - Zipf(1) source mix over src0..src19 instead of uniform;
  *  - ~56% of docs are near-duplicates in 65 clusters of 430 (one varied
  *    token per doc; sizing rationale at the cluster constants below),
  *    so the CC edge front (6.0M > ccDriverMaxEdges=5M) and the
  *    jaccard>=0.3 front (6.0M > broadcastFrontMaxRows=1M) fire their
  *    scale guards ORGANICALLY at default dials;
  *  - one pathological mega-doc (~100k tokens vs the ~55-token mean).
  */
object GenTestData {

  private val vocab = Seq("spark", "window", "merge", "table", "column",
    "vector", "stream", "value", "data", "small", "join", "filter", "big",
    "group", "hash", "customer", "sort", "order", "slow", "line", "part",
    "fast", "the", "row", "agg", "key", "query", "a", "scan", "batch")

  private def vocabArr = array(vocab.map(lit): _*)

  /** Uniform double in [0,1) from (id, salt) — deterministic, codegen'd. */
  private def u(idCol: String, salt: Int) =
    expr(s"pmod(xxhash64($idCol, $salt), 1000000) / 1000000.0")

  /** Uniform int in [0, n) from (id, salt). */
  private def ui(idCol: String, salt: Int, n: Long) =
    expr(s"cast(pmod(xxhash64($idCol, $salt), $n) as int)")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenTestData <outDir> <sf> [adversarial]")
    val out = args(0)
    val sf = args(1).toDouble
    val adversarial = args.length > 2 && args(2) == "adversarial"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-gen"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def n(base: Long): Long = math.max(1L, (base * sf).round)
    def write(df: DataFrame, name: String, files: Int = 1): Unit = {
      val parts = if (files <= 1) df.coalesce(1) else df.repartition(files)
      // 8 MiB row groups (default 128 MiB): the driver-shipped testdata
      // is single-row-group files, so every scan is ONE split no matter
      // what maxPartitionBytes says and corpus-scale explodes needed a
      // healing repartition (the explodeSpread dial). Generated data
      // should scan the way production input would — multiple row
      // groups per file, so splits carry the parallelism naturally
      // (r17 verdict #2 / r18 brief). Values are unaffected: layout
      // only.
      parts.write.mode("overwrite")
        .option("parquet.block.size", (8 << 20).toString)
        .parquet(s"$out/$name.parquet")
      println(s"[gen] $name -> $out/$name.parquet")
    }

    // ---- dimension tables ------------------------------------------------
    import spark.implicits._
    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")

    write(spark.range(25).select(
      $"id".cast("int").as("n_nationkey"),
      concat(lit("NATION_"), $"id").as("n_name"),
      ($"id" % 5).cast("int").as("n_regionkey")), "nation")

    val nCust = n(150000)
    write(spark.range(nCust).select(
      $"id".as("c_custkey"),
      format_string("Customer#%09d", $"id").as("c_name"),
      ui("id", 1, 25).as("c_nationkey"),
      round(u("id", 2) * 11000 - 1000, 2).cast("double").as("c_acctbal"),
      element_at(array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
        lit("HOUSEHOLD"), lit("MACHINERY")), ui("id", 3, 5) + 1)
        .as("c_mktsegment")), "customer")

    val nSupp = n(10000)
    write(spark.range(nSupp).select(
      $"id".as("s_suppkey"),
      format_string("Supplier#%09d", $"id").as("s_name"),
      ui("id", 4, 25).as("s_nationkey"),
      round(u("id", 5) * 10000, 2).cast("double").as("s_acctbal")), "supplier")

    val nPart = n(200000)
    write(spark.range(nPart).select(
      $"id".as("p_partkey"),
      concat_ws(" ",
        element_at(array(lit("small"), lit("red"), lit("blue"), lit("green"),
          lit("large"), lit("round"), lit("steel"), lit("matte")), ui("id", 6, 8) + 1),
        element_at(array(lit("ring"), lit("widget"), lit("bolt"), lit("gear"),
          lit("pin"), lit("cog"), lit("plate"), lit("tube")), ui("id", 7, 8) + 1))
        .as("p_name"),
      concat(lit("Brand#"), (ui("id", 8, 25) + 1)).as("p_brand"),
      element_at(array(lit("ECONOMY"), lit("LARGE"), lit("MEDIUM"),
        lit("PROMO"), lit("SMALL"), lit("STANDARD")), ui("id", 9, 6) + 1)
        .as("p_type"),
      (ui("id", 10, 50) + 1).as("p_size"),
      round(lit(900.0) + $"id" * 0.1, 2).cast("double").as("p_retailprice")), "part",
      files = if (sf >= 1) 4 else 1)

    // ---- facts -----------------------------------------------------------
    val nOrders = n(1500000)
    val orders = spark.range(nOrders).select(
      $"id".as("o_orderkey"),
      expr(s"pmod(xxhash64(id, 11), $nCust)").as("o_custkey"),
      element_at(array(lit("F"), lit("O"), lit("P")), ui("id", 12, 3) + 1)
        .as("o_orderstatus"),
      round(u("id", 13) * 499000 + 1000, 2).cast("double").as("o_totalprice"),
      expr("timestamp'1995-01-01 00:00:00' + make_interval(0,0,0, cast(pmod(xxhash64(id, 14), 2404) as int), 0,0,0)")
        .as("o_orderdate"),
      element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW")), ui("id", 15, 5) + 1)
        .as("o_orderpriority"))
    write(orders, "orders", files = math.max(1, (8 * sf).toInt))

    // ~4 lines per order via per-order explode(sequence(1, 1+hash%7)):
    // total ≈ 4.0 × orders, linenumber dense 1..k like the driver's.
    val lineitem = spark.range(nOrders)
      .select($"id".as("l_orderkey"),
        explode(expr("sequence(1, cast(1 + pmod(xxhash64(id, 16), 7) as int))"))
          .as("l_linenumber"))
      .select(
        $"l_orderkey",
        expr(s"pmod(xxhash64(l_orderkey, l_linenumber, 17), $nPart)").as("l_partkey"),
        expr(s"pmod(xxhash64(l_orderkey, l_linenumber, 18), $nSupp)").as("l_suppkey"),
        $"l_linenumber",
        expr("cast(1 + pmod(xxhash64(l_orderkey, l_linenumber, 19), 50) as double)")
          .as("l_quantity"),
        expr("cast(round(901.0 + pmod(xxhash64(l_orderkey, l_linenumber, 20), 10410000) / 100.0, 2) as double)")
          .as("l_extendedprice"),
        expr("cast(pmod(xxhash64(l_orderkey, l_linenumber, 21), 11) as double) / 100.0")
          .as("l_discount"),
        expr("cast(pmod(xxhash64(l_orderkey, l_linenumber, 22), 9) as double) / 100.0")
          .as("l_tax"),
        element_at(array(lit("A"), lit("N"), lit("R")),
          expr("cast(pmod(xxhash64(l_orderkey, l_linenumber, 23), 3) as int)") + 1)
          .as("l_returnflag"),
        element_at(array(lit("F"), lit("O")),
          expr("cast(pmod(xxhash64(l_orderkey, l_linenumber, 24), 2) as int)") + 1)
          .as("l_linestatus"),
        expr("""timestamp'1995-01-01 00:00:00'
                + make_interval(0,0,0, cast(pmod(xxhash64(l_orderkey, 14), 2404) as int)
                                       + cast(1 + pmod(xxhash64(l_orderkey, l_linenumber, 25), 95) as int), 0,0,0)""")
          .as("l_shipdate"))
    write(lineitem, "lineitem", files = math.max(1, (32 * sf).toInt))

    val nEvents = n(1000000)
    val nUsers = n(15000)
    write(spark.range(nEvents).select(
      $"id".as("event_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, pmod(xxhash64(id, 26), 2591999) + pmod(xxhash64(id, 27), 1000000) / 1000000.0)")
        .as("ts"),
      expr(s"pmod(xxhash64(id, 28), $nUsers)").as("user_id"),
      element_at(array(lit("click"), lit("error"), lit("purchase"),
        lit("signup"), lit("view")), ui("id", 29, 5) + 1).as("event_type"),
      round(u("id", 30) * 490 + 0.01, 2).cast("double").as("value"),
      format_string("{\"k\": %d}", ui("id", 31, 100)).as("props")),
      "events", files = math.max(1, (16 * sf).toInt))

    // ---- documents -------------------------------------------------------
    val nDocs = n(50000)
    val docs =
      if (!adversarial) {
        // benign: driver-like word salad, 8..110 tokens, plus a small
        // template-near-dup band (id%200==199, one varied token) carrying
        // the 'dup' marker token like the driver corpus.
        val base = spark.range(nDocs).select(
          $"id".as("doc_id"),
          expr("8 + cast(pmod(xxhash64(id, 40), 103) as int)").as("len"),
          ui("id", 41, 30).as("vw"))
        base.select(
          $"doc_id",
          when($"doc_id" % 200 === 199,
            concat_ws(" ",
              lit((0 until 50).map(i => if (i % 5 == 0) "dup"
                else vocab(i * 7 % 30)).mkString(" ")),
              element_at(vocabArr, $"vw" + 1)))
            .otherwise(concat_ws(" ", expr(
              """transform(sequence(0, len - 1),
                   i -> element_at(array(""" + vocab.map(w => s"'$w'").mkString(",") +
                """), cast(pmod(xxhash64(doc_id, i, 42), 30) as int) + 1))""")))
            .as("text"),
          element_at(array(lit("en"), lit("en"), lit("en"), lit("zh"),
            lit("es"), lit("fr"), lit("de")), ui("doc_id", 43, 7) + 1).as("lang"),
          concat(lit("src"), ui("doc_id", 44, 20)).as("source"))
          .withColumn("n_chars", length($"text").cast("long"))
          .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      } else {
        // adversarial: 65 clusters × 430 near-dup docs (~56% of 50k),
        // Zipf source mix, one mega-doc. Cluster texts: 15 tokens drawn
        // from the cluster id, ONE token varied per member. Sizing is
        // against the df<=max(5, 1%·50k)=500 stop-shingle guard WITH the
        // benign background counted: a cluster core shingle's df is
        // clusterSize + Binomial(~22k benign docs, ~57/27000) ≈ 430+47±7,
        // safely under 500 (so in-cluster evidence SURVIVES the guard —
        // the first cut of this corpus used 45×499 and the +~54 benign
        // collisions pushed every core shingle OVER the guard, collapsing
        // the edge front to identical-text pairs only). Differing members
        // share 10 of 13 shingles → jaccard 0.625 >= 0.5, so the CC edge
        // front is C(430,2)·65 ≈ 6.0M > ccDriverMaxEdges=5M (organic
        // distributed fixpoint) and the jaccard>=0.3 front ≈ the same 6M
        // > broadcastFrontMaxRows=1M (organic non-broadcast p91 join).
        val clusters = 65
        val clusterSize = 430
        val dupBand = clusters.toLong * clusterSize
        require(dupBand < nDocs, s"adversarial needs nDocs > $dupBand")
        // Zipf(1) over 20 sources via inverse-CDF thresholds
        val w = (1 to 20).map(1.0 / _)
        val cum = w.scanLeft(0.0)(_ + _).tail.map(_ / w.sum)
        val zipfSrc = cum.zipWithIndex.reverse
          .foldLeft(lit("src19"): org.apache.spark.sql.Column) {
            case (acc, (c, i)) => when(u("doc_id", 50) < c, lit(s"src$i")).otherwise(acc)
          }
        val base = spark.range(nDocs).select(
          $"id".as("doc_id"),
          expr("8 + cast(pmod(xxhash64(id, 40), 103) as int)").as("len"))
        base.select(
          $"doc_id",
          when($"doc_id" === 0,
            // the mega-doc: ~100k tokens
            concat_ws(" ", expr(
              """transform(sequence(0, 99999),
                   i -> element_at(array(""" + vocab.map(w => s"'$w'").mkString(",") +
                """), cast(pmod(xxhash64(i, 51), 30) as int) + 1))""")))
            .when($"doc_id" <= dupBand,
              // cluster c = (doc_id-1) / clusterSize, member m varies token 7
              concat_ws(" ", expr(
                s"""transform(sequence(0, 14),
                     i -> CASE WHEN i = 7
                       THEN element_at(array(${vocab.map(w => s"'$w'").mkString(",")}),
                              cast(pmod(xxhash64(doc_id, 52), 30) as int) + 1)
                       ELSE element_at(array(${vocab.map(w => s"'$w'").mkString(",")}),
                              cast(pmod(xxhash64(cast((doc_id - 1) / $clusterSize as bigint), i, 53), 30) as int) + 1)
                     END)""")))
            .otherwise(concat_ws(" ", expr(
              """transform(sequence(0, len - 1),
                   i -> element_at(array(""" + vocab.map(w => s"'$w'").mkString(",") +
                """), cast(pmod(xxhash64(doc_id, i, 42), 30) as int) + 1))""")))
            .as("text"),
          element_at(array(lit("en"), lit("en"), lit("en"), lit("zh"),
            lit("es"), lit("fr"), lit("de")), ui("doc_id", 43, 7) + 1).as("lang"),
          zipfSrc.as("source"))
          .withColumn("n_chars", length($"text").cast("long"))
          .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      }
    // 16 files/sf (was 4): `documents` feeds the suite's heaviest
    // explodes (shingle/word/simhash fronts) — give its scan the
    // natural parallelism production input would have
    write(docs, "documents", files = math.max(1, (16 * sf).toInt))

    // ---- embeddings: 64-dim unit-norm, like the driver's (isotropic
    // uniform components, normalized — verified: the shipped corpus'
    // high-cos pair count matches the isotropic expectation). ----------
    val nEmb = n(20000)
    write(spark.range(nEmb).select(
      $"id".as("vec_id"),
      expr("""transform(sequence(0, 63),
                j -> pmod(xxhash64(id, j, 60), 2000001) / 1000000.0 - 1.0)""")
        .as("raw"),
      ui("id", 61, 10).as("label"))
      .withColumn("nrm", expr("sqrt(aggregate(raw, 0.0D, (acc, x) -> acc + x * x))"))
      .select($"vec_id",
        expr("transform(raw, x -> cast(x / nrm as float))").as("embedding"),
        $"label"), "embeddings", files = math.max(1, (8 * sf).toInt))

    println(s"[gen] done: sf=$sf adversarial=$adversarial -> $out")
    spark.stop()
  }
}
