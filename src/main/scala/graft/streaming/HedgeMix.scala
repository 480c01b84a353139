package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ONLINE domain reweighting — batch p70's Hedge/MWU trajectory driven
  * by a stream: each micro-batch is one Hedge round.
  *
  * Arriving documents are scored statelessly under the batch-fitted LM
  * literal maps ([[EventStreams.lmScored]] — per-doc `nll_sum` is
  * bit-identical to batch lmDocNll's, the parity the perplexity-gate
  * spec pins), aggregated per domain INSIDE the micro-batch (slim
  * (source, BIGINT, BIGINT) rows — the only driver-bound data is one
  * row per domain per round), and the controller applies the exact
  * integer update batch p70 runs: floor-div mean loss, per-mille
  * normalization against the round's worst PRESENT domain, absent
  * domains charged that pessimistic bound, w <- w·(S − η·m) / S in
  * BIGINT. Fed the batch entry's shards in arrival order, the stream's
  * weight trajectory reproduces batch p70 BIT-FOR-BIT (spec-proven).
  *
  * Scale: upstream is a stateless projection (no state store rows, no
  * shuffle before foreachBatch); per-round controller state is
  * |domains| longs on the driver. The LM maps are vocabulary-bounded
  * (the [[EventStreams.perplexityGateStream]] size caveat and its
  * pruned-map fallback apply unchanged).
  */
final class HedgeMixController(domains: Seq[String], etaPm: Long = 300L) {
  require(domains.nonEmpty && domains == domains.sorted.distinct,
    "domains must be the sorted distinct domain list (the batch entry's order)")
  private val S = 1000000L
  private val weights = scala.collection.mutable.LinkedHashMap(
    domains.map(_ -> 1000000000000L): _*)
  private var nRounds = 0

  /** One Hedge round from per-domain (Σ sln-NLL, Σ bigrams) integer
    * aggregates; domains absent from the batch are charged the round's
    * max loss — identical arithmetic to batch p70. A batch with no
    * scorable documents is not a round — which agrees with batch p70's
    * densified empty-shard rule (m_pm = 0 for every domain multiplies
    * each weight by exactly (S − 0)/S = 1): both paths leave the
    * weight vector bit-identical through an empty round. */
  def update(batch: Map[String, (Long, Long)]): Unit = synchronized {
    val ls = batch.collect { case (d, (sn, sb)) if sb > 0L => d -> sn / sb }
    if (ls.nonEmpty) {
      val lmax = ls.values.max
      domains.foreach { d =>
        val mPm = ls.getOrElse(d, lmax) * 1000L / math.max(lmax, 1L)
        weights(d) = weights(d) * (S - etaPm * mPm) / S
      }
      nRounds += 1
    }
  }

  def rounds: Int = synchronized(nRounds)

  /** Normalized readout (domain, w, weight_r) — the same
    * round-at-readout rule as batch p70 (HALF_UP at 6dp over the exact
    * BIGINT weights). */
  def snapshot: Seq[(String, Long, Double)] = synchronized {
    val sw = weights.values.sum
    domains.map(d => (d, weights(d),
      JBigDecimal.valueOf(weights(d).toDouble / sw)
        .setScale(6, RoundingMode.HALF_UP).doubleValue))
  }
}

object HedgeMix {

  /** Wires the scoring projection and per-batch domain aggregation into
    * `foreachBatch` against `controller`; returns the running query.
    * Expects `source` and `text` columns on `docs`. */
  def hedgeMixStream(spark: SparkSession, modelDir: String, docs: DataFrame,
      controller: HedgeMixController, checkpointDir: String): StreamingQuery =
    EventStreams.lmScored(spark, modelDir, docs)
      .select(col("source"), col("nll_sum"), col("n_bigrams"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val agg = batch.groupBy(col("source"))
          .agg(sum(col("nll_sum")).as("sn"), sum(col("n_bigrams")).as("sb"))
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        controller.update(agg)
      }
      .start()
}
