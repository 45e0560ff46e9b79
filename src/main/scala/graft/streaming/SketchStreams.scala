package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming twins of the deterministic sketches in
 * [[graft.pipeline.Sketches]]. The batch sketches are mergeable by
 * construction (register max / min-k commute), so their streaming form is
 * just "hold the bounded state in GroupState and fold each micro-batch
 * in" — the live-dashboard counterpart of the batch reports, with
 * identical integer arithmetic so stream output equals the batch sketch
 * over the concatenated input exactly (spec-pinned, not approximately).
 */
object SketchStreams {

  /** A (group, value) observation — [[distinctHllStream]] input row. */
  case class GV(g: String, v: String)

  /** A (group, rowId, value) observation — [[quantileSketchStream]]
    * input row (`id` must be a unique row key, as in the batch sketch). */
  case class GIV(g: String, id: Long, v: Long)

  /** A live quantile report — one row per group per touching batch;
    * latest = max `update_seq` per group. Quantile columns correspond
    * 1:1 to the `qsPermille` argument. */
  case class QuantileEstimate(g: String, update_seq: Long, n_sample: Long,
                              quantiles: Seq[Long])

  /**
   * Streaming bottom-k quantile sketch: GroupState holds the ≤ k
   * (hash, value) minima per group — min-k commutes, so after any batch
   * prefix the state IS the batch [[graft.pipeline.Sketches.quantileSample]]
   * of that prefix, and the emitted quantiles equal the batch
   * [[graft.pipeline.Sketches.quantileSketch]] exactly (same md5 hash,
   * 0→1, (hash, value)-lexicographic retention, integer lower-quantile
   * indexing). State is ≤ k pairs of longs per group, NoTimeout.
   */
  def quantileSketchStream(rows: Dataset[GIV], k: Int,
                           qsPermille: Seq[Int] = Seq(250, 500, 750))
      : Dataset[QuantileEstimate] = {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    require(qsPermille.nonEmpty && qsPermille.forall(p => p >= 0 && p <= 1000),
      s"quantile permilles must be in [0, 1000], got $qsPermille")
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.g)
      .mapGroupsWithState[(Long, Seq[(Long, Long)]), QuantileEstimate](
        GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[GIV], state: GroupState[(Long, Seq[(Long, Long)])]) =>
          val (seq, prev) = state.getOption.getOrElse((0L, Seq.empty))
          val incoming = batch.map { r =>
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(r.id.toString.getBytes("UTF-8"))
            val h32 = java.lang.Long.parseLong(
              d.take(4).map(x => f"${x & 0xff}%02x").mkString, 16)
            (math.max(1L, h32), r.v)
          }.toSeq
          val kept = (prev ++ incoming).sorted.take(k)
          state.update((seq + 1, kept))
          val sample = kept.map(_._2).sorted
          val n = sample.size
          QuantileEstimate(g, seq + 1, n.toLong,
            qsPermille.map(p => sample((p * (n - 1) / 1000).toInt)))
      }
  }

  /** A live estimate — one row per group per micro-batch that touched
    * it; `update_seq` increments per emission, so the latest row per
    * group (max update_seq) is the current estimate. */
  case class HllEstimate(g: String, update_seq: Long, n_hit: Long,
                         est_distinct: Long)

  /**
   * Streaming HLL distinct-count: GroupState holds the 2^b register
   * maxima (one byte each — ρ ≤ 33−b), updated with the same
   * md5-prefix/leading-zero arithmetic as
   * [[graft.pipeline.Sketches.distinctHll]], and the integer-exact
   * harmonic-mean estimate is re-emitted per batch (Update mode).
   * Because register max commutes, the emitted estimate after any prefix
   * of batches EQUALS the batch sketch over that prefix — no
   * approximation drift across batches, any arrival order. State is 2^b
   * bytes per group, NoTimeout.
   */
  def distinctHllStream(rows: Dataset[GV], b: Int = 6): Dataset[HllEstimate] = {
    require(b >= 4 && b <= 10, s"b must be in [4, 10], got $b")
    import rows.sparkSession.implicits._
    val m = 1 << b
    val wBits = 32 - b
    val wMod = 1L << wBits
    val alphaPermille: Long = b match {
      case 4 => 673
      case 5 => 697
      case 6 => 709
      case _ => math.round(721.3 / (1 + 1.079 / m))
    }
    rows
      .filter(r => r.v != null)
      .groupByKey(_.g)
      .mapGroupsWithState[(Long, Array[Byte]), HllEstimate](
        GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[GV], state: GroupState[(Long, Array[Byte])]) =>
          val (seq, regs) = state.getOption.getOrElse((0L, new Array[Byte](m)))
          batch.foreach { r =>
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(r.v.getBytes("UTF-8"))
            val h32 = java.lang.Long.parseLong(
              d.take(4).map(x => f"${x & 0xff}%02x").mkString, 16)
            val h = math.max(1L, h32)
            val j = (h / wMod).toInt
            val w = h % wMod
            val rho =
              if (w == 0) wBits + 1
              else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
            if (rho > regs(j)) regs(j) = rho.toByte
          }
          state.update((seq + 1, regs))
          val nHit = regs.count(_ > 0).toLong
          val sp = regs.filter(_ > 0).map(r => 1L << (32 - r)).sum +
            (m - nHit) * 4294967296L
          HllEstimate(g, seq + 1, nHit,
            alphaPermille * m * m * 4294967296L / (1000L * sp))
      }
  }

  /** A (group, rowId, weight) observation — [[weightedSampleStream]]
    * input row; rows with weight < 1 are ignored (the batch operator's
    * weight-hygiene contract). */
  case class GIW(g: String, id: Long, w: Long)

  /** A live weighted sample — one row per group per touching batch;
    * `ids` lists the current sample in selection (priority) order. */
  case class WeightedSample(g: String, update_seq: Long, ids: Seq[Long])

  /**
   * Streaming deterministic weighted sample: GroupState holds the ≤ k
   * (priority, hash, id) minima per group under the EXACT total order of
   * [[graft.pipeline.Sampling.weightedSample]] (priority = 60-bit md5(id)
   * prefix div w) — bottom-k under a total order commutes, so after any
   * batch prefix the emitted ids equal the batch sample over that prefix
   * row-for-row, in the same rank order. The live variant of
   * quality-weighted corpus subsetting: the sample stays current as
   * documents arrive, without recomputing anything. State is ≤ k triples
   * of longs per group, NoTimeout.
   *
   * Contract: `id` is the row key the batch operator hashes (its string
   * form feeds md5); re-delivered ids re-fold idempotently. State is
   * folded BY ID (min-priority triple per id) before the bottom-k cut, so
   * an id re-delivered with a different weight still occupies at most one
   * sample slot — the id keeps its best (lowest) priority ever seen,
   * which is delivery-order independent (advisor r9: the old full-triple
   * dedup let a weight-changed redelivery hold two slots).
   */
  def weightedSampleStream(rows: Dataset[GIW], k: Int)
      : Dataset[WeightedSample] = {
    require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")
    import rows.sparkSession.implicits._
    rows
      .filter(r => r.w >= 1L)
      .groupByKey(_.g)
      .mapGroupsWithState[(Long, Seq[(Long, Long, Long)]), WeightedSample](
        GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[GIW],
         state: GroupState[(Long, Seq[(Long, Long, Long)])]) =>
          val (seq, prev) = state.getOption.getOrElse((0L, Seq.empty))
          // one digest instance per group-invocation, not per row:
          // MessageDigest.digest() resets after each call, and this
          // function body is single-threaded (advisor r9 allocation note)
          val md = java.security.MessageDigest.getInstance("MD5")
          val incoming = batch.map { r =>
            val hex = md.digest(r.id.toString.getBytes("UTF-8"))
              .take(8).map(x => f"${x & 0xff}%02x").mkString
            val h = java.lang.Long.parseLong(hex.take(15), 16)
            (h / r.w, h, r.id)
          }.toSeq
          val kept = (prev ++ incoming)
            .groupBy(_._3).valuesIterator.map(_.min).toSeq // fold by id
            .sorted.take(k)
          state.update((seq + 1, kept))
          WeightedSample(g, seq + 1, kept.map(_._3))
      }
  }
}
