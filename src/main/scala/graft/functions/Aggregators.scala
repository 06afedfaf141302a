package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]`) — the engine's UDAF
  * surface (SURVEY.md §7 M4). Both keep **bounded state**, which is what
  * makes them safe as streaming-state aggregates and shuffle-friendly in
  * batch: partial aggregation (map-side combine) applies because `merge`
  * is associative and commutative.
  */
object Aggregators {

  /** Top-k largest doubles per group; O(k) state, O(log k)-ish updates.
    * Buffer is a sorted (ascending) array of at most k elements.
    */
  final class TopK(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {
    override def zero: Array[Double] = Array.empty

    override def reduce(buf: Array[Double], v: Double): Array[Double] =
      if (buf.length < k) (buf :+ v).sorted
      else if (v > buf(0)) { val b = buf.clone(); b(0) = v; b.sorted }
      else buf

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      (a ++ b).sorted.takeRight(k)

    override def finish(buf: Array[Double]): Array[Double] = buf.reverse // descending

    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Seeded reservoir sample of k longs per group (Vitter's algorithm R,
    * adapted to distributed merge: merged reservoirs are re-subsampled
    * weighted by their observed counts). State is O(k) regardless of group
    * size. Deterministic per (partition layout, seed).
    */
  final case class Reservoir(sample: Array[Long], seen: Long)

  final class ReservoirSample(k: Int, seed: Long) extends Aggregator[Long, Reservoir, Array[Long]] {
    private def rng(a: Long, b: Long): Long = {
      var h = a * 0x9e3779b97f4a7c15L + b + seed
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      h & Long.MaxValue
    }

    override def zero: Reservoir = Reservoir(Array.empty, 0L)

    override def reduce(r: Reservoir, v: Long): Reservoir =
      if (r.sample.length < k) Reservoir(r.sample :+ v, r.seen + 1)
      else {
        val j = rng(v, r.seen) % (r.seen + 1)
        if (j < k) { val s = r.sample.clone(); s(j.toInt) = v; Reservoir(s, r.seen + 1) }
        else Reservoir(r.sample, r.seen + 1)
      }

    override def merge(a: Reservoir, b: Reservoir): Reservoir = {
      val total = a.seen + b.seen
      if (total <= k) Reservoir(a.sample ++ b.sample, total)
      else {
        // weighted subsample of the union, proportional to seen counts
        val pool = a.sample ++ b.sample
        val picked = pool.indices.sortBy(i => rng(pool(i), i)).take(k).map(pool).toArray
        Reservoir(picked, total)
      }
    }

    override def finish(r: Reservoir): Array[Long] = r.sample.sorted

    override def bufferEncoder: Encoder[Reservoir] = Encoders.product[Reservoir]
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
