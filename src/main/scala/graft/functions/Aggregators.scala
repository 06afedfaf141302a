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

  /** Top-k largest doubles per group; O(k) state, binary-search insertion
    * (O(log k) search + O(k) shift, no re-sort). Buffer is a sorted
    * (ascending) array of at most k elements.
    */
  final class TopK(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {
    override def zero: Array[Double] = Array.empty

    private def insertSorted(buf: Array[Double], v: Double, dropSmallest: Boolean): Array[Double] = {
      val search = java.util.Arrays.binarySearch(buf, v)
      val pos = if (search >= 0) search else -(search + 1)
      if (dropSmallest) {
        // overwrite slot 0 by shifting [1, pos) left, then place v at pos-1
        val out = buf.clone()
        if (pos > 1) System.arraycopy(buf, 1, out, 0, pos - 1)
        out(math.max(pos - 1, 0)) = v
        out
      } else {
        val out = new Array[Double](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, pos)
        out(pos) = v
        System.arraycopy(buf, pos, out, pos + 1, buf.length - pos)
        out
      }
    }

    override def reduce(buf: Array[Double], v: Double): Array[Double] =
      if (buf.length < k) insertSorted(buf, v, dropSmallest = false)
      else if (v > buf(0)) insertSorted(buf, v, dropSmallest = true)
      else buf

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      (a ++ b).sorted.takeRight(k)

    override def finish(buf: Array[Double]): Array[Double] = buf.reverse // descending

    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Bottom-k smallest longs per group — [[TopK]]'s exact-integer mirror
    * (t15's posting heads: the k smallest doc_ids per term). O(k) state,
    * associative/commutative merge (the k smallest of a union are
    * computable from each side's k smallest), so map-side combine applies
    * and a flood key costs one k-slot combiner cell per map task instead
    * of funneling every occurrence into one window partition. Buffer is a
    * sorted ascending array of at most k elements; finish returns it
    * ascending.
    */
  final class BottomKLong(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.empty

    override def reduce(buf: Array[Long], v: Long): Array[Long] =
      if (buf.length < k || v < buf(buf.length - 1)) {
        val search = java.util.Arrays.binarySearch(buf, v)
        val pos = if (search >= 0) search else -(search + 1)
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, math.min(pos, n))
        if (pos < n) {
          out(pos) = v
          System.arraycopy(buf, pos, out, pos + 1, n - pos - 1)
        }
        out
      } else buf

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      (a ++ b).sorted.take(k)

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Seeded uniform sample of k longs per group, implemented as **bottom-k
    * priority sampling**: every value gets a deterministic pseudo-random
    * priority, and the sample is the k values with the smallest
    * priorities. Unlike classic reservoir merging (which needs careful
    * count-weighting), bottom-k merges *exactly* — the k smallest of a
    * union are computable from each side's k smallest — so the aggregate
    * is associative, commutative, and independent of partition layout for
    * distinct inputs. State is O(k).
    *
    * Caveat: duplicate input values share a priority, so the sample is
    * uniform over *distinct* values; feed unique keys (its intended use).
    */
  final case class Reservoir(priorities: Array[Long], values: Array[Long])

  final class ReservoirSample(k: Int, seed: Long) extends Aggregator[Long, Reservoir, Array[Long]] {
    // shared kernel: a03's and p03's DuckDB oracles both replay this exact
    // arithmetic, so there must be exactly one JVM copy
    private def priority(v: Long): Long = HashOps.priorityHash(v, seed)

    override def zero: Reservoir = Reservoir(Array.empty, Array.empty)

    private def bottomK(pairs: Array[(Long, Long)]): Reservoir = {
      // distinct first: duplicate values share a (priority, value) pair and
      // must occupy at most one sample slot (uniform over distinct values)
      val kept = pairs.distinct.sortBy(_._1).take(k)
      Reservoir(kept.map(_._1), kept.map(_._2))
    }

    override def reduce(r: Reservoir, v: Long): Reservoir = {
      val p = priority(v)
      if (r.values.length < k) bottomK(r.priorities.zip(r.values) :+ (p, v))
      else if (p < r.priorities.last) bottomK(r.priorities.zip(r.values) :+ (p, v))
      else r
    }

    override def merge(a: Reservoir, b: Reservoir): Reservoir =
      bottomK(a.priorities.zip(a.values) ++ b.priorities.zip(b.values))

    override def finish(r: Reservoir): Array[Long] = r.values.sorted

    override def bufferEncoder: Encoder[Reservoir] = Encoders.product[Reservoir]
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Deterministic HyperLogLog over long keys (p = 9 → 512 one-byte
    * registers). Every step is integer arithmetic on the 63-bit
    * [[HashOps.priorityHash]] value — idx = top 9 bits, w = low 54 bits,
    * register = max(55 − floor(log2 w), w = 0 → 55) — and the estimator is
    * a fixed-order double formula, so the DuckDB oracle (a06) replays the
    * whole sketch bit-exactly in HUGEINT: no "sketches are engine-specific"
    * carve-out. Standard HLL bias handling: linear counting below 2.5·m
    * when empty registers remain. State is 512 bytes regardless of input;
    * merge is an elementwise max — associative, commutative, and
    * partition-layout independent, so map-side partial aggregation applies
    * and a 1000-executor rollup ships 512 bytes per group, not rows.
    *
    * Null keys must be filtered upstream: a typed `Aggregator[Long, …]`
    * decodes a null input as 0L, which would register a phantom distinct
    * while `count(DISTINCT …)` and the oracle both drop nulls.
    */
  final class HllDistinct(seed: Long) extends Aggregator[Long, Array[Byte], Long] {
    private val m = 512 // 2^p, p = 9

    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(regs: Array[Byte], v: Long): Array[Byte] = {
      val h = HashOps.priorityHash(v, seed) // non-negative, 63 significant bits
      val idx = (h >>> 54).toInt // top 9 of the 63
      val w = h & ((1L << 54) - 1)
      val rho = if (w == 0L) 55 else 54 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > (regs(idx) & 0xff)) regs(idx) = rho.toByte
      regs
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(regs: Array[Byte]): Long = {
      // S = Σ 2^(55-Mj) exactly (max 512·2^55 = 2^64 exceeds a signed
      // long, hence BigInt); the oracle sums the same terms in HUGEINT.
      var zeros = 0
      var s = BigInt(0)
      var i = 0
      while (i < m) {
        val mj = regs(i) & 0xff
        if (mj == 0) zeros += 1
        s += BigInt(1) << (55 - mj)
        i += 1
      }
      // fixed operation order, mirrored literally in the oracle SQL
      val alphaMM = 0.7213 / (1.0 + 1.079 / 512) * 512 * 512
      val raw = alphaMM * 36028797018963968.0 / s.toDouble // 2^55
      // ln is the one non-IEEE-exact step (specified to 1 ulp, so another
      // libm could differ in the last bit) — but its domain here is exactly
      // the 512 values 512/zeros, and AggregatorSpec enumerates all of
      // them: the closest any 512*ln(512/z)+0.5 comes to an integer (the
      // floor flip point) is 3.7e-4, ~9 orders of magnitude above a 1-ulp
      // perturbation (~4.5e-13 at est<=3200). The grid snap is therefore
      // engine-independent over the whole input domain, not just this host.
      val est = if (raw <= 1280.0 && zeros > 0) 512 * math.log(512.0 / zeros) else raw
      math.floor(est + 0.5).toLong
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Elementwise-max merge of packed 512-byte HLL register blobs — the
    * HyperBall edge-merge aggregator (g16): each node's counter is ONE
    * 512-byte array (exactly [[HllDistinct]]'s buffer), neighbor blobs
    * arrive as edge messages, and the merge is the same register max
    * [[HllDistinct.merge]] runs — associative, commutative, duplicate-
    * insensitive, so map-side partial aggregation applies and a round's
    * shuffle carries ≤ one blob per (partition, node), never a row per
    * register (the row-grain form measured ~100× cpu for 10× edges on
    * the nonlinearity probe — the shuffle multiplied by registers-per-
    * node; this is why Boldi/Vigna pack registers into words).
    */
  final class HllRegMerge extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](512)

    override def reduce(a: Array[Byte], b: Array[Byte]): Array[Byte] = merge(a, b)

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < 512) { if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Bloom filter over long keys — the semi-join-reduction build side.
    * State is a fixed `numBits/64`-word bitset (e.g. 2 KB at 2^14 bits)
    * regardless of input size; merge is a word-wise OR, so partial
    * aggregation combines map-side and the final bitset is independent of
    * partition layout. Hash family lives in [[BloomOps]], shared with the
    * probe expression [[BloomMightContain]] so false negatives are
    * impossible by construction.
    */
  final class BloomFilter(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")

    override def zero: Array[Long] = new Array[Long](numBits >>> 6)

    override def reduce(buf: Array[Long], key: Long): Array[Long] = {
      BloomOps.setBits(buf, key, numBits, numHashes)
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Count-Min sketch over long keys: `depth × width` integer counters,
    * row j hashing with seed `seedBase + seedStep*j` (the [[HashOps
    * .priorityHash]] family, so the counter matrix replays in DuckDB
    * HUGEINT — a08's oracle). State is `depth*width*8` bytes regardless of
    * input size; merge is elementwise sum (counts are additive), so
    * map-side partial aggregation applies and the final matrix is
    * partition-layout-independent. Point estimate = min over rows of the
    * probed counter (computed downstream from the returned matrix, keeping
    * the aggregator reusable for heavy-hitter and inner-product probes).
    */
  /** The one sketch geometry a08, its oracle replay, and the specs share —
    * the Spark-side hash, the DuckDB HUGEINT replay, and the plan asserts
    * must all agree on these or the hash-exact compare silently skews.
    */
  object CmsSketch {
    val Depth = 4
    val Width = 256
    val SeedBase = 11L
    val SeedStep = 7919L

    def default: CmsSketch = new CmsSketch(Depth, Width, SeedBase, SeedStep)
  }

  final class CmsSketch(depth: Int, width: Int, seedBase: Long, seedStep: Long)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0)

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], key: Long): Array[Long] = {
      var j = 0
      while (j < depth) {
        // priorityHash is non-negative, so % width == a true bucket index
        val b = (HashOps.priorityHash(key, seedBase + seedStep * j) % width).toInt
        buf(j * width + b) += 1
        j += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
