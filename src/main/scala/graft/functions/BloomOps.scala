package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Bloom-filter kernels shared by the [[Aggregators.BloomFilter]] build
  * side and the [[BloomMightContain]] probe expression — one definition of
  * the hash family, so a bit set on the build side is always found on the
  * probe side (the no-false-negative contract).
  *
  * Double hashing (Kirsch-Mitzenmatter): bit_i = (h1 + i·h2) mod m over a
  * splitmix64-finalized key. Probe reads the bitset through Spark's
  * `ArrayData` so the codegen'd expression needs no array copy.
  */
/** `bloom_might_contain(bits, key)` — codegen'd probe against a broadcast
  * bitset column. False positives possible (resolved by the exact join
  * that follows in the semi-join-reduction pattern), false negatives
  * impossible (same [[BloomOps]] hash family as the build aggregator).
  * `numBits`/`numHashes` are plan-time constants, not children, so the
  * generated code inlines them.
  */
case class BloomMightContain(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    numBits: Int,
    numHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, bigint), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(bits: Any, key: Any): Any =
    BloomOps.mightContain(bits.asInstanceOf[ArrayData], key.asInstanceOf[Long],
      numBits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, key) =>
      s"${ev.value} = graft.functions.BloomOps.mightContain($bits, $key, $numBits, $numHashes);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BloomOps {

  def mix(key: Long): Long = {
    var h = key * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Set the key's bits in `words` (mutates; numBits must be words.length*64). */
  def setBits(words: Array[Long], key: Long, numBits: Int, numHashes: Int): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((((h1 + i * h2) % numBits) + numBits) % numBits).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe through ArrayData — called from both interpreted eval and the
    * generated code of [[BloomMightContain]].
    */
  def mightContain(words: ArrayData, key: Long, numBits: Int, numHashes: Int): Boolean = {
    // the expression is SQL-exposed, so an inconsistent numBits must fail
    // loudly rather than read past the bitset (UnsafeArrayData would
    // silently return adjacent row memory as membership bits)
    require(words.numElements().toLong * 64 >= numBits,
      s"bloom bitset has ${words.numElements()} words (${words.numElements() * 64} bits) " +
        s"but numBits=$numBits")
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((((h1 + i * h2) % numBits) + numBits) % numBits).toInt
      if ((words.getLong(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftx.Bridge

  def bloomMightContain(bits: Column, key: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(BloomMightContain(Bridge.expression(bits), Bridge.expression(key),
      numBits, numHashes))
}
