package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Static hash kernels shared by interpreted eval and generated code (the
  * codegen'd expressions call these via scalac's static forwarders).
  */
object HashOps {
  /** FNV-1a 64-bit over UTF-8 bytes — self-contained, stable across JVMs. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array: each token votes its hash bits. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Order-sensitive polynomial rolling hash over tokens (wrapping i64). */
  def rollingHash(arr: ArrayData): Long = {
    var h = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) 0L else fnv1a(arr.getUTF8String(i).getBytes)
      h = h * 31L + t
      i += 1
    }
    h
  }
}

abstract class TokenArrayHash extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.$kernel($c)")
}

/** Document-level SimHash fingerprint: near-duplicate docs land within a
  * small Hamming distance, so the near-dup join becomes
  * `bit_count(sh_a ^ sh_b) <= k` over blocked candidates.
  */
case class SimHash64(child: Expression) extends TokenArrayHash {
  override def prettyName: String = "simhash64"
  override protected def kernel: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any = HashOps.simhash64(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Order-sensitive rolling-hash fingerprint (exact-sequence identity). */
case class RollingHash(child: Expression) extends TokenArrayHash {
  override def prettyName: String = "rolling_hash"
  override protected def kernel: String = "rollingHash"
  override protected def nullSafeEval(v: Any): Any = HashOps.rollingHash(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {

  def simhash64(tokens: Column): Column = Bridge.column(SimHash64(Bridge.expression(tokens)))

  def rollingHash(tokens: Column): Column = Bridge.column(RollingHash(Bridge.expression(tokens)))

  /** k-permutation MinHash signature (array<long>) over a token array.
    *
    * Scale path: hashes tokens directly (`xxhash64(token, perm)`), no
    * vocabulary dictionary, so it runs map-side over any corpus size; the
    * banding join in [[graft.operators.DedupQueries]] is the only shuffle.
    */
  def minhashSignature(tokens: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(tokens, t => xxhash64(t, lit(i))))
    }: _*)

  /** LSH band keys for a minhash signature: `bands` hashes of `rowsPerBand`
    * consecutive signature entries each.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r => sig.getItem(b * rowsPerBand + r)): _*).as("key"))
    }: _*)
}
