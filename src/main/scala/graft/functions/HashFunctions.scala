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

  private val EmptyBytes = Array.emptyByteArray

  /** fnv1a of the n-gram starting at `from` (tokens joined by 0x1f).
    * Null tokens hash like empty strings (array<string> columns may carry
    * containsNull=true).
    */
  private def shingleHash(arr: ArrayData, from: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var g = 0
    while (g < n) {
      if (g > 0) { h ^= 0x1fL; h *= 0x100000001b3L }
      val bytes = if (arr.isNullAt(from + g)) EmptyBytes else arr.getUTF8String(from + g).getBytes
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      g += 1
    }
    h
  }

  /** xxhash-style avalanche finalizer used to derive per-permutation
    * hashes from one base shingle hash (the "one permutation" trick).
    */
  private def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Fused k-permutation MinHash over word n-gram shingles: one pass, no
    * intermediate shingle arrays, no interpreted lambdas. Duplicate
    * shingles cannot change a min, so no dedup pass is needed.
    */
  def shingleMinHash(arr: ArrayData, k: Int, n: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val nTok = arr.numElements()
    var p = 0
    while (p <= nTok - n) {
      val base = shingleHash(arr, p, n)
      var j = 0
      while (j < k) {
        val h = mix(base ^ (j * 0x9e3779b97f4a7c15L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      p += 1
    }
    sig
  }

  /** MinHash signature → LSH band keys in one kernel: band b's key mixes
    * its `rows` consecutive signature entries. Returned directly (rather
    * than composing `xxhash64` over `sig[i]` columns) because Catalyst's
    * projection collapse would inline the signature expression once per
    * band, recomputing it `bands`× per row.
    */
  def shingleMinHashBands(arr: ArrayData, k: Int, n: Int, bands: Int, rows: Int): Array[Long] = {
    val sig = shingleMinHash(arr, k, n)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) {
        h = mix(h ^ sig(b * rows + r))
        r += 1
      }
      keys(b) = h
      b += 1
    }
    keys
  }

  /** Fused SimHash64 over word n-gram shingles (one pass). */
  def shingleSimHash(arr: ArrayData, n: Int): Long = {
    val counts = new Array[Int](64)
    val nTok = arr.numElements()
    var p = 0
    while (p <= nTok - n) {
      val h = shingleHash(arr, p, n)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      p += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Distinct word n-gram shingle strings in one kernel (vs the interpreted
    * `transform(sequence(...)) + array_distinct` pipeline).
    */
  def shingleStrings(arr: ArrayData, n: Int): Array[org.apache.spark.unsafe.types.UTF8String] = {
    val nTok = arr.numElements()
    val seen = new java.util.LinkedHashSet[String]()
    var p = 0
    while (p <= nTok - n) {
      val sb = new java.lang.StringBuilder()
      var g = 0
      while (g < n) {
        if (g > 0) sb.append(' ')
        if (!arr.isNullAt(p + g)) sb.append(arr.getUTF8String(p + g).toString)
        g += 1
      }
      seen.add(sb.toString)
      p += 1
    }
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next()); i += 1 }
    out
  }

  /** ALL word n-gram shingles, duplicates preserved (the multiset the
    * repetition signal needs — `shingleStrings` dedups).
    */
  def shingleStringsAll(arr: ArrayData, n: Int): Array[org.apache.spark.unsafe.types.UTF8String] = {
    val nTok = arr.numElements()
    val m = math.max(0, nTok - n + 1)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var p = 0
    while (p < m) {
      val sb = new java.lang.StringBuilder()
      var g = 0
      while (g < n) {
        if (g > 0) sb.append(' ')
        if (!arr.isNullAt(p + g)) sb.append(arr.getUTF8String(p + g).toString)
        g += 1
      }
      out(p) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      p += 1
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

  /** Deterministic non-negative sampling priority (splitmix-style
    * finalizer, identical to `Aggregators.ReservoirSample.priority`).
    * Pure mod-2^64 arithmetic → replayable in DuckDB HUGEINT.
    */
  def priorityHash(v: Long, seed: Long): Long = {
    var h = v * 0x9e3779b97f4a7c15L + seed
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h & Long.MaxValue
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * in every window of `w` consecutive n-gram shingle hashes keep the
    * RIGHTMOST minimum; consecutive windows that re-select the same position
    * contribute one fingerprint. Guarantees every length-(w+n-1) token run
    * shares at least one fingerprint with any copy of it — the robust local
    * alternative to the d07 whole-document rolling hash. Rightmost-min keeps
    * the selected position monotone as the window slides, so dedup is a
    * compare-with-last. Comparisons are SIGNED long (the d04 sig contract):
    * the oracle converts each mod-2^64 hash to BIGINT before taking mins.
    * Caller guarantees >= n tokens; docs with fewer than w shingles form a
    * single window. Returns selected hashes in position order.
    */
  /** ALL n-gram shingle hashes in position order (the raw hash stream
    * winnowing selects from) — exposed directly for content-defined
    * chunking, where every window fingerprint is a potential cut point.
    * Empty array below n tokens.
    */
  def shingleHashes(arr: ArrayData, n: Int): Array[Long] = {
    val nSh = math.max(0, arr.numElements() - n + 1)
    val hs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) { hs(i) = shingleHash(arr, i, n); i += 1 }
    hs
  }

  def winnowFingerprints(arr: ArrayData, n: Int, w: Int): Array[Long] = {
    val nSh = arr.numElements() - n + 1
    val hs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) { hs(i) = shingleHash(arr, i, n); i += 1 }
    val nWin = math.max(1, nSh - w + 1)
    val out = new Array[Long](nWin)
    var m = 0
    var last = -1
    var wi = 0
    while (wi < nWin) {
      val end = math.min(wi + w, nSh)
      var best = wi
      var j = wi + 1
      while (j < end) { if (hs(j) <= hs(best)) best = j; j += 1 }
      if (best != last) { out(m) = hs(best); last = best; m += 1 }
      wi += 1
    }
    if (m == nWin) out else java.util.Arrays.copyOf(out, m)
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

/** Fused shingle MinHash expression: array<string> tokens → array<long>
  * signature. The kernel runs as one compiled method call per row, so the
  * whole signature computation stays inside the codegen'd stage — unlike a
  * `transform(sequence(...))` pipeline, where Spark's higher-order lambdas
  * evaluate interpreted per element.
  */
case class ShingleMinHash(child: Expression, k: Int, n: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // docs shorter than one shingle have NO signature (null), rather than a
  // degenerate all-MaxValue signature that would make every short doc a
  // mutual near-duplicate downstream
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < n) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(HashOps.shingleMinHash(arr, k, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() < $n) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.HashOps.shingleMinHash($c, $k, $n));
         |}
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shingle MinHash + LSH banding fused into one expression: tokens →
  * array<long> of band keys (index = band id). See
  * [[HashOps.shingleMinHashBands]] for why banding is not composed from
  * column-level `xxhash64` over signature items.
  */
case class ShingleMinHashBands(child: Expression, k: Int, n: Int, bands: Int, rows: Int)
    extends UnaryExpression {
  require(bands * rows <= k,
    s"bands*rows (${bands * rows}) must not exceed signature length k ($k)")
  override def prettyName: String = "shingle_minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullable: Boolean = true // null for docs shorter than one shingle

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < n) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashOps.shingleMinHashBands(arr, k, n, bands, rows))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() < $n) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.HashOps.shingleMinHashBands($c, $k, $n, $bands, $rows));
         |}
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct shingle strings as a fused expression (array<string> →
  * array<string>); used where exact shingle sets are needed (Jaccard
  * verification) without paying interpreted higher-order-function costs.
  */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashOps.shingleStrings(v.asInstanceOf[ArrayData], n).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.shingleStrings($c, $n))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All n-gram shingle hashes in position order (see
  * [[HashOps.shingleHashes]]) — the fingerprint stream content-defined
  * chunking cuts on. Codegen'd; empty array below n tokens.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashOps.shingleHashes(v.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.shingleHashes($c, $n))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multiset twin of [[ShingleStrings]]: all n-gram shingles with duplicates
  * preserved (repetition analysis needs the counts, not the set).
  */
case class ShingleStringsAll(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_strings_all"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashOps.shingleStringsAll(v.asInstanceOf[ArrayData], n).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashOps.shingleStringsAll($c, $n))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused shingle SimHash expression (see [[ShingleMinHash]] for why).
  * Null for docs shorter than one shingle (a constant 0L fingerprint would
  * make all short docs mutual near-duplicates).
  */
case class ShingleSimHash(child: Expression, n: Int) extends TokenArrayHash {
  override def prettyName: String = "shingle_simhash"
  override def nullable: Boolean = true
  override protected def kernel: String = "" // unused, doGenCode overridden
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < n) null else HashOps.shingleSimHash(arr, n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() < $n) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.HashOps.shingleSimHash($c, $n); }
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint selection over n-gram shingles (see
  * [[HashOps.winnowFingerprints]]). Null for docs shorter than one shingle
  * (the [[ShingleSimHash]] convention — a constant empty fingerprint set
  * would make all short docs vacuously share "no fingerprints").
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int) extends UnaryExpression {
  override def prettyName: String = "winnow_fingerprints"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < n) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashOps.winnowFingerprints(arr, n, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() < $n) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HashOps.winnowFingerprints($c, $n, $w)); }
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Order-sensitive rolling-hash fingerprint (exact-sequence identity). */
case class RollingHash(child: Expression) extends TokenArrayHash {
  override def prettyName: String = "rolling_hash"
  override protected def kernel: String = "rollingHash"
  override protected def nullSafeEval(v: Any): Any = HashOps.rollingHash(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Seeded sampling priority over a long key (bigint → non-negative bigint).
  * A JVM-long kernel rather than Column arithmetic because ANSI mode (the
  * Spark 4 default) would throw on the deliberate mod-2^64 multiply
  * overflow; the oracle replays the same arithmetic in DuckDB HUGEINT.
  */
case class PriorityHash64(child: Expression, seed: Long) extends UnaryExpression {
  override def prettyName: String = "priority_hash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    HashOps.priorityHash(v.asInstanceOf[Long], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.priorityHash($c, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {

  def simhash64(tokens: Column): Column = Bridge.column(SimHash64(Bridge.expression(tokens)))

  def rollingHash(tokens: Column): Column = Bridge.column(RollingHash(Bridge.expression(tokens)))

  /** Winnowing fingerprints (see [[WinnowFingerprints]]). */
  def winnowFingerprints(tokens: Column, n: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(tokens), n, w))

  /** Fused shingle MinHash (see [[ShingleMinHash]]). */
  def shingleMinHash(tokens: Column, k: Int, n: Int): Column =
    Bridge.column(ShingleMinHash(Bridge.expression(tokens), k, n))

  /** Fused shingle SimHash (see [[ShingleSimHash]]). */
  def shingleSimHash(tokens: Column, n: Int): Column =
    Bridge.column(ShingleSimHash(Bridge.expression(tokens), n))

  /** Fused shingle MinHash → LSH band keys (see [[ShingleMinHashBands]]). */
  def shingleMinHashBands(tokens: Column, k: Int, n: Int, bands: Int, rows: Int): Column =
    Bridge.column(ShingleMinHashBands(Bridge.expression(tokens), k, n, bands, rows))

  /** Distinct shingle strings (see [[ShingleStrings]]). */
  def shingleStrings(tokens: Column, n: Int): Column =
    Bridge.column(ShingleStrings(Bridge.expression(tokens), n))

  /** All shingle strings, duplicates preserved (see [[ShingleStringsAll]]). */
  def shingleStringsAll(tokens: Column, n: Int): Column =
    Bridge.column(ShingleStringsAll(Bridge.expression(tokens), n))

  /** All shingle hashes in position order (see [[ShingleHashes]]). */
  def shingleHashes(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(tokens), n))

  /** k-permutation MinHash signature (array<long>) over a token array,
    * composed from builtins — kept as the reference form the fused
    * [[ShingleMinHash]] expression is validated against (see
    * HashFunctionsSpec); production paths use the fused expressions.
    */
  def minhashSignature(tokens: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(tokens, t => xxhash64(t, lit(i))))
    }: _*)

  /** Seeded sampling priority (see [[PriorityHash64]]). */
  def priorityHash(key: Column, seed: Long): Column =
    Bridge.column(PriorityHash64(Bridge.expression(key), seed))

  /** DuckDB HUGEINT replay of [[PriorityHash64]] as CTE stages (the shape
    * a03's oracle proved out): given an upstream CTE `src` exposing
    * `carry` columns plus a BIGINT `key`, emits chained CTEs whose last
    * stage exposes `carry` plus `pri` = the non-negative priority. The
    * second 64×64-bit multiply is split into 32-bit halves so every
    * intermediate stays inside INT128. ph1 double-mods the first product
    * into [0, 2^64): DuckDB's % keeps the dividend's sign, while the JVM
    * kernel wraps to the unsigned bit pattern — without the wrap, any
    * NEGATIVE key (e.g. one derived from a signed hash) would silently
    * diverge from [[HashOps.priorityHash]].
    */
  def priorityHashCtes(src: String, key: String, seed: Long, carry: String): String =
    priorityHashCtes(src, key, seed.toString, carry)

  /** Seed-as-SQL-expression overload: lets one CTE chain hash the same key
    * under a per-row seed column (e.g. a08's depth-indexed CMS rows) —
    * identical arithmetic, the seed just comes from `src` instead of a
    * literal.
    */
  def priorityHashCtes(src: String, key: String, seed: String, carry: String): String =
    s"""ph1 AS (SELECT $carry,
       |              ((CAST($key AS HUGEINT) * 11400714819323198485 + $seed)
       |               % 18446744073709551616 + 18446744073709551616)
       |              % 18446744073709551616 AS m1 FROM $src),
       |ph2 AS (SELECT $carry, xor(m1, m1 >> 33) AS h1 FROM ph1),
       |ph3 AS (SELECT $carry,
       |              (h1 * 3981806797 + ((h1 * 4283543511) % 4294967296) * 4294967296)
       |              % 18446744073709551616 AS m2 FROM ph2),
       |ph4 AS (SELECT $carry, xor(m2, m2 >> 33) % 9223372036854775808 AS pri FROM ph3)""".stripMargin
}
