package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector similarity as native Catalyst expressions with codegen.
  *
  * The north star requires similarity search over `array<float>` embedding
  * columns. A Scala UDF would box every element and fall out of whole-stage
  * codegen; these expressions instead generate a tight primitive loop
  * (float → double widening, left-to-right accumulation) inside the
  * generated stage — the preference order SURVEY.md §4.2 sets out
  * (builtin > custom Expression > UDF).
  *
  * Accumulation is deliberately left-to-right in a single pass so results
  * are reproducible and match the DuckDB oracle formula
  * `list_dot_product(a,b) / (sqrt(list_dot_product(a,a)) * sqrt(list_dot_product(b,b)))`
  * evaluated over `CAST(x AS DOUBLE[])`.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }
}

/** dot(a, b) with double accumulation. NULL on mismatched lengths — a
  * silent common-prefix product would mask ragged/corrupt embedding rows
  * with plausible-but-wrong similarities (DuckDB's list_dot_product
  * errors on mismatch; null keeps the engine total-function but visible).
  */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // null elements propagate
        dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i); }
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Integer dot product over two quantization-code arrays (array<bigint>)
  * — the scoring kernel of int8 scalar-quantized similarity search (s09).
  * Pure integer arithmetic (codes ≤ 255, dims ≤ thousands: nowhere near
  * Long overflow), so the score replays EXACTLY in any engine — no
  * float-accumulation caveats at all. NULL on mismatched lengths, like
  * [[DotProduct]].
  */
case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "quantized_dot"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> arguments, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        dot += x.getLong(i) * y.getLong(i)
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $dot += $a.getLong($i) * $b.getLong($i); }
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))), one fused pass.
  * NULL on mismatched lengths (see [[DotProduct]]).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "cosine_similarity"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // null elements propagate
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv
        na += xv * xv
        nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      double $xv = (double) $a.getFloat($i);
         |      double $yv = (double) $b.getFloat($i);
         |      $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |    }
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** argmax-by-cosine over a broadcast centroid list: `nearest_centroid(emb,
  * cents)` where `cents` is `array<struct<cent_id: bigint, centroid:
  * array<float>>>`, returning the cent_id whose centroid has the highest
  * cosine similarity to `emb` (ties → the earliest array entry, i.e. the
  * smallest cent_id when the list is sorted).
  *
  * This exists so IVF cell assignment is a pure map-side expression: the
  * naive form (crossJoin with the centroid table + `row_number` over a
  * per-vector window) shuffles N×|cells| rows just to take an argmax — at
  * 100 TB that's a |cells|×-corpus shuffle for a per-row decision. Here
  * the centroid list rides along as a single broadcast row and the argmax
  * runs inside whole-stage codegen with zero exchanges.
  *
  * NULL when `emb` is null or no centroid is comparable (null/ragged
  * entries are skipped, matching [[CosineSimilarity]]'s null-on-mismatch).
  */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType && f1.dataType.isInstanceOf[ArrayType] &&
            f1.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<struct<bigint, array<float>>>), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val dim = emb.numElements()
    var best = 0L
    var bestSim = Double.NegativeInfinity
    var found = false
    var i = 0
    val n = cents.numElements()
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val c = cents.getStruct(i, 2)
        if (!c.isNullAt(0) && !c.isNullAt(1)) {
          val cv = c.getArray(1)
          if (cv.numElements() == dim) {
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var ok = true
            var j = 0
            while (j < dim && ok) {
              if (emb.isNullAt(j) || cv.isNullAt(j)) ok = false
              else {
                val x = emb.getFloat(j).toDouble
                val y = cv.getFloat(j).toDouble
                dot += x * y; na += x * x; nb += y * y
              }
              j += 1
            }
            if (ok) {
              val sim = dot / (math.sqrt(na) * math.sqrt(nb))
              if (!found || sim > bestSim) { found = true; bestSim = sim; best = c.getLong(0) }
            }
          }
        }
      }
      i += 1
    }
    if (found) best else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val dim = ctx.freshName("dim")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ok = ctx.freshName("ok")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val found = ctx.freshName("found")
      s"""
         |int $n = $b.numElements();
         |int $dim = $a.numElements();
         |long $best = 0L; double $bestSim = Double.NEGATIVE_INFINITY; boolean $found = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($b.isNullAt($i)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $c = $b.getStruct($i, 2);
         |  if ($c.isNullAt(0) || $c.isNullAt(1)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |  if ($cv.numElements() != $dim) continue;
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0; boolean $ok = true;
         |  for (int $j = 0; $j < $dim && $ok; $j++) {
         |    if ($a.isNullAt($j) || $cv.isNullAt($j)) { $ok = false; }
         |    else {
         |      double x = (double) $a.getFloat($j);
         |      double y = (double) $cv.getFloat($j);
         |      $dot += x * y; $na += x * x; $nb += y * y;
         |    }
         |  }
         |  if (!$ok) continue;
         |  double $sim = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if (!$found || $sim > $bestSim) { $found = true; $bestSim = $sim; $best = $c.getLong(0); }
         |}
         |if ($found) { ${ev.value} = $best; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  import org.apache.spark.sql.graftx.Bridge

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Integer dot over quantization codes (see [[QuantizedDot]]). */
  def quantizedDot(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))

  def nearestCentroid(emb: Column, cents: Column): Column =
    Bridge.column(NearestCentroid(Bridge.expression(emb), Bridge.expression(cents)))

  /** SQL twin of [[cosineSim]] for the DuckDB oracle. */
  def cosineSql(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) / " +
      s"(sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))) * " +
      s"sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))"
}
