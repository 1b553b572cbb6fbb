package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels as native codegen expressions (same
  * rationale as [[VectorExpressions]]: the HOF forms are interpreted
  * and break whole-stage codegen; these stay tight Java loops inside
  * the enclosing stage).
  *
  * Codebook layout is one flat ARRAY<DOUBLE>:
  * `centroids[(j*ks + c)*dsub + d]` = dim `d` of centroid `c` of
  * subspace `j`, with `dsub = dim/m` inferred from the array sizes.
  */

/** pq_encode(vec, centroids) → ARRAY<INT> of length m: per subspace,
  * the index of the nearest (L2) centroid.
  */
case class PqEncode(left: Expression, right: Expression, m: Int, ks: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cent = b.asInstanceOf[ArrayData]
    val dsub = cent.numElements() / (m * ks)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var dist = 0.0; var d = 0
        while (d < dsub) {
          val diff = v.getDouble(j * dsub + d) - cent.getDouble((j * ks + c) * dsub + d)
          dist += diff * diff; d += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dsub = ctx.freshName("dsub")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist"); val diff = ctx.freshName("diff")
      s"""
         |int $dsub = $b.numElements() / ${m * ks};
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    double $dist = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $a.getDouble($j * $dsub + $d)
         |        - $b.getDouble(($j * $ks + $c) * $dsub + $d);
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** pq_adc_table(query_vec, centroids) → ARRAY<DOUBLE> of length m·ks:
  * `table[j*ks + c]` = dot(query subvector j, centroid c of subspace
  * j). For L2-normalized vectors Σ_j table[j][code_j] approximates the
  * full dot product (asymmetric distance computation).
  */
case class PqAdcTable(left: Expression, right: Expression, m: Int, ks: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cent = b.asInstanceOf[ArrayData]
    val dsub = cent.numElements() / (m * ks)
    val table = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var s = 0.0; var d = 0
        while (d < dsub) {
          s += v.getDouble(j * dsub + d) * cent.getDouble((j * ks + c) * dsub + d)
          d += 1
        }
        table(j * ks + c) = s; c += 1
      }
      j += 1
    }
    new GenericArrayData(table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dsub = ctx.freshName("dsub")
      val table = ctx.freshName("table")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
         |int $dsub = $b.numElements() / ${m * ks};
         |double[] $table = new double[${m * ks}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ks; $c++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $s += $a.getDouble($j * $dsub + $d)
         |        * $b.getDouble(($j * $ks + $c) * $dsub + $d);
         |    }
         |    $table[$j * $ks + $c] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($table);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcTable =
    copy(left = newLeft, right = newRight)
}

/** pq_adc_score(codes, table) → DOUBLE: Σ_j table[j*ks + codes[j]] —
  * the per-candidate ADC lookup sum; m array reads, no float math on
  * the corpus vector at all.
  */
case class PqAdcScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) { s += table.getDouble(j * ks + codes.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val mv = ctx.freshName("m")
      s"""
         |int $mv = $a.numElements();
         |double ${ev.value}Acc = 0.0;
         |for (int $j = 0; $j < $mv; $j++) {
         |  ${ev.value}Acc += $b.getDouble($j * $ks + $a.getInt($j));
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  def encode(vec: Column, centroids: Column, m: Int, ks: Int): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(vec), ColumnBridge.expression(centroids), m, ks))

  def adcTable(vec: Column, centroids: Column, m: Int, ks: Int): Column =
    ColumnBridge.column(PqAdcTable(
      ColumnBridge.expression(vec), ColumnBridge.expression(centroids), m, ks))

  def adcScore(codes: Column, table: Column, ks: Int): Column =
    ColumnBridge.column(PqAdcScore(
      ColumnBridge.expression(codes), ColumnBridge.expression(table), ks))
}
