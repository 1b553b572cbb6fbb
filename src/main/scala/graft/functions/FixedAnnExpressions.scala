package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the FIXED (hash-gateable) ANN twins
  * (q48b/q52b/q53b/q78b and the frozen index lifecycles q108b/q109b).
  *
  * The first formulation unrolled the frozen-constant math into
  * composed Column chains — 16 centroids × 64 dims of left-associated
  * `(x - c)²` adds per projection. That blows Janino's 64 KB method
  * limit (`Code grows beyond 64 KB`), so the whole stage silently
  * fell back to interpreted eval — correct, but the hot scoring loop
  * ran a closure per arithmetic op. These expressions generate tight
  * Java loops instead (constants land in `ctx.addReferenceObj`
  * arrays, loops never unroll), so generated code is O(1) in the
  * constant sizes and the stage stays inside whole-stage codegen.
  *
  * Bit-exactness contract (the oracle gate depends on it): every loop
  * preserves the EXACT floating-point association of the Column form
  * it replaced — left-to-right element order, `acc + x·x` / `acc + d·d`
  * sequential adds, division by one `sqrt` value, `floor(x·1e6)` into
  * a long. Inputs are assumed finite with non-null elements and the
  * declared dimensionality — the gated corpus guarantees all three
  * (`FixedAnnSpec` pins the hashes).
  */
abstract class GraftArrayUnary extends UnaryExpression {

  /** The float/double dispatch below reads fixed-width array slots —
    * an integral-element array would be read at the wrong width
    * (silent garbage) or ClassCastException at execution. The HOF
    * forms these kernels replaced implicitly cast any numeric element;
    * here the contract is explicit: reject non-floating element types
    * at ANALYSIS time.
    */
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${getClass.getSimpleName} requires ARRAY<FLOAT> or " +
            s"ARRAY<DOUBLE> input, got ${other.catalogString}")
    }

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Java source reading element `i` of ArrayData `a` as double. */
  protected def readD(a: String, i: String): String =
    if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"

  protected def evalD(a: ArrayData, i: Int): Double =
    if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Exact integer dot of two ARRAY<LONG> fixed-point vectors —
  * `Σ a_i·b_i` in element order; the candidate-pair scoring kernel
  * (replaces `aggregate(zip_with(...))`, which is interpreted).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "LongDotProduct requires two ARRAY<BIGINT> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize an ARRAY<FLOAT|DOUBLE> to ARRAY<DOUBLE>: `x / √(Σx²)`
  * with the norm accumulated in element order; zero-norm vectors pass
  * through unnormalized (the `unitized` contract).
  */
case class UnitVector(child: Expression) extends GraftArrayUnary {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var n2 = 0.0
    var i = 0
    while (i < n) { val x = evalD(a, i); out(i) = x; n2 += x * x; i += 1 }
    val nm = math.sqrt(n2)
    if (nm > 0) {
      var j = 0
      while (j < n) { out(j) = out(j) / nm; j += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val n2 = ctx.freshName("n2")
      val nm = ctx.freshName("nm")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${readD(a, i)};
         |  $out[$i] = $x;
         |  $n2 += $x * $x;
         |}
         |double $nm = java.lang.Math.sqrt($n2);
         |if ($nm > 0) {
         |  for (int $j = 0; $j < $n; $j++) { $out[$j] = $out[$j] / $nm; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
}

/** 1e-6 fixed-point of an ARRAY<DOUBLE>: `floor(x·1e6)` as long per
  * element — bit-identical to Spark's `floor` on doubles.
  */
case class FixedPointVector(child: Expression) extends GraftArrayUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.floor(evalD(a, i) * 1e6).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (long) java.lang.Math.floor(${readD(a, i)} * 1.0E6);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FixedPointVector =
    copy(child = newChild)
}

/** Squared L2 distance of a unit ARRAY<DOUBLE> vector to EVERY frozen
  * centroid: `d2[c] = Σ_i (x_i − ctr_c_i)²` accumulated in dim order
  * (the exact chain the unrolled form computed). Missing trailing
  * dims read as 0.0 — gated vectors always carry the full `dim`.
  */
case class CentroidDistances(child: Expression, centroids: Seq[Seq[Double]])
    extends GraftArrayUnary {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def k: Int = centroids.size
  private def dim: Int = centroids.head.size
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val x = if (i < n) evalD(a, i) else 0.0
        val d = x - flat(c * dim + i)
        acc += d * d
        i += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $d = ($i < $n ? ${readD(a, i)} : 0.0) - $flatRef[$c * $dim + $i];
         |    $acc += $d * $d;
         |  }
         |  $out[$c] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDistances =
    copy(child = newChild)
}

/** Index of the FIRST-minimum frozen centroid by the exact d² chain
  * (`assignFixedCentroids` semantics), with the reserved cluster −1
  * for null or too-short vectors. Never null.
  */
case class NearestFixedCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends GraftArrayUnary {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def k: Int = centroids.size
  private def dim: Int = centroids.head.size
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return -1L
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < dim) return -1L
    var best = Double.PositiveInfinity
    var idx = 0L
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val d = evalD(a, i) - flat(c * dim + i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; idx = c.toLong }
      c += 1
    }
    idx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    val childGen = child.genCode(ctx)
    val a = childGen.value
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    val best = ctx.freshName("best")
    val code =
      code"""
         |${childGen.code}
         |long ${ev.value} = -1L;
         |if (!${childGen.isNull}) {
         |  int $n = $a.numElements();
         |  if ($n >= $dim) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    ${ev.value} = 0L;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        double $d = ${readD(a.toString, i)} - $flatRef[$c * $dim + $i];
         |        $acc += $d * $d;
         |      }
         |      if ($acc < $best) { $best = $acc; ${ev.value} = (long) $c; }
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestFixedCentroid =
    copy(child = newChild)
}

/** PQ-encode a unit ARRAY<DOUBLE> vector under frozen codebooks: per
  * subspace j, the code is the FIRST-minimum of the ks exact d²
  * chains over dims [j·dsub, (j+1)·dsub). Returns ARRAY<LONG> of m.
  */
case class PqCodesFrozen(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends GraftArrayUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def m: Int = codebooks.size
  private def ks: Int = codebooks.head.size
  private def dsub: Int = codebooks.head.head.size
  @transient private lazy val flat: Array[Double] =
    codebooks.flatten.flatten.toArray // [j][c][i] → j·ks·dsub + c·dsub + i

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var idx = 0L
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val p = j * dsub + i
          val x = if (p < n) evalD(a, p) else 0.0
          val d = x - flat((j * ks + c) * dsub + i)
          acc += d * d
          i += 1
        }
        if (acc < best) { best = acc; idx = c.toLong }
        c += 1
      }
      out(j) = idx
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("codebooksFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val idx = ctx.freshName("idx")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  long $idx = 0L;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $p = $j * $dsub + $i;
         |      double $d = ($p < $n ? ${readD(a, p)} : 0.0)
         |        - $flatRef[($j * $ks + $c) * $dsub + $i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $best) { $best = $acc; $idx = (long) $c; }
         |  }
         |  $out[$j] = $idx;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesFrozen =
    copy(child = newChild)
}

/** ADC lookup table of a query's unit ARRAY<DOUBLE> vector under
  * frozen codebooks: entry j·ks + c is `floor(1e6 · Σ_i x_{j·dsub+i} ·
  * cw_i)` — the fixed-point dot with codeword c of subspace j.
  */
case class PqQTableFrozen(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends GraftArrayUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def m: Int = codebooks.size
  private def ks: Int = codebooks.head.size
  private def dsub: Int = codebooks.head.head.size
  @transient private lazy val flat: Array[Double] =
    codebooks.flatten.flatten.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val p = j * dsub + i
          val x = if (p < n) evalD(a, p) else 0.0
          acc += x * flat((j * ks + c) * dsub + i)
          i += 1
        }
        out(j * ks + c) = math.floor(acc * 1e6).toLong
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("codebooksFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[${m * ks}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ks; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $p = $j * $dsub + $i;
         |      $acc += ($p < $n ? ${readD(a, p)} : 0.0)
         |        * $flatRef[($j * $ks + $c) * $dsub + $i];
         |    }
         |    $out[$j * $ks + $c] = (long) java.lang.Math.floor($acc * 1.0E6);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqQTableFrozen =
    copy(child = newChild)
}

/** All `tables` LSH bucket values of a fixed-point ARRAY<LONG> vector
  * under the frozen ±1 Rademacher planes: bit p of bucket t is the
  * sign of the exact integer projection `Σ_d vf_d · sign(t,p,d)`.
  * Signs derive from xxhash64 exactly as `Ann.radSign` — the DuckDB
  * oracle replays the same construction.
  */
case class RademacherBuckets(child: Expression, tables: Int, planes: Int,
    dim: Int) extends GraftArrayUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Unlike its siblings this kernel consumes the FIXED-POINT vector
    * (`getLong` reads) — ARRAY<BIGINT> in, not float/double.
    */
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "RademacherBuckets requires an ARRAY<BIGINT> fixed-point " +
            s"vector, got ${other.catalogString}")
    }

  @transient private lazy val signs: Array[Long] =
    Array.tabulate(tables * planes * dim) { x =>
      val t = x / (planes * dim)
      val p = (x / dim) % planes
      val d = x % dim
      graft.similarity.Ann.radSign(t, p, d)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var proj = 0L
        var d = 0
        while (d < n) {
          proj += a.getLong(d) * signs((t * planes + p) * dim + d)
          d += 1
        }
        if (proj > 0) bucket += (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("radSigns", signs, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    long $proj = 0L;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $proj += $a.getLong($d) * $signsRef[($t * $planes + $p) * $dim + $d];
         |    }
         |    if ($proj > 0) { $bucket += (1L << $p); }
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RademacherBuckets =
    copy(child = newChild)
}

object FixedAnnExpressions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)

  /** Exact integer dot of two ARRAY<LONG> columns (codegen loop). */
  def longDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(e(a), e(b)))

  /** L2-normalize to ARRAY<DOUBLE>; zero vectors pass through. */
  def unitVec(v: Column): Column = ColumnBridge.column(UnitVector(e(v)))

  /** `floor(x·1e6)` per element → ARRAY<LONG>. */
  def fixedPoint(v: Column): Column =
    ColumnBridge.column(FixedPointVector(e(v)))

  /** d² to every frozen centroid → ARRAY<DOUBLE> of |centroids|. */
  def centroidD2(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidDistances(e(v), centroids))

  /** First-minimum frozen-centroid index; −1 for null/short vectors. */
  def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestFixedCentroid(e(v), centroids))

  /** Frozen-codebook PQ codes → ARRAY<LONG> of m. */
  def pqCodes(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqCodesFrozen(e(v), codebooks))

  /** Frozen-codebook fixed-point ADC table → ARRAY<LONG> of m·ks. */
  def pqQTable(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqQTableFrozen(e(v), codebooks))

  /** All LSH bucket values under the frozen Rademacher planes. */
  def rademacherBuckets(v: Column, tables: Int, planes: Int, dim: Int): Column =
    ColumnBridge.column(RademacherBuckets(e(v), tables, planes, dim))
}
