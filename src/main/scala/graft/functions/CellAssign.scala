package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cell assignment for the clustering/IVF family —
  * the replacement for the interpreted `transform(centroidArrayLit,
  * c => struct(dist, cell)) |> array_sort |> element_at(1)` idiom.
  *
  * WHY (r14, the 500k-doc tier): the HOF idiom builds, boxes and
  * sorts a k-struct array PER ROW through interpreted lambda
  * evaluation — at 500k rows × 128 cells × 64 dims the measured
  * throughput was ~1.2M multiply-adds/s/core, three orders of
  * magnitude off JIT'd arithmetic, and one corpus-wide assignment
  * pass cost ~100s (q_kmeans_cluster spent 416s on its four passes).
  * These expressions run the same argmin/top-2 as a fused primitive
  * loop: no per-row allocation beyond the result row, whole-stage
  * codegen friendly, byte-identical results (the comparison rules
  * replicate the struct-sort tiebreaks exactly, including Spark
  * `round`'s HALF_UP-on-shortest-decimal semantics for the cosine
  * variant). The DuckDB oracles are untouched — they replicate the
  * same math their own way; these swap only the ENGINE's evaluation
  * strategy, per the mandate's preference order (native Expression
  * with doGenCode before anything else).
  */
object CellAssign {

  /** Spark `round(x, 6)` for doubles, exactly (RoundBase semantics:
    * NaN/±Inf pass through; else shortest-decimal BigDecimal,
    * HALF_UP). Public so generated code can call it via the static
    * forwarder `graft.functions.CellAssign.round6`. */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Spark `round(x, 0)` for doubles (same RoundBase semantics) —
    * the ×1e6 fixed-point bridge every sign-LSH bucketing runs. */
  def round0(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue()
}

/** `graft_cell_argmin(v, cents, ids)` — id of the nearest centroid by
  * INTEGER squared euclidean distance, ties to the smaller id:
  * exactly `element_at(array_sort(transform(...struct(d2, cell)...)),
  * 1).cell` over long vectors. `cents` is an array<array<long>>
  * literal (k × dim), `ids` the matching array<long> of cell ids. */
case class CellArgMin(v: Expression, cents: Expression, ids: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(v, cents, ids)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (v.dataType, cents.dataType, ids.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _),
            ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_cell_argmin expects (array<long>, array<array<long>>, array<long>)")
    }

  override def eval(input: InternalRow): Any = {
    val vv = v.eval(input)
    val cc = cents.eval(input)
    val ii = ids.eval(input)
    if (vv == null || cc == null || ii == null) return null
    val x = vv.asInstanceOf[ArrayData]
    val cs = cc.asInstanceOf[ArrayData]
    val is = ii.asInstanceOf[ArrayData]
    val k = cs.numElements()
    if (k == 0) return null
    val dim = x.numElements()
    var bestD2 = Long.MaxValue
    var bestId = Long.MaxValue
    var j = 0
    while (j < k) {
      val c = cs.getArray(j)
      var d2 = 0L
      var i = 0
      while (i < dim) {
        val d = x.getLong(i) - c.getLong(i)
        d2 += d * d
        i += 1
      }
      val id = is.getLong(j)
      if (d2 < bestD2 || (d2 == bestD2 && id < bestId)) {
        bestD2 = d2; bestId = id
      }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = v.genCode(ctx)
    val cGen = cents.genCode(ctx)
    val iGen = ids.genCode(ctx)
    val j = ctx.freshName("j"); val i = ctx.freshName("i")
    val k = ctx.freshName("k"); val dim = ctx.freshName("dim")
    val d2 = ctx.freshName("d2"); val d = ctx.freshName("d")
    val bestD2 = ctx.freshName("bestD2"); val bestId = ctx.freshName("bestId")
    val cell = ctx.freshName("cell"); val id = ctx.freshName("id")
    ev.copy(code =
      code"""
         |${vGen.code}
         |${cGen.code}
         |${iGen.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = 0L;
         |if (!${vGen.isNull} && !${cGen.isNull} && !${iGen.isNull}) {
         |  int $k = ${cGen.value}.numElements();
         |  if ($k > 0) {
         |    int $dim = ${vGen.value}.numElements();
         |    long $bestD2 = Long.MAX_VALUE;
         |    long $bestId = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $k; $j++) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $cell =
         |        ${cGen.value}.getArray($j);
         |      long $d2 = 0L;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        long $d = ${vGen.value}.getLong($i) - $cell.getLong($i);
         |        $d2 += $d * $d;
         |      }
         |      long $id = ${iGen.value}.getLong($j);
         |      if ($d2 < $bestD2 || ($d2 == $bestD2 && $id < $bestId)) {
         |        $bestD2 = $d2; $bestId = $id;
         |      }
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} = $bestId;
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CellArgMin =
    copy(v = newChildren(0), cents = newChildren(1), ids = newChildren(2))
}

/** `graft_cell_top2(v, nrm, cents, ids, nrms)` — the two best cells by
  * 6dp-ROUNDED cosine (ties to the smaller id), as
  * struct(cell1, sim1, cell2, sim2): exactly elements 1 and 2 of
  * `reverse(array_sort(transform(..., struct(round(dot/(nrm·cnrm), 6),
  * -id))))`. With k == 1 the second pair is null (element_at's
  * out-of-bounds null). */
case class CellTop2(
    v: Expression, nrm: Expression, cents: Expression,
    ids: Expression, nrms: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(v, nrm, cents, ids, nrms)
  override def dataType: DataType = StructType(Seq(
    StructField("cell1", LongType),
    StructField("sim1", DoubleType),
    StructField("cell2", LongType, nullable = true),
    StructField("sim2", DoubleType, nullable = true)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (v.dataType, nrm.dataType, cents.dataType, ids.dataType, nrms.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType,
            ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_cell_top2 expects (array<double>, double, array<array<double>>, " +
          "array<long>, array<double>)")
    }

  override def eval(input: InternalRow): Any = {
    val vv = v.eval(input); val nn = nrm.eval(input)
    val cc = cents.eval(input); val ii = ids.eval(input); val rr = nrms.eval(input)
    if (vv == null || nn == null || cc == null || ii == null || rr == null) return null
    val x = vv.asInstanceOf[ArrayData]
    val xn = nn.asInstanceOf[Double]
    val cs = cc.asInstanceOf[ArrayData]
    val is = ii.asInstanceOf[ArrayData]
    val ns = rr.asInstanceOf[ArrayData]
    val k = cs.numElements()
    if (k == 0) return null
    val dim = x.numElements()
    var s1 = Double.NegativeInfinity; var id1 = Long.MaxValue; var has1 = false
    var s2 = Double.NegativeInfinity; var id2 = Long.MaxValue; var has2 = false
    var j = 0
    while (j < k) {
      val c = cs.getArray(j)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += x.getDouble(i) * c.getDouble(i); i += 1 }
      val sim = CellAssign.round6(dot / (xn * ns.getDouble(j)))
      val id = is.getLong(j)
      // better-than rule of the (sim, -id) struct sort: higher sim,
      // then smaller id. Double.compare, not >/==: Spark's double
      // ordering ranks NaN largest and -0.0 < 0.0, and the struct
      // sort this replaces inherited exactly that.
      val c1 = java.lang.Double.compare(sim, s1)
      if (!has1 || c1 > 0 || (c1 == 0 && id < id1)) {
        if (has1) { s2 = s1; id2 = id1; has2 = true }
        s1 = sim; id1 = id; has1 = true
      } else {
        val c2 = java.lang.Double.compare(sim, s2)
        if (!has2 || c2 > 0 || (c2 == 0 && id < id2)) {
          s2 = sim; id2 = id; has2 = true
        }
      }
      j += 1
    }
    val out = new Array[Any](4)
    out(0) = id1; out(1) = s1
    if (has2) { out(2) = id2; out(3) = s2 }
    new GenericInternalRow(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = v.genCode(ctx); val nGen = nrm.genCode(ctx)
    val cGen = cents.genCode(ctx); val iGen = ids.genCode(ctx)
    val rGen = nrms.genCode(ctx)
    val j = ctx.freshName("j"); val i = ctx.freshName("i")
    val k = ctx.freshName("k"); val dim = ctx.freshName("dim")
    val dot = ctx.freshName("dot"); val sim = ctx.freshName("sim")
    val id = ctx.freshName("id"); val cell = ctx.freshName("cell")
    val s1 = ctx.freshName("s1"); val id1 = ctx.freshName("id1")
    val s2 = ctx.freshName("s2"); val id2 = ctx.freshName("id2")
    val has1 = ctx.freshName("has1"); val has2 = ctx.freshName("has2")
    val out = ctx.freshName("out")
    val c1 = ctx.freshName("c1"); val c2 = ctx.freshName("c2")
    ev.copy(code =
      code"""
         |${vGen.code}
         |${nGen.code}
         |${cGen.code}
         |${iGen.code}
         |${rGen.code}
         |boolean ${ev.isNull} = true;
         |InternalRow ${ev.value} = null;
         |if (!${vGen.isNull} && !${nGen.isNull} && !${cGen.isNull} &&
         |    !${iGen.isNull} && !${rGen.isNull}) {
         |  int $k = ${cGen.value}.numElements();
         |  if ($k > 0) {
         |    int $dim = ${vGen.value}.numElements();
         |    double $s1 = Double.NEGATIVE_INFINITY; long $id1 = Long.MAX_VALUE;
         |    double $s2 = Double.NEGATIVE_INFINITY; long $id2 = Long.MAX_VALUE;
         |    boolean $has1 = false; boolean $has2 = false;
         |    for (int $j = 0; $j < $k; $j++) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $cell =
         |        ${cGen.value}.getArray($j);
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $dot += ${vGen.value}.getDouble($i) * $cell.getDouble($i);
         |      }
         |      double $sim = graft.functions.CellAssign.round6(
         |        $dot / (${nGen.value} * ${rGen.value}.getDouble($j)));
         |      long $id = ${iGen.value}.getLong($j);
         |      int $c1 = java.lang.Double.compare($sim, $s1);
         |      if (!$has1 || $c1 > 0 || ($c1 == 0 && $id < $id1)) {
         |        if ($has1) { $s2 = $s1; $id2 = $id1; $has2 = true; }
         |        $s1 = $sim; $id1 = $id; $has1 = true;
         |      } else {
         |        int $c2 = java.lang.Double.compare($sim, $s2);
         |        if (!$has2 || $c2 > 0 || ($c2 == 0 && $id < $id2)) {
         |          $s2 = $sim; $id2 = $id; $has2 = true;
         |        }
         |      }
         |    }
         |    Object[] $out = new Object[4];
         |    $out[0] = $id1; $out[1] = $s1;
         |    if ($has2) { $out[2] = $id2; $out[3] = $s2; }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($out);
         |    ${ev.isNull} = false;
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CellTop2 =
    copy(v = newChildren(0), nrm = newChildren(1), cents = newChildren(2),
      ids = newChildren(3), nrms = newChildren(4))
}
