package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` demo — element-wise mean of an embedding column
  * (SURVEY §2.5 "UDF/UDAF": the one custom-aggregate extension-point
  * proof; everything else in the engine is built-ins).
  *
  * Merge is associative+commutative (sum vector + count), so Spark runs
  * it partial+final like any native aggregate — constant state per
  * group (d doubles), no row buffering: the shape that survives 100 TB.
  * Register with `udaf(VectorMean)` or use on a typed
  * `KeyValueGroupedDataset`.
  */
object VectorMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  /** Ragged inputs are a data bug, not a shape to average over — fail
    * fast with the offending dimensions instead of corrupting the sum
    * (or throwing ArrayIndexOutOfBounds mid-aggregation). */
  private def requireSameDim(expected: Int, got: Int, where: String): Unit =
    require(expected == got,
      s"VectorMean.$where: embedding dimension mismatch — accumulator has " +
        s"$expected dims, input has $got (ragged vector column)")

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    // Empty vectors are skipped like nulls — folding one in would
    // inflate the count without contributing dimensions (and make the
    // accumulator's zero-state indistinguishable from real state).
    if (v == null || v.isEmpty) b
    else {
      val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      requireSameDim(acc.length, v.length, "reduce")
      var i = 0
      while (i < v.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      requireSameDim(a._1.length, b._1.length, "merge")
      var i = 0
      while (i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
