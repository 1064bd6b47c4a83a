package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot matches the HOF composition bit-for-bit (codegen path)") {
    val df = Seq(
      (Seq(1.5, -2.0, 3.25), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.4))).toDF("a", "b")
    val rows = df.select(
      expr("graft_dot(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (native, hof) => assert(native === hof) }
  }

  test("graft_dot yields NULL on unequal-length arrays, matching zip_with+aggregate") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val row = df.select(
      expr("graft_dot(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect().head
    assert(row.isNullAt(0), "native must not silently sum over the shorter prefix")
    assert(row.isNullAt(1), "HOF reference semantics: null-padded product -> null sum")
  }

  test("graft_roll matches a JVM byte fold, handles empty and null") {
    val df = Seq(Some("hello"), Some(""), None).toDF("t")
    val got = df.select(expr("graft_roll(encode(t, 'UTF-8'))")).collect()
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(got(0).getLong(0) === ref("hello"))
    assert(got(1).getLong(0) === 0L)
    assert(got(2).isNullAt(0))
  }

  test("VectorMean skips null and empty vectors without inflating the count") {
    val z = VectorMean.zero
    val afterEmpty = VectorMean.reduce(z, Seq.empty[Float])
    assert(afterEmpty._2 === 0L, "empty vector must not count toward the mean")
    val afterReal = VectorMean.reduce(afterEmpty, Seq(2.0f, 4.0f))
    assert(VectorMean.finish(afterReal) === Seq(2.0, 4.0))
    val ragged = intercept[IllegalArgumentException] {
      VectorMean.reduce(afterReal, Seq(1.0f))
    }
    assert(ragged.getMessage.contains("dimension mismatch"))
  }

  test("graft_cell_top2 == the (sim,-id) struct-sort idiom it replaces, incl. ties") {
    // deterministic vectors; centroid 2 duplicates centroid 0 so the
    // ROUNDED-sim tie must resolve to the smaller id on both paths
    val vecs = (0 until 60).map { r =>
      (r.toLong, (0 until 16).map(d => math.sin(r * 1.7 + d * 0.9) * 2).toArray.toSeq)
    }
    val cs: Seq[(Long, Seq[Double], Double)] = Seq(0L, 1L, 2L, 3L).map { c =>
      // centroid 2 is EXACTLY centroid 0 → guaranteed rounded-sim tie
      val src = if (c == 2L) 0L else c
      val v = (0 until 16).map(d => math.cos(src * 1.3 + d) + 0.5)
      (c, v, math.sqrt(v.map(x => x * x).sum))
    }
    val df = vecs.toDF("vec_id", "v")
      .select(col("vec_id"),
        transform(col("v"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    def csim(c: (Long, Seq[Double], Double)) =
      round(call_function("graft_dot", col("v"), array(c._2.map(lit(_)): _*)) /
        (col("nrm") * lit(c._3)), 6)
    val simArr = array(cs.map(c =>
      struct(csim(c).as("s"), lit(-c._1).as("nid"))): _*)
    val sortedDesc = reverse(array_sort(simArr))
    val centsLit = array(cs.map(c => array(c._2.map(lit(_)): _*)): _*)
    val idsLit = array(cs.map(c => lit(c._1)): _*)
    val nrmsLit = array(cs.map(c => lit(c._3)): _*)
    val rows = df
      .withColumn("t2", call_function("graft_cell_top2",
        col("v"), col("nrm"), centsLit, idsLit, nrmsLit))
      .select(
        col("t2.cell1"), col("t2.sim1"), col("t2.cell2"), col("t2.sim2"),
        (-element_at(sortedDesc, 1).getField("nid")).as("r1"),
        element_at(sortedDesc, 1).getField("s").as("rs1"),
        (-element_at(sortedDesc, 2).getField("nid")).as("r2"),
        element_at(sortedDesc, 2).getField("s").as("rs2"))
      .as[(Long, Double, Long, Double, Long, Double, Long, Double)].collect()
    rows.foreach { case (c1, s1, c2, s2, r1, rs1, r2, rs2) =>
      assert((c1, s1, c2, s2) === ((r1, rs1, r2, rs2)),
        "native top-2 diverged from the struct-sort reference")
    }
  }

  test("graft_cell_argmin == the (d2, cell) struct-sort idiom over long vectors") {
    val vecs = (0 until 50).map { r =>
      (r.toLong, (0 until 8).map(d => ((r * 31 + d * 7) % 19 - 9).toLong).toSeq)
    }
    // centroid 3 duplicates centroid 1: d2 tie resolves to smaller id
    val cents: Seq[(Long, Seq[Long])] = Seq(
      (1L, Seq(1L, -2L, 3L, 0L, 5L, -1L, 2L, 2L)),
      (3L, Seq(1L, -2L, 3L, 0L, 5L, -1L, 2L, 2L)),
      (7L, Seq(-4L, 0L, 1L, 1L, -3L, 2L, 0L, 6L)))
    val df = vecs.toDF("vec_id", "vi")
    val centArr = array(cents.map { case (id, ci) =>
      struct(lit(id).as("cell"), array(ci.map(lit(_)): _*).as("ci")) }: _*)
    val d2 = transform(centArr, c =>
      struct(
        aggregate(zip_with(col("vi"), c.getField("ci"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d2"),
        c.getField("cell").as("cell")))
    val centsLit = array(cents.map { case (_, ci) => array(ci.map(lit(_)): _*) }: _*)
    val idsLit = array(cents.map { case (id, _) => lit(id) }: _*)
    val rows = df.select(
        call_function("graft_cell_argmin", col("vi"), centsLit, idsLit).as("native"),
        element_at(array_sort(d2), 1).getField("cell").as("ref"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, r) => assert(n === r) }
  }

  test("graft_dot is null-safe and type-checked") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(expr("graft_dot(a, b)")).collect().head.isNullAt(0))
    val err = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").select(expr("graft_dot(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_dot") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
