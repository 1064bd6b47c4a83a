package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Equivalence of the grouped bucket expressions (r15) against the
  * join+window formulations they replaced — on RANDOM buckets, row
  * for row, unrounded doubles compared exactly (the expressions claim
  * bit-identity, so approximate comparison would mask a real drift).
  */
class BucketKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Random bucketed members: a few buckets of mixed sizes (including
    * a singleton and an empty-result shape), deterministic seed. */
  private lazy val members = {
    val rnd = new scala.util.Random(7)
    val rows = for {
      (bucket, sz) <- Seq(0 -> 9, 1 -> 1, 2 -> 17, 3 -> 2, 4 -> 5)
      i <- 0 until sz
    } yield {
      val v = Array.fill(16)(rnd.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (bucket, rnd.nextInt(1000000).toLong * 10 + bucket, v.toSeq, nrm)
    }
    // distinct ids guaranteed by construction salt (id % 10 == bucket)
    rows.toDF("bucket", "vec_id", "v", "nrm").localCheckpoint(true)
  }

  test("graft_bucket_knn == bucket self-join + row_number window, bit for bit") {
    val grouped = members.groupBy(col("bucket"))
      .agg(collect_list(struct(col("vec_id"), col("v"), col("nrm"))).as("ms"))
      .select(explode(call_function("graft_bucket_knn", col("ms"), lit(3))).as("e"))
      .select(col("e.vec_id"), col("e.nbr_id"), col("e.sim"),
        col("e.rn").cast(LongType).as("rn"))
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))

    val nbrs = members.select(col("bucket"), col("vec_id").as("nbr_id"),
      col("v").as("nv"), col("nrm").as("nnrm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    val joined = members.join(nbrs, Seq("bucket"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("sim", expr("graft_dot(v, nv)") / (col("nrm") * col("nnrm")))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("vec_id"), col("nbr_id"), col("sim"), col("rn"))
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))

    assert(grouped.length === joined.length)
    grouped.zip(joined).foreach { case (g, j) =>
      assert(g === j, s"grouped $g != joined $j") // sim compared EXACTLY
    }
  }

  test("graft_bucket_pairs == bucket self-join + threshold filter, bit for bit") {
    val thr = 0.1
    val grouped = members.groupBy(col("bucket"))
      .agg(collect_list(struct(col("vec_id"), col("v"), col("nrm"))).as("ms"))
      .select(explode(call_function("graft_bucket_pairs", col("ms"), lit(thr))).as("e"))
      .select(col("e.id1"), col("e.id2"), col("e.sim"))
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))

    val right = members.select(col("bucket"), col("vec_id").as("id2"),
      col("v").as("v2"), col("nrm").as("n2"))
    val joined = members.join(right, Seq("bucket"))
      .filter(col("vec_id") < col("id2"))
      .withColumn("sim", expr("graft_dot(v, v2)") / (col("nrm") * col("n2")))
      .filter(col("sim") >= thr)
      .select(col("vec_id").as("id1"), col("id2"), col("sim"))
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))

    assert(grouped.length === joined.length)
    assert(grouped.nonEmpty, "fixture must produce above-threshold pairs")
    grouped.zip(joined).foreach { case (g, j) =>
      assert(g === j, s"grouped $g != joined $j")
    }
  }
}
