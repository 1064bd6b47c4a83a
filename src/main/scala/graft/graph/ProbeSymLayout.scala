package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.{ArtifactCache, Tables}

/** Same-session 3-way layout A/B for the r21 symEdges artifact —
  * cross-session runs on this bimodal host drift ±30%, so the layout
  * decision (AQE-planned vs stable hash(a) at cores vs at size/64MB)
  * is taken from ONE session timing the three consumer shapes that
  * disagree: the LPA round loop, the kcore peel, and the degree
  * census. Probe tooling only.
  */
object ProbeSymLayout {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeIt(tag: String)(build: () => DataFrame): Unit = {
    force(build())
    val t = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      force(build())
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[sym-probe] $tag%-44s $t%6.3fs")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.util.GraftSession.build("graft-probe-sym")
    s.sparkContext.setLogLevel("ERROR")
    val e0 = Tables.t(s, dir, "lineitem")
      .select((col("l_suppkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"))
      .distinct()
      .localCheckpoint(false)
    def union = e0.union(e0.select(col("b").as("a"), col("a").as("b")))

    val vA = union.localCheckpoint(false) // AQE-planned, layout lost
    val vB = ArtifactCache.planWithStablePartitioning(s) {
      union.repartition(col("a")).sortWithinPartitions(col("a"), col("b"))
        .localCheckpoint(false) // hash(a) @ shuffle.partitions
    }
    val partsC = math.max(1, math.ceil(e0.count() * 2 * 16.0 / (64L << 20)).toInt)
    val vC = ArtifactCache.planWithStablePartitioning(s) {
      union.repartition(partsC, col("a")).sortWithinPartitions(col("a"), col("b"))
        .localCheckpoint(false) // hash(a) @ size/64MB
    }
    Seq(vA, vB, vC).foreach(force) // materialize all outside timing
    println(s"[sym-probe] partsC=$partsC rddParts A=${vA.rdd.getNumPartitions} " +
      s"B=${vB.rdd.getNumPartitions} C=${vC.rdd.getNumPartitions}")

    def lpa(e: DataFrame) = {
      val edges = e.toDF("src", "dst")
      GraphQueries.labelPropagate(edges, 3)
        .groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("lbl"))
    }
    def peel3(e: DataFrame) = GraphQueries.peel(e, 20, 3)
    def degcen(e: DataFrame) =
      e.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_nodes")).orderBy(col("d"))

    for ((tag, v) <- Seq("A aqe-lost" -> vA, "B hash@32" -> vB, s"C hash@$partsC" -> vC)) {
      timeIt(s"lpa3+census   [$tag]")(() => lpa(v))
      timeIt(s"kcore peel3   [$tag]")(() => peel3(v))
      timeIt(s"degree census [$tag]")(() => degcen(v))
    }
    s.stop()
  }
}
