package graft.analytics

import org.apache.spark.sql.functions._

/** Scratch probe for the q_outlier_mad rewrite (r21): times the census
  * variants against the r20 two-full-percentile form so the adopted
  * shape is the measured winner, not a guess. Probe tooling only.
  * Usage: runMain graft.analytics.ProbeMad <sfDir>
  */
object ProbeMad {
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeIt(tag: String)(build: () => org.apache.spark.sql.DataFrame): Unit = {
    force(build())
    val t = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      force(build())
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[mad-probe] $tag%-28s $t%6.3fs")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.util.GraftSession.build("graft-probe-mad")
    s.sparkContext.setLogLevel("ERROR")
    def ev = graft.util.Tables.events(s, dir)

    timeIt("r20 as-was (2 full pctl)") { () =>
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5D)").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs(col("value") - col("med")))
      val madAgg = dev.groupBy(col("event_type"))
        .agg(expr("percentile(adev, 0.5D)").as("mad"))
      dev.join(broadcast(madAgg), Seq("event_type"))
        .withColumn("score_r", round(col("adev") / col("mad"), 6))
        .filter(col("score_r") > lit(3.5))
        .select(col("event_id"), col("event_type"), col("value"), col("score_r"))
        .orderBy(col("event_id"))
    }

    def censusQuery(ckpt: Boolean) = {
      val byVal0 = ev.groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("c"))
      val byVal = if (ckpt) byVal0.localCheckpoint(false) else byVal0
      val med = byVal.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5D, c)").as("med"))
      val stats = byVal.join(broadcast(med), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(abs(value - med), 0.5D, c)").as("mad"),
          max(col("med")).as("med"))
      ev.join(broadcast(stats), Seq("event_type"))
        .withColumn("score_r",
          round(abs(col("value") - col("med")) / col("mad"), 6))
        .filter(col("score_r") > lit(3.5))
        .select(col("event_id"), col("event_type"), col("value"), col("score_r"))
        .orderBy(col("event_id"))
    }
    timeIt("census + ckpt (adopted)")(() => censusQuery(true))
    timeIt("census no-ckpt")(() => censusQuery(false))

    // census stages in isolation
    timeIt("census agg only") { () =>
      ev.groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("c"))
    }
    timeIt("med only (freq pctl)") { () =>
      ev.groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5D, c)").as("med"))
    }
    timeIt("med only (full pctl)") { () =>
      ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5D)").as("med"))
    }
    s.stop()
  }
}
