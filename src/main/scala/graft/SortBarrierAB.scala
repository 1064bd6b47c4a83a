package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, RepartitionByExpression, Sort}

/** Measured A/B for the sort-sampling hazard audit (r19 verdict #4),
  * companion to [[graft.SortHazardAudit]]: for each flagged query,
  * time the query AS-IS against the same plan with the r17 hash
  * barrier grafted under its terminal global Sort
  * (`Sort(order) ← RepartitionByExpression(order.keys) ← child`), at
  * warm min-of-3. The barrier pays one extra exchange of the OUTPUT
  * rows to spare the range sampler's full re-run of the child — so it
  * wins exactly when the child is expensive compute with narrow
  * output, and loses when the child is a bare scan or the output
  * carries the wide payload anyway. This probe measures instead of
  * guessing, per query; verdicts land in SCALE.md §r20.
  *
  * Lives in `org.apache.spark.sql.classic` ONLY to reach the
  * `private[sql]` `Dataset.ofRows` needed for logical-plan surgery —
  * probe tooling, never on any query path.
  *
  * Usage: `runMain org.apache.spark.sql.classic.GraftSortBarrierAB
  *   <sfDir> q_a q_b ...`
  */
object GraftSortBarrierAB {
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Both arms REBUILD the frame per force (the Bench protocol — each
    * timed invocation calls the query fn fresh), so iterative queries'
    * lazy localCheckpoints re-materialize in both arms alike; holding
    * one analyzed plan across runs would let its already-materialized
    * checkpoint scans serve the later arm for free (the first cut of
    * this probe did exactly that and read q_bfs at −95%). */
  private def timeIt(build: () => org.apache.spark.sql.DataFrame): Double = {
    force(build()) // warm
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      force(build())
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = graft.util.GraftSession.build("graft-sort-barrier-ab")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val asIs = timeIt(() => fn(spark, sfDir))
      def patched(): Option[LogicalPlan] =
        fn(spark, sfDir).queryExecution.analyzed match {
          case s @ Sort(order, true, child, _) =>
            Some(s.copy(child =
              RepartitionByExpression(order.map(_.child), child, None)))
          case _ => None
        }
      if (patched().isDefined) {
        val withBarrier = timeIt(() => Dataset.ofRows(
          spark.asInstanceOf[SparkSession], patched().get))
        println(f"[sort-ab] $name%-24s as-is $asIs%6.2fs  barrier $withBarrier%6.2fs  " +
          f"delta ${withBarrier - asIs}%+.2fs")
      } else
        println(f"[sort-ab] $name%-24s as-is $asIs%6.2fs  (terminal is not a global Sort - skipped)")
    }
    spark.stop()
  }
}
