package graft

/** Plan audit tool: dumps the formatted physical plan of each query (or
  * a named subset) so scan pruning (ReadSchema), predicate pushdown
  * (PushedFilters), join strategy, and WholeStageCodegen spans can be
  * inspected per round. Usage:
  *   runMain graft.PlanAudit <sfDir> [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = util.GraftSession.build("graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        println(s"\n================ $name ================")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
