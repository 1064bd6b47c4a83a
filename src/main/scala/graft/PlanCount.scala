package graft

/** Diagnostic main: print each named query's shuffle-exchange count,
  * measured exactly the way PlanContractSpec's budget tests count it
  * (operator-position `Exchange ` lines; broadcast and reused
  * exchanges excluded). Used to set a new query's budget before
  * pinning it: `runMain graft.PlanCount <sfDir> q_a q_b ...`.
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = util.GraftSession.build("plan-count")
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, args(0))
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      val n = plan.linesIterator.count(
        _.dropWhile(c => "+-:| ".contains(c)).startsWith("Exchange "))
      println(s"$name: $n exchanges")
    }
    spark.stop()
  }
}
