package graft

/** Benchmark main: per-query wall time on SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout for the driver's BENCH_r{N}.json.
  *
  * Each query gets one warm-up run (session/JIT/IO-cache warm), then
  * the MIN of `BENCH_ITERS` timed runs is reported — the one-shot cold
  * number swung 1.9x between identical binaries (VERDICT r02), so min-of-3
  * is the signal, not the noise. A failing query prints its error and
  * fails the whole bench (exit 1) instead of silently scoring -1.
  *
  * Evaluation is forced through the `noop` sink, not `count()`:
  * Catalyst prunes unreferenced projections under a count, so a count
  * harness times scan+count for projection-only queries (the r03 bench
  * under-measured q_text_bpe/q_rolling_hash/q_window_* that way). The
  * noop sink fully evaluates and serializes every output row, then
  * discards it — honest per-query cost, no disk noise.
  */
object Bench {
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("BENCH_ITERS", "3").toInt
    val spark = util.GraftSession.build("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        force(fn(spark, sfDir)) // warm-up: plan + JIT + page cache
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          force(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          name -> -1.0
      }
    }
    val ok = results.filter(_._2 >= 0)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
