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

  /** Per-query times scraped from a prior bench JSON. Regex-scrapes
    * `"q_name":<seconds>` pairs so it reads both this main's stdout
    * line and the driver's BENCH_r{N}.json wrapper (which embeds the
    * same fragment in a `tail` field).
    */
  private[graft] def loadBaseline(path: String): Map[String, Double] = {
    val text = scala.io.Source.fromFile(path)
    try "\"(q_[a-z0-9_]+)\":(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)".r
      .findAllMatchIn(text.mkString)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
    finally text.close()
  }

  /** Regression gate: queries slower than 2x the baseline AND above an
    * absolute floor (sub-0.3s timings are harness noise at this scale).
    * Only meaningful against a SAME-HARNESS baseline (noop sink,
    * r04 onward) — comparing to an r01-r03 count() file is fiction.
    */
  private[graft] def regressions(
      now: Seq[(String, Double)],
      base: Map[String, Double],
      factor: Double = 2.0,
      floorSec: Double = 0.3): Seq[(String, Double, Double)] =
    now.collect {
      case (name, t) if t >= 0 && base.get(name).exists(b =>
        b > 0 && t > b * factor && t > floorSec) => (name, t, base(name))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("BENCH_ITERS", "3").toInt
    // Local-iteration subset, e.g. SPARK_GRAFT_BENCH_ONLY=q_lang_id,q_setops
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = util.GraftSession.build("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    // A typo'd or empty ONLY must fail, not silently bench (and gate)
    // nothing — an interpolated-but-unset shell var yields "".
    only.foreach { names =>
      require(names.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but selects no queries")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    var failed = List.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
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

    // Per-query budget gate vs a previous same-harness round, e.g.
    // SPARK_GRAFT_BENCH_BASELINE=BENCH_r04.json (protects the honest
    // noop-sink numbers from silent plan regressions).
    val regressed = sys.env.get("SPARK_GRAFT_BENCH_BASELINE").toSeq.flatMap { p =>
      val r = regressions(results, loadBaseline(p))
      r.foreach { case (name, now, base) =>
        System.err.println(
          f"[bench] REGRESSION $name: $now%.2fs vs baseline $base%.2fs (>2x)")
      }
      r
    }
    if (failed.nonEmpty) sys.exit(1)
    if (regressed.nonEmpty) sys.exit(2)
  }
}
