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
  * The line also carries a `"cold"` object (r21): per-query
  * FIRST-invocation seconds, i.e. the untimed warm-up the min-of-N
  * protocol excludes — where every persisted artifact's build cost
  * lives. It is gated (ColdFactor/ColdFloorSec) against the baseline
  * artifact's committed colds so a build-path regression can no
  * longer hide in the warm-up (r20 verdict #2).
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
    * line and the driver's BENCH_r{N}.json wrapper — whose `tail` field
    * embeds the fragment as a JSON STRING, i.e. with escaped quotes
    * (`\"q_x\":0.32`). The quotes are therefore optionally
    * backslash-prefixed; without that, a driver file parsed to ZERO
    * entries and the gate silently checked nothing (r06 finding).
    */
  private[graft] def loadBaseline(path: String): Map[String, Double] = {
    val text = scala.io.Source.fromFile(path)
    try "\\\\?\"(q_[a-z0-9_]+)\\\\?\":(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)".r
      .findAllMatchIn(text.mkString)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
    finally text.close()
  }

  /** Per-query COLD (first-invocation) seconds from a bench artifact's
    * `"cold"` object — the r20 verdict's blind spot: every persisted
    * artifact's build cost lands in the untimed warm-up, so a
    * build-path regression was invisible to the gate. The object is
    * emitted BEFORE `"queries"` on the line, so [[loadBaseline]]'s
    * whole-text scrape (last occurrence wins in `toMap`) still returns
    * the warm numbers untouched. Escaped-quote driver tails parse the
    * same way as [[loadBaseline]].
    */
  private[graft] def loadCold(path: String): Map[String, Double] = {
    val text = scala.io.Source.fromFile(path)
    try {
      """\\?"cold\\?":\s*\{([^}]*)\}""".r.findFirstMatchIn(text.mkString)
        .map(_.group(1))
        .fold(Map.empty[String, Double]) { body =>
          "\\\\?\"(q_[a-z0-9_]+)\\\\?\":(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)".r
            .findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble)
            .toMap
        }
    } finally text.close()
  }

  /** Cold-run regression thresholds: first-invocation times carry
    * one-shot JIT/codegen and every persisted artifact's build, so the
    * floor sits at 2s — at sf0.1 only the genuinely artifact-backed
    * colds clear it, while at the docs tiers (builds of 10-35s) the
    * gate bites exactly where the r20 verdict wanted it: a build-path
    * regression can no longer hide in the untimed warm-up. */
  private[graft] val ColdFactor = 2.0
  private[graft] val ColdFloorSec = 2.0

  /** Names the gate CANNOT check because the baseline lacks them —
    * either genuinely new queries (fine) or a truncated baseline file
    * (the driver's BENCH_r{N}.json `tail` field truncates from the
    * FRONT: r05's lost the 8 alphabetically-first queries, silently
    * shrinking any gate that read it). Surfaced loudly in main so a
    * partial baseline can never quietly narrow the gate.
    */
  private[graft] def uncovered(base: Map[String, Double], names: Seq[String]): Seq[String] =
    names.filterNot(base.contains).sorted

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

  /** Merge rule for the persisted baseline (r08 verdict #1): an
    * inflated first recording that stays UNDER the 2x retry threshold
    * sails past retry-confirm and becomes the committed budget —
    * 2x of an inflated entry then doubles next round's allowance (the
    * upward ratchet; r08 committed q_substr_dedup at 4.60s vs 1.56s
    * isolated). Persisting per-query min(new, prior-confirmed) means
    * the committed budget can only tighten; a genuine plan regression
    * still surfaces because the GATE compares live timings against the
    * tight prior, not against the inflated recording. Failed entries
    * (t<0) and queries absent from the prior pass through unchanged.
    *
    * Prior entries absent from `now` are PRESERVED (union, not
    * map-over-now): a narrowed run persisted into an existing
    * multi-entry artifact (e.g. SPARK_GRAFT_BENCH_OUT=bench_sf40.json
    * with ONLY=q_pagerank) must refresh only the queries it actually
    * timed, never silently truncate the artifact's committed entry set
    * to the subset (ADVICE r12 — the canonical-path guard protects
    * only bench_local.json).
    */
  private[graft] def mergeBaseline(
      now: Seq[(String, Double)],
      prior: Map[String, Double]): Seq[(String, Double)] = {
    val nowNames = now.map(_._1).toSet
    now.map { case (name, t) =>
      name -> prior.get(name).filter(_ > 0)
        .fold(t)(p => if (t >= 0) math.min(t, p) else t)
    } ++ prior.toSeq.collect {
      // preserve failed markers (negative) too — the record that a
      // query exists-but-failed must survive a narrowed refresh
      case (name, p) if !nowNames.contains(name) => (name, p)
    }.sortBy(_._1)
  }

  /** Aggregate-creep soft warning (r15 verdict #5): the per-query gate
    * only fires at >2× per query, so a run where MANY queries drift
    * 10-50% passes silently while the tier total climbs round over
    * round (observed: sf1 249.4s → 267.3s with zero per-query flags).
    * When the measured total over the gated queries exceeds the
    * committed baseline total by `factor`, surface it loudly — a
    * WARNING, not an exit code: totals are noisier than per-query
    * minimums and the min-merge ratchet already protects the budget.
    */
  private[graft] def totalCreepWarning(
      now: Seq[(String, Double)], base: Map[String, Double],
      factor: Double = 1.15): Option[String] = {
    val shared = now.filter { case (n, t) => t >= 0 && base.get(n).exists(_ > 0) }
    val nowTotal = shared.map(_._2).sum
    val baseTotal = shared.map { case (n, _) => base(n) }.sum
    if (baseTotal > 0 && nowTotal > baseTotal * factor)
      Some(f"[bench] WARNING aggregate creep: ${shared.size} gated queries " +
        f"total $nowTotal%.1fs vs committed $baseTotal%.1fs " +
        f"(${nowTotal / baseTotal}%.2fx > $factor%.2fx soft threshold, " +
        "no per-query >2x flags) — many small drifts, inspect before they compound")
    else None
  }

  /** Host-speed control queries (r18 verdict #4): the bimodal bench
    * host cost three sf1 attempts and two docs-tier attempts across
    * r16-r18, each diagnosed by HAND-timing an unchanged-code query
    * (the judge's q_distinct-at-2.24x call). This pins that evidence
    * into the harness: before the main pass, Bench times the first 3
    * preference-listed controls that exist in the registry AND have a
    * committed budget in the gate reference, and prints a host-speed
    * factor (median of now/committed). The factor ANNOTATES regression
    * flags — it never excuses them (a flagged query still exits 2; the
    * human reads the factor when deciding whether to re-run in a
    * quieter window). Preference order favors stable, rarely-edited
    * queries with entries in every tier artifact (docs tiers lack the
    * relational tables, so q_distinct falls through to the dedup-family
    * controls there) and SPANS SIZES — the bimodal host hits sub-second
    * queries hardest (fixed per-job latency), so an all-tiny control
    * set would read a representative window as catastrophic; mixing a
    * sub-second control with multi-second ones makes the median track
    * what the gated queries actually experience.
    */
  private[graft] val ControlPreference: Seq[String] = Seq(
    "q_distinct", "q_simhash", "q_ngram_jaccard", "q_dedup",
    "q_minhash_lsh", "q_cosine_topk", "q_topk")

  /** Median of now/committed over the control timings (upper-middle
    * for even counts — conservative on a 2-entry set). None when no
    * control has both a positive timing and a committed budget. */
  private[graft] def hostFactor(
      controls: Seq[(String, Double)],
      base: Map[String, Double]): Option[Double] = {
    val ratios = controls.collect {
      case (n, t) if t > 0 && base.get(n).exists(_ > 0) => t / base(n)
    }.sorted
    if (ratios.isEmpty) None else Some(ratios(ratios.size / 2))
  }

  /** Append one line to a telemetry log, dropping it (with a stderr
    * note) on IO failure — telemetry must never fail a run. */
  private def appendLog(path: String, line: String): Unit =
    try {
      val w = new java.io.FileWriter(path, true)
      try w.write(line + "\n") finally w.close()
    } catch {
      case e: java.io.IOException => System.err.println(
        s"[bench] WARNING: log $path unwritable (${e.getMessage}) — entry dropped")
    }

  /** On a FULL run the registry is authoritative: prior baseline
    * entries whose query no longer exists (renamed/deleted) would
    * otherwise persist in the artifact forever — mergeBaseline
    * union-preserves them and uncovered() only reports the OPPOSITE
    * direction (ADVICE r13). Subset runs can't tell "deleted" from
    * "not selected", so they never prune. */
  private[graft] def pruneStale(
      prior: Map[String, Double], registry: Set[String],
      fullRun: Boolean): Map[String, Double] =
    if (!fullRun) prior
    else {
      val stale = prior.keySet -- registry
      if (stale.nonEmpty)
        System.err.println(
          s"[bench] pruning ${stale.size} stale baseline entries no longer " +
            s"in the registry: ${stale.toSeq.sorted.mkString(", ")}")
      prior -- stale
    }

  /** A scale-tier preset (r13 verdict #6): one env var
    * (`SPARK_GRAFT_BENCH_TIER=sf40|sf1`) turns a tier re-bench into
    * ONE mechanical command — corpus dir (auto-built via
    * [[ScaleSmoke.buildCorpus]] when missing), persisted artifact,
    * iteration count, family subset, and the regression gate against
    * the artifact's own committed budgets all default together, where
    * the r13 recipes needed two commands and a hand-set baseline.
    * Every individual env var still overrides its preset field. */
  private[graft] final case class Tier(
      mult: Int, sfDir: String, out: String, iters: Int,
      family: Option[String], docsOnly: Boolean = false)

  private[graft] def tierOf(name: String): Tier = name match {
    // sf40: the 20-query heavy tail at the 40× corpus (BASELINE.md §r11)
    case "sf40" => Tier(40, ScaleSmoke.corpusDir(40), "bench_sf40.json", 2,
      Some("heavy"))
    // sf1: full-registry breadth at the mult-100 corpus (BASELINE.md §r13)
    case "sf1" => Tier(100, ScaleSmoke.corpusDir(100), "bench_sf1.json", 1,
      None)
    // docs1000: the document-scaled tier (r14 verdict #1) — 500k docs /
    // 500k×64 embeddings, documents+embeddings ONLY (the quadratic
    // dedup/ANN hazards grow with document count; this is 10× sf1's
    // docs at none of its relational cost). The tier that caught all
    // three r14 scale cliffs, now a one-command gated artifact.
    case "docs1000" => Tier(1000, ScaleSmoke.docsCorpusDir(1000),
      "bench_docs1000.json", 1, Some("docs"), docsOnly = true)
    // docs2000: the 1M-doc tier (r18, gating the r17 stretch once the
    // q_semantic_dedup n^1.5 fix landed) — same mechanics as docs1000,
    // so an n^1.5-class regression in the dedup/ANN families can never
    // re-enter silently between rounds.
    case "docs2000" => Tier(2000, ScaleSmoke.docsCorpusDir(2000),
      "bench_docs2000.json", 1, Some("docs"), docsOnly = true)
    case other => throw new IllegalArgumentException(
      s"unknown SPARK_GRAFT_BENCH_TIER '$other' (known: sf40, sf1, docs1000, docs2000)")
  }

  /** Launch-guard threshold for a run (r19 verdict #2): the env knob
    * wins everywhere; with no knob, only the sf1 tier (the one whose
    * full-registry pass costs ~5 min per rejected attempt) gets the
    * 1.3× default the four rejected r16–r19 windows converged on. */
  private[graft] def launchGuardLimit(tier: Option[Tier]): Option[Double] =
    sys.env.get("SPARK_GRAFT_MAX_HOST_FACTOR").map(_.toDouble)
      .orElse(tier.filter(_.out == "bench_sf1.json").map(_ => 1.3))

  /** Resolve the ONLY + FAMILY knobs to a query-name subset (None =
    * bench everything). Both knobs validate loudly — a typo'd or empty
    * value must fail, not silently bench (and gate) nothing — and when
    * both are set the selection is their UNION, so one command can time
    * a module plus a stray query.
    */
  private[graft] def selection(
      only: Option[String], family: Option[String]): Option[Set[String]] = {
    val byName = only.map { v =>
      val names = v.split(",").map(_.trim).filter(_.nonEmpty).toSet
      require(names.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but selects no queries")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
      names
    }
    val byFamily = family.map { v =>
      val fams = v.split(",").map(_.trim).filter(_.nonEmpty).toSet
      require(fams.nonEmpty, "SPARK_GRAFT_BENCH_FAMILY is set but selects no families")
      val unknown = fams -- SparkEntry.families.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_FAMILY names unknown families: ${unknown.mkString(", ")} " +
          s"(known: ${SparkEntry.families.keys.toSeq.sorted.mkString(", ")})")
      fams.flatMap(SparkEntry.families)
    }
    (byName, byFamily) match {
      case (None, None) => None
      case (a, b)       => Some(a.getOrElse(Set.empty) ++ b.getOrElse(Set.empty))
    }
  }

  /** A persist target may only min-merge runs at ITS OWN scale factor:
    * merging a different-sf run would ratchet the artifact's budgets
    * to the smaller corpus's times forever (one forgotten
    * SPARK_GRAFT_SF_DIR would corrupt bench_sf40.json downward, and
    * the ratchet can never recover upward). */
  /** The `sf` field a bench artifact was recorded at, if readable. */
  private[graft] def recordedSf(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (!f.exists) None
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(src.mkString).map(_.group(1))
      finally src.close()
    }
  }

  private def requireSameSf(priorFile: java.io.File, sfDir: String): Unit =
    recordedSf(priorFile.getPath).foreach { sf =>
      require(sf == sfDir,
        s"$priorFile was recorded at sf '$sf' but this run is at '$sfDir' — " +
          "min-merging across scale factors would corrupt the budget; " +
          "point SPARK_GRAFT_BENCH_OUT elsewhere or fix SPARK_GRAFT_SF_DIR")
    }

  def main(args: Array[String]): Unit = {
    val tier = sys.env.get("SPARK_GRAFT_BENCH_TIER").map(tierOf)
    // A tier run IS a scale-audit run: imply the round-census telemetry
    // (labelComponents convergence etc.) that SCALE.md's workflow
    // records, instead of silently losing it to a forgotten
    // SPARK_GRAFT_AUDIT (ADVICE r17 — see SimilarityQueries.auditLog).
    tier.foreach(_ => sys.props.getOrElseUpdate("graft.audit", "1"): Unit)
    val sfDir = sys.env.get("SPARK_GRAFT_SF_DIR")
      .orElse(tier.map(_.sfDir)).getOrElse("/root/testdata/sf0.1")
    // Docs tiers also append each dataset's bucket-census histogram to
    // the committed census log (r17 verdict #8), so skew growth is
    // tracked in-repo round-over-round. Only for the tier's OWN
    // generator-built corpus (same canonical-path test as the floors,
    // ADVICE r18): a foreign SPARK_GRAFT_SF_DIR run is non-persisting
    // and must not pollute the committed skew telemetry either.
    tier.filter(t => t.docsOnly &&
        new java.io.File(sfDir).getCanonicalFile ==
          new java.io.File(t.sfDir).getCanonicalFile)
      .foreach(_ =>
        sys.props.getOrElseUpdate("graft.census.log", "docs/census_log.md"): Unit)
    val iters = sys.env.get("BENCH_ITERS")
      .map(_.toInt).getOrElse(tier.fold(3)(_.iters))
    // Local-iteration subsets: SPARK_GRAFT_BENCH_ONLY=q_lang_id,q_setops
    // and/or SPARK_GRAFT_BENCH_FAMILY=similarity,graph (union when both).
    val only = selection(
      sys.env.get("SPARK_GRAFT_BENCH_ONLY"),
      sys.env.get("SPARK_GRAFT_BENCH_FAMILY").orElse(tier.flatMap(_.family)))
    val outEnv = sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(tier.map(_.out))
    // Pre-flight the persist target's scale factor BEFORE paying for
    // the timing run: min-merging a different-sf run into an existing
    // artifact would ratchet its budgets to the smaller corpus forever
    // (the same check guards the write below; here it just fails in
    // seconds instead of after minutes of measurement).
    outEnv.foreach { p =>
      requireSameSf(new java.io.File(p), sfDir)
    }
    val spark = util.GraftSession.build("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Tier corpora are synthetic and reproducible — a missing dir
    // regenerates (deterministic generator, seed 1) instead of failing
    // the recipe's first step. An explicit SPARK_GRAFT_SF_DIR is the
    // caller's own corpus; never second-guess it.
    tier.foreach { t =>
      // heap pre-flight BEFORE corpus build/warm-up (r19 verdict #6) —
      // a ≥2M-doc tier on the default heap dies mid-stage after
      // minutes of work; fail in milliseconds naming the knob instead
      ScaleSmoke.requireHeapFor(t.mult, t.docsOnly)
      if (sys.env.get("SPARK_GRAFT_SF_DIR").isEmpty &&
          !ScaleSmoke.corpusComplete(t.sfDir, t.docsOnly)) {
        // completeness = every table dir carries _SUCCESS (r15 advice:
        // bare existence silently served a crashed partial build)
        System.err.println(s"[bench] tier corpus ${t.sfDir} missing/incomplete — " +
          s"building (ScaleSmoke mult=${t.mult}${if (t.docsOnly) ", docs only" else ""})")
        if (t.docsOnly) ScaleSmoke.buildDocsCorpus(spark, t.mult): Unit
        else ScaleSmoke.buildCorpus(spark, t.mult): Unit
      }
    }

    var failed = List.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Baseline loads BEFORE timing so first-pass suspects can be
    // retry-confirmed below, and so a bad path fails fast. Under a
    // TIER the artifact's own committed budgets are the default gate
    // (that is what makes the tier run mechanical — regressions exit
    // 2 with no extra flags); a first-ever tier run has no artifact
    // and records ungated, like any first recording.
    val baselineEnv = sys.env.get("SPARK_GRAFT_BENCH_BASELINE")
      .orElse(tier.map(_.out).filter(p => new java.io.File(p).exists))
    val baseOpt = baselineEnv.map { p =>
      val base = loadBaseline(p)
      // An empty parse means the file isn't a bench artifact at all —
      // gating against it would be a silent no-op, which is exactly the
      // failure mode this block exists to prevent.
      require(base.nonEmpty, s"baseline $p parsed to zero per-query entries")
      val missing = uncovered(base, selected.map(_._1))
      if (missing.nonEmpty)
        System.err.println(
          s"[bench] WARNING: baseline $p lacks ${missing.size}/${selected.size} " +
            s"selected queries — these are NOT gated: ${missing.mkString(", ")}")
      base
    }
    // Retry-confirm reference: the explicit baseline if given, else the
    // committed bench_local.json beside the build. Every round a driver
    // one-shot flagged a >2x that min-of-3 later cleared (r05 x2, r09
    // q_pagerank at 2.26x vs 1.21x isolated); wiring the committed
    // budget in as the DEFAULT retry reference makes the bench
    // self-correcting — a mid-run spike gets an isolated re-time and
    // the min is what's reported — without changing the exit-code
    // contract (the regression GATE below still fires only when
    // SPARK_GRAFT_BENCH_BASELINE is explicitly set).
    val retryRef = baseOpt.orElse {
      val f = new java.io.File("bench_local.json")
      if (f.exists) Some(loadBaseline(f.getPath)).filter(_.nonEmpty) else None
    }
    // Warm-up beyond the per-query one: execute the historically
    // slowest selected queries once before ANY timing, so the first
    // heavy queries of the run don't pay one-time JVM/codegen/IO-cache
    // costs that read as regressions (r09 driver flag). Bounded to 3
    // queries and logged; a missing reference file just skips it.
    retryRef.foreach { ref =>
      val warm = selected.filter { case (n, _) => ref.getOrElse(n, 0.0) > 0 }
        .sortBy { case (n, _) => -ref(n) }.take(3)
      warm.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          force(fn(spark, sfDir))
          System.err.println(
            f"[bench] WARMUP $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        } catch {
          case e: Throwable => // timing pass reports the real failure
            System.err.println(s"[bench] WARMUP $name failed: ${e.getMessage}")
        }
      }
    }
    // First-invocation (cold) seconds per query, keyed on the FIRST
    // time() call so a retry-confirm's already-warm pre-run can't
    // overwrite the honest cold number. For the 3 pre-warmed slowest
    // queries and the host controls the "cold" run is warm by protocol
    // — their entries under-read; everything else (including every
    // artifact build ridden by the warm-up) is captured.
    val coldOf = scala.collection.mutable.Map.empty[String, Double]
    def time(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val c0 = System.nanoTime()
      force(fn(spark, sfDir)) // warm-up: plan + JIT + page cache
      coldOf.getOrElseUpdate(name, (System.nanoTime() - c0) / 1e9): Unit
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // Host-speed control pre-pass (r18 verdict #4) — see
    // [[ControlPreference]]. Runs against the same corpus with the same
    // harness, so the factor is committed-budget-relative, not an
    // absolute clock. Only meaningful when the reference artifact was
    // RECORDED at this run's corpus (r19: an ungated foreign-corpus
    // stretch run read its 2.5M-doc controls against sf0.1 budgets and
    // printed a 25× "host" factor — scale, not host); an sf mismatch
    // skips the pre-pass entirely, which also skips controls whose
    // tables don't exist in a docs-only corpus. Controls must also be
    // IN the selected set (ADVICE r19, second option): a targeted
    // SPARK_GRAFT_BENCH_ONLY=q_x iteration run doesn't select any
    // control, so it pays nothing extra — while the docs/heavy TIER
    // family runs (which the factor was built for, r18 #4) keep their
    // pre-pass because the control queries are members of the family.
    val retryRefPath = baselineEnv.orElse {
      val f = new java.io.File("bench_local.json")
      if (f.exists) Some(f.getPath) else None
    }
    val controlsApply =
      retryRefPath.exists(p => recordedSf(p).contains(sfDir))
    val hostInfo: Option[(Double, String)] = retryRef.filter(_ => controlsApply)
      .flatMap { ref =>
      val names = ControlPreference
        .filter(n => SparkEntry.queries.contains(n) &&
          ref.get(n).exists(_ > 0) && only.forall(_.contains(n)))
        .take(3)
      val times = names.map { n =>
        n -> (try {
          // 3 untimed warms, min of 3: controls are sub-second queries
          // whose committed minimums come from deep-warm sessions — a
          // shallow-warm control would read session-cold codegen/JIT
          // as "slow host" on an idle machine
          (1 to 3).foreach(_ => force(SparkEntry.queries(n)(spark, sfDir)))
          (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            force(SparkEntry.queries(n)(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }.min
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] CONTROL $n failed: ${e.getMessage}")
            -1.0
        })
      }
      hostFactor(times, ref).map { f =>
        val detail = times.map { case (n, t) =>
          f"$n $t%.2fs/${ref(n)}%.2fs" }.mkString(", ")
        (f, detail)
      }
    }
    hostInfo.foreach { case (f, detail) =>
      val line = f"[bench] host-speed factor $f%.2fx vs committed " +
        f"(controls: $detail)" + (if (f > 1.3)
          " — SLOW HOST WINDOW: timings below will read inflated; " +
            "flags are annotated, never excused" else "")
      System.err.println(line)
      sys.props.get("graft.census.log").foreach(p =>
        appendLog(p, f"[host-speed] factor $f%.2fx ($detail) sf=$sfDir"))
      // Control-conditioned launch guard (r19 verdict #2): four sf1
      // attempts each burned ~5 min to an exit 2 on host factor alone
      // — an expensive way to learn the window is busy. When the
      // controls read slower than the tier's guard threshold, refuse
      // to START the timing pass: exit 4 ("host too slow to measure",
      // distinct from a regression's exit 2), artifacts untouched.
      // Default applies only to the full-registry sf1 tier (the short
      // tiers are cheap enough to just run and reject);
      // SPARK_GRAFT_MAX_HOST_FACTOR overrides or enables anywhere.
      launchGuardLimit(tier).filter(f > _).foreach { lim =>
        System.err.println(
          f"[bench] LAUNCH GUARD: factor $f%.2fx > $lim%.2fx — refusing to " +
            "start the gated tier timing pass; re-attempt in a quiet window " +
            "(override: SPARK_GRAFT_MAX_HOST_FACTOR)")
        spark.stop()
        sys.exit(4)
      }
    }
    val firstPass = selected.map { case (name, fn) =>
      try name -> time(name, fn)
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          name -> -1.0
      }
    }
    // Retry-confirm: an 80-query same-process run occasionally spikes a
    // sub-second query >2x from JVM/GC interference alone (r05 verdict:
    // q_fingerprint/q_hll_distinct on UNCHANGED code; reproduced r06 on
    // q_rolling_hash — isolated re-run was 1.4x). Re-time first-pass
    // suspects immediately and take the min — a REAL plan regression
    // reproduces under isolation; noise does not. The confirmed numbers
    // are also what's recorded, so the next round's baseline is cleaner.
    val results = retryRef.fold(firstPass) { base =>
      val suspects = regressions(firstPass, base).map(_._1).toSet
      firstPass.map { case (name, t) =>
        if (!suspects.contains(name) || t < 0) name -> t
        else {
          // A transient failure in the isolated re-run (OOM, flaky IO)
          // must not crash the whole bench — fall back to the
          // first-pass time, which then hits the gate as a regression.
          val t2 =
            try time(name, SparkEntry.queries(name))
            catch {
              case e: Throwable =>
                System.err.println(
                  s"[bench] RETIME of $name failed (${e.getMessage}); keeping first-pass time")
                t
            }
          System.err.println(
            f"[bench] RETIMED $name: first pass $t%.2fs, isolated $t2%.2fs")
          name -> math.min(t, t2)
        }
      }
    }
    val ok = results.filter(_._2 >= 0)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // cold object in the same (alphabetical) order as queries, placed
    // BEFORE "queries" so loadBaseline's last-wins scrape is unaffected
    def coldJson(cold: Map[String, Double], names: Seq[String]): String =
      names.collect { case n if cold.contains(n) =>
        "\"" + n + "\":" + cold(n)
      }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","cold":${coldJson(coldOf.toMap, results.map(_._1))},"queries":$qs,"sf":"$sfDir","failed":${failed.size}}"""
    println(line)
    // Docs-tier ACCURACY floors (r16 verdict #3): the tier gate fails
    // on a planted-recall/completeness drop — not just a time
    // regression — so a change that narrows LSH width or breaks
    // candidate generation cannot pass the one command by being fast.
    // Floor failures also block the min-merge persist below (a wrong-
    // but-fast run must not ratchet the budget). The floors assume the
    // GENERATOR's planted mod-97/89/twin structure, so they only run
    // on the tier's own generator-built corpus. Identity is decided by
    // CANONICAL PATH against tier.sfDir, not by whether the env var is
    // set (ADVICE r17 medium: SPARK_GRAFT_SF_DIR pointed at the tier's
    // own dir used to skip the floors while requireSameSf still let the
    // run ratchet the committed budget — the wrong-but-fast loophole).
    // A genuinely foreign corpus still skips (the plants don't exist
    // there), but a skipped-floors docs run is NON-PERSISTING: the
    // merge routes to the .rejected side path below, so the committed
    // budget can only ratchet under a floor-checked run.
    val floorsSkipped = tier.exists(t => t.docsOnly &&
      new java.io.File(sfDir).getCanonicalFile !=
        new java.io.File(t.sfDir).getCanonicalFile)
    val floorErrs = if (tier.exists(_.docsOnly)) {
      if (floorsSkipped) {
        System.err.println(
          "[bench] WARNING: docs-tier accuracy floors SKIPPED — " +
            "SPARK_GRAFT_SF_DIR points away from the tier corpus and the " +
            "floors assume the generator's planted structure; this run " +
            "will NOT ratchet the committed tier budget")
        Nil
      } else {
        val errs =
          try ScaleSmoke.docsFloors(spark, sfDir)
          catch { case e: Throwable => Seq(s"floor check crashed: ${e.getMessage}") }
        errs.foreach(m => System.err.println(s"[bench] FLOOR FAILED: $m"))
        errs
      }
    } else Nil
    spark.stop()

    // Per-query budget gate vs a previous same-harness round, e.g.
    // SPARK_GRAFT_BENCH_BASELINE=bench_local.json from the prior round
    // (protects the honest noop-sink numbers from silent plan
    // regressions). Only retry-confirmed regressions reach here.
    val regressed = baseOpt.toSeq.flatMap { base =>
      val r = regressions(results, base)
      r.foreach { case (name, now, b) =>
        System.err.println(
          f"[bench] REGRESSION $name: $now%.2fs vs baseline $b%.2fs (>2x, confirmed isolated)" +
            hostInfo.fold("")(h => f" [host-speed ${h._1}%.2fx]"))
      }
      // aggregate-creep soft warning (r15 verdict #5) — visible even
      // when no individual query trips the 2x gate
      totalCreepWarning(results, base).foreach(System.err.println)
      r
    }
    // Cold-run gate (r20 verdict #2): the artifact-backed family's
    // once-per-corpus build cost rides the untimed warm-up, so it is
    // gated HERE, against the baseline artifact's own committed cold
    // entries. No retry-confirm is possible (a second in-process run
    // is warm by construction), so the floor is the filter.
    val coldRegressed = baselineEnv.map(loadCold).filter(_.nonEmpty)
      .toSeq.flatMap { coldBase =>
        val coldNow = results.collect {
          case (n, t) if t >= 0 && coldOf.contains(n) => n -> coldOf(n)
        }
        val r = regressions(coldNow, coldBase, ColdFactor, ColdFloorSec)
        r.foreach { case (name, now, b) =>
          System.err.println(
            f"[bench] COLD REGRESSION $name: warm-up $now%.2fs vs committed " +
              f"$b%.2fs (>${ColdFactor}%.0fx — a build/artifact path got slower; " +
              "the timed numbers below exclude it)" +
              hostInfo.fold("")(h => f" [host-speed ${h._1}%.2fx]"))
        }
        r
      }
    // Persist the builder's own COMPLETE per-query result in-repo so the
    // next round can gate against a full same-harness baseline instead
    // of the driver's front-truncated `tail` (see [[uncovered]]). Subset
    // (ONLY) runs are partial by construction and must not overwrite it;
    // neither may a run with confirmed regressions or failures — else the
    // regressed timings become the next baseline and the budget ratchets
    // (the regressed line goes to a side path for inspection instead).
    // A subset run MAY persist to an EXPLICIT alternate artifact
    // (SPARK_GRAFT_BENCH_OUT pointing away from bench_local.json) —
    // that is how the 40× heavy-tail reference bench_sf40.json is
    // produced with one command (FAMILY=heavy, BASELINE.md §r12); the
    // full-run budget file itself stays protected from partial runs.
    // The protection compares CANONICAL paths (./bench_local.json and
    // an absolute alias must not bypass it and truncate the committed
    // 219-entry budget to the subset).
    val isBudgetFile = outEnv.forall(p =>
      new java.io.File(p).getCanonicalFile ==
        new java.io.File("bench_local.json").getCanonicalFile)
    if (only.isEmpty || !isBudgetFile) {
      val out = outEnv.getOrElse("bench_local.json")
      val target =
        if (failed.isEmpty && regressed.isEmpty && coldRegressed.isEmpty &&
          floorErrs.isEmpty && !floorsSkipped) out
        else out + ".rejected"
      // Scale-factor guard on the min-merge (also pre-flighted in
      // main(), before the timing run).
      requireSameSf(new java.io.File(out), sfDir)
      // stdout keeps the honest measured numbers (the driver reads
      // them); the PERSISTED budget merges against the prior committed
      // baseline via [[mergeBaseline]] so it can only ratchet down.
      // Prior ALWAYS comes from the OUT artifact itself, never from
      // SPARK_GRAFT_BENCH_BASELINE: gating a 40x run against
      // bench_local.json (sf0.1) while persisting to bench_sf40.json
      // would otherwise union-copy every foreign-sf baseline entry into
      // the persisted artifact (ADVICE r13 medium) — requireSameSf only
      // validates the OUT file's recorded sf, not the baseline file's.
      // baseOpt stays what it is: the regression-GATE reference only.
      val priorRaw = {
        val f = new java.io.File(out)
        if (f.exists) loadBaseline(f.getPath) else Map.empty[String, Double]
      }
      val prior = pruneStale(priorRaw, SparkEntry.queries.keySet,
        fullRun = only.isEmpty)
      val merged = mergeBaseline(results, prior)
      val mergedQs = merged.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val mergedTotal = merged.collect { case (_, v) if v >= 0 => v }.sum
      // cold budgets min-merge exactly like the warm ones (and prior-
      // only entries survive subset refreshes the same way)
      val priorCold = pruneStale(
        if (new java.io.File(out).exists) loadCold(out)
        else Map.empty[String, Double],
        SparkEntry.queries.keySet, fullRun = only.isEmpty)
      val mergedCold = mergeBaseline(
        coldOf.toMap.toSeq.sortBy(_._1), priorCold)
      val mergedColdJs = mergedCold.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val mergedLine =
        s"""{"metric":"total","value":$mergedTotal,"unit":"sec","cold":$mergedColdJs,"queries":$mergedQs,"sf":"$sfDir","failed":${failed.size}}"""
      val w = new java.io.PrintWriter(target, "UTF-8")
      try w.println(mergedLine) finally w.close()
    }
    if (failed.nonEmpty) sys.exit(1)
    if (regressed.nonEmpty || coldRegressed.nonEmpty) sys.exit(2)
    if (floorErrs.nonEmpty) sys.exit(3)
  }
}
