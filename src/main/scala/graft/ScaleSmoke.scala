package graft
import graft.util.GraftSession
import org.apache.spark.sql.functions._
/** One-off scale smoke (not part of the driver contract): build a
  * synthetic corpus at SPARK_GRAFT_SMOKE_MULT× the sf0.01 row counts
  * (default 40×: 20k docs / 2.4M lineitem / 800k events) and time the
  * heavy operators to show the shapes scale linearly, not
  * quadratically. 100× (50k docs / 6M lineitem / 2M events) is the
  * claimed design-point check (r08 verdict #2) — run with
  * SPARK_GRAFT_SMOKE_MULT=100. SPARK_GRAFT_SMOKE_ONLY=q_a,q_b
  * restricts to a subset (e.g. the iterative family) for targeted
  * re-times.
  */
object ScaleSmoke {

  /** Canonical location of the mult× corpus (shared with Bench's tier
    * knob, which auto-builds a missing corpus via [[buildCorpus]]). */
  def corpusDir(mult: Int): String = s"/tmp/graft_sfbig_${mult}x"

  /** Canonical location of the docs-only mult× corpus (the docs1000
    * bench tier auto-builds a missing one via [[buildDocsCorpus]]). */
  def docsCorpusDir(mult: Int): String = s"/tmp/graft_docs_${mult}x"

  /** Tables a complete corpus dir must hold (docs tier vs full). */
  private val DocsTables = Seq("documents", "embeddings")
  private val AllTables = DocsTables ++ Seq("lineitem", "part", "supplier",
    "region", "events", "orders", "customer", "nation")

  /** Reuse validity (r15 advice): bare dir existence silently served a
    * crashed/partial previous build — the smoke/bench numbers and the
    * recall floors computed from it would be quietly wrong. A corpus
    * is reusable only when EVERY expected table directory carries
    * Spark's `_SUCCESS` commit marker (an interrupted generator leaves
    * the marker missing in the table it died in and writes the tables
    * in a fixed order, so the last table's marker implies the rest —
    * checked individually anyway, markers are free). */
  private[graft] def corpusComplete(dir: String, docsOnly: Boolean): Boolean = {
    val tables = if (docsOnly) DocsTables else AllTables
    tables.forall(t =>
      new java.io.File(s"$dir/$t.parquet/_SUCCESS").exists)
  }

  /** Docs-tier driver-heap pre-flight (r19 verdict #6): the 2.5M-doc
    * stretch died MID-STAGE at the default 8g heap
    * (`SparkOutOfMemoryError: UNABLE_TO_ACQUIRE_MEMORY`; in local mode
    * the context then stops and every subsequent query fails) — minutes
    * of generation and warm-up burned before the crash named the knob.
    * A docs tier at ≥ 2M docs (mult ≥ 4000) must name
    * `SPARK_DRIVER_MEM=32g` (the documented build.sbt knob, SCALE.md
    * §r19) BEFORE any work starts. Threshold 24 GiB, not 32: JVM
    * `maxMemory` under-reports the -Xmx value (survivor-space
    * reservation), so an exact compare would false-trip a genuine 32g
    * JVM. On a real cluster this is per-executor memory sizing — the
    * check guards only the local[32] harness, where driver = executor. */
  private[graft] def requireHeapFor(
      mult: Int, docsOnly: Boolean,
      heapBytes: Long = Runtime.getRuntime.maxMemory): Unit =
    if (docsOnly && mult >= 4000)
      require(heapBytes >= (24L << 30),
        s"docs tier mult=$mult (${mult / 2}k docs) exceeds the default " +
          "driver heap (2.5M docs OOM'd the 8g default mid-stage, SCALE.md " +
          "§r19) — re-run with SPARK_DRIVER_MEM=32g (current max " +
          f"heap ${heapBytes / (1L << 30)}%d GiB)")

  def main(args: Array[String]): Unit = {
    // A smoke run IS a scale-audit run: imply the round-census
    // telemetry SCALE.md's workflow records (ADVICE r17 — see
    // SimilarityQueries.auditLog).
    sys.props.getOrElseUpdate("graft.audit", "1"): Unit
    val mult = sys.env.getOrElse("SPARK_GRAFT_SMOKE_MULT", "40").toInt
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    requireHeapFor(mult,
      docsOnly = sys.env.get("SPARK_GRAFT_SMOKE_DOCS_ONLY").contains("1"))
    val spark = GraftSession.build("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_SMOKE_DOCS_ONLY=1: the document-scaled tier (r13
    // verdict #5) — only documents/embeddings are generated (fully
    // distributed, so mult=1000 → 500k docs works), and the caller
    // restricts SPARK_GRAFT_SMOKE_ONLY to the dedup/ANN/text families
    // that read those two tables. The quadratic hazards (shingle
    // buckets, band collisions, in-bucket kNN, component diameters)
    // grow with DOCUMENT count, not lineitem count — this tier stresses
    // exactly them without paying for 60M relational rows.
    val docsOnly = sys.env.get("SPARK_GRAFT_SMOKE_DOCS_ONLY").contains("1")
    // SPARK_GRAFT_SMOKE_REUSE=1: reuse an existing corpus dir instead
    // of regenerating (the generator is deterministic, but a rewrite
    // changes the parquet mtimes and therefore invalidates every
    // mtime-keyed derived artifact — persisted indexes, centroids,
    // cell assignments — forcing expensive rebuilds on the next
    // bench/tier run over the same corpus).
    val reuse = sys.env.get("SPARK_GRAFT_SMOKE_REUSE").contains("1")
    def orReuse(canonical: String)(build: => String): String =
      if (reuse && corpusComplete(canonical, docsOnly)) canonical else build
    // Targeted A/B of the top-k planner rule at scale (r14 verdict #4):
    // SPARK_GRAFT_TOPK_REWRITE=false times the WindowGroupLimit-only
    // plan; unset/true keeps the default-ON TopKPerKey path.
    sys.env.get("SPARK_GRAFT_TOPK_REWRITE")
      .foreach(v => spark.conf.set("spark.graft.topkRewrite", v))
    val dir =
      if (docsOnly) orReuse(docsCorpusDir(mult))(buildDocsCorpus(spark, mult))
      else orReuse(corpusDir(mult))(buildCorpus(spark, mult))
    runSmoke(spark, mult, only, dir)
  }

  /** Planted-structure ACCURACY floors for a [[buildDocsCorpus]]
    * corpus, returned as failure messages (empty = all floors hold) so
    * the docs1000 bench tier can gate on accuracy as well as time (r16
    * verdict #3): before this, the tier's one command only caught TIME
    * regressions — a change that silently narrowed LSH width or broke
    * candidate generation would pass (probably faster). Three floors,
    * each through the OPERATOR under test, kept in sync with the
    * generator's planted structure:
    *
    *  1. kNN recall — each planted cos ≈ 0.9999 twin must rank FIRST
    *     for its probe in the auto-width kNN graph (≥ 4/5, one
    *     plane-straddling twin is within tolerance — the ScaleSmoke
    *     floor, now tier-gated).
    *  2. Exact-dedup completeness — q_dedup must collapse EVERY
    *     planted exact copy (id ≡ 0 mod 97 whose successor is not
    *     itself mutated): collapsed-doc mass equals the planted count
    *     exactly (md5 grouping has no tolerance to give).
    *  3. Near-dup pair completeness — ≥ 90% of planted mutated copies
    *     (id ≡ 0 mod 89, first token replaced, shingle Jaccard ≈ 0.94)
    *     must surface as MinHash-LSH candidate pairs; 4-band/2-hash
    *     banding at that similarity misses ~2e-4 of pairs, so a
    *     sub-0.9 hit rate means candidate generation regressed, not
    *     luck.
    */
  def docsFloors(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[String] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.select(count(lit(1))).collect()(0).getLong(0)
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]

    val hitProbes = graft.similarity.SimilarityQueries.knnGraphPlanAuto(spark, dir)
      .filter(col("vec_id") < 5 && col("rn") === 1L &&
        col("nbr_id") === col("vec_id") + nDocs / 2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val knnHits = hitProbes.size
    System.err.println(s"[floors] knn_recall: $knnHits/5 planted twins ranked first")
    if (knnHits < 4)
      errs += s"knn recall floor: $knnHits/5 planted twins ranked first (need >= 4)"
    // Name the straddler (r16 verdict #5): a twin may miss rank-1 ONLY
    // because its 1%-noise vector landed across a hyperplane from its
    // probe — a DIFFERENT native-width bucket, so the edge cannot exist
    // in the bucket-blocked graph (the documented LSH recall trade). A
    // SAME-bucket miss means in-bucket scoring broke; no recall
    // tolerance forgives that, whatever the 4/5 count says.
    val missing = (0L until 5L).filterNot(hitProbes)
      .map(q => (q, q + nDocs / 2))
    if (missing.nonEmpty) {
      val audit = graft.similarity.SimilarityQueries
        .twinBucketAudit(spark, dir, missing)
      audit.foreach {
        case Right((q, tw, bq, bt, hd, cos)) =>
          System.err.println(
            f"[floors] knn miss audit: probe $q (bucket $bq) vs twin $tw " +
              f"(bucket $bt), plane Hamming distance $hd, cosine $cos%.6f")
          // cos ≥ 0.999 confirms the pair really is a planted twin (a
          // DESTROYED twin — the knn-floor count's job — may share a
          // bucket by chance and legitimately lose rank-1)
          if (hd == 0 && cos >= 0.999)
            errs += s"knn floor: probe $q's genuine twin $tw shares bucket " +
              s"$bq but did not rank first — in-bucket scoring regressed " +
              "(not a plane straddle)"
        // a planted id absent from the embeddings table is itself a
        // floor failure (truncated corpus), named instead of thrown
        // (ADVICE r17)
        case Left(msg) => errs += s"knn floor: $msg"
      }
    }

    // exact pairs: id ≡ 0 (mod 97) copies id+1's tokens VERBATIM unless
    // doc id+1 is itself a mutated copy ((id+1) ≡ 0 mod 89 — then the
    // copied tokens differ from id+1's actual text and no group forms)
    val plantedExact = spark.range(nDocs)
      .filter(col("id") % 97 === 0 && col("id") + 1 < nDocs &&
        (col("id") + 1) % 89 =!= 0)
      .count()
    val collapsed = graft.text.TextQueries.dedup.run(spark, dir)
      .filter(col("n_copies") >= 2)
      .agg(coalesce(sum(col("n_copies") - 1), lit(0L)))
      .collect()(0).getLong(0)
    System.err.println(
      s"[floors] exact_dedup: $collapsed collapsed of $plantedExact planted copies")
    if (collapsed != plantedExact)
      errs += s"exact-dedup completeness floor: q_dedup collapsed $collapsed docs, " +
        s"planted $plantedExact exact copies"

    // semantic-dedup twin prune floor (r18, gating the constant-
    // population block rule): each planted cos ≈ 0.9999 twin
    // (vec n/2+q for probe q) must be PRUNED by q_semantic_dedup's
    // blocked pair pass — threshold 0.4 is far below twin similarity,
    // so a miss means the twin never met a smaller-id neighbor in its
    // block. Tolerance shape = the kNN floor's: ≥ 4/5, and a miss is
    // forgiven ONLY when the audit shows the twin's block genuinely
    // split from its probe's (IVF cell or sub-plane straddle — the
    // documented recall trade of eb ≥ 1); a same-block survivor means
    // in-block scoring broke, which no tolerance forgives.
    val twinPairs = (0L until 5L).map(q => (q, q + nDocs / 2))
    val prunedTwins = graft.similarity.SimilarityQueries
      .semanticPrunedIds(spark, dir)
      .filter(col("id2").isInCollection(twinPairs.map(_._2)))
      .select(col("id2")).collect().map(_.getLong(0)).toSet
    System.err.println(
      s"[floors] semdedup_prune: ${prunedTwins.size}/5 planted twins pruned")
    if (prunedTwins.size < 4)
      errs += s"semantic-dedup prune floor: ${prunedTwins.size}/5 planted " +
        "twins pruned (need >= 4)"
    val unpruned = twinPairs.filterNot(t => prunedTwins(t._2))
    if (unpruned.nonEmpty) {
      val rows = graft.similarity.SimilarityQueries
        .semanticBlocked(spark, dir)
        .filter(col("vec_id").isInCollection(
          unpruned.flatMap(t => Seq(t._1, t._2))))
        .select(col("vec_id"), col("bucket"), col("v"), col("nrm"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getSeq[Double](2).toArray, r.getDouble(3))).toMap
      unpruned.foreach { case (q, tw) =>
        (rows.get(q), rows.get(tw)) match {
          case (Some((bq, vq, nq)), Some((bt, vt, nt))) =>
            var dot = 0.0
            var i = 0
            while (i < vq.length) { dot += vq(i) * vt(i); i += 1 }
            val cos = dot / (nq * nt)
            System.err.println(
              f"[floors] semdedup miss audit: probe $q (block $bq) vs " +
                f"twin $tw (block $bt), cosine $cos%.6f")
            // cos ≥ 0.999 confirms a genuine twin (the kNN floor's
            // rule): a DESTROYED twin sharing a block by chance is
            // below the 0.4 threshold and legitimately unpruned — the
            // 4/5 count above is what catches destroyed plants.
            if (bq == bt && cos >= 0.999)
              errs += s"semantic-dedup floor: genuine twin $tw shares " +
                s"probe $q's block $bq but was not pruned — in-block " +
                "scoring regressed (not a block straddle)"
          case _ =>
            errs += s"semantic-dedup floor: audit: vec_id $q or $tw absent " +
              "from embeddings (truncated or partial corpus?)"
        }
      }
    }

    // near-dup pairs: (id, id+1) for mutated copies whose successor is
    // itself neither an exact copy nor another mutated copy
    val plantedNear = spark.range(nDocs)
      .filter(col("id") % 89 === 0 && col("id") % 97 =!= 0 &&
        col("id") + 1 < nDocs &&
        (col("id") + 1) % 97 =!= 0 && (col("id") + 1) % 89 =!= 0)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val nearTotal = plantedNear.count()
    val nearHits = graft.similarity.SimilarityQueries.minhashLsh.run(spark, dir)
      .join(plantedNear, Seq("id1", "id2"), "left_semi")
      .count()
    System.err.println(
      s"[floors] neardup_pairs: $nearHits/$nearTotal planted LSH candidates found")
    if (nearTotal > 0 && nearHits.toDouble / nearTotal < 0.9)
      errs += s"near-dup pair completeness floor: $nearHits/$nearTotal planted " +
        "mutated copies surfaced as LSH candidates (need >= 90%)"

    errs.toSeq
  }

  /** Distributed documents+embeddings generator for the docs-scaled
    * tier at `/tmp/graft_docs_<mult>x`. Content is hash-derived (no
    * driver-side Seq — the committed 40×/100× corpora keep their
    * byte-identical driver-side generator), with planted structure
    * the family gates need:
    *  - every doc with id ≡ 0 (mod 97) is an EXACT copy of doc id+1
    *    (exact-dedup signal),
    *  - every doc with id ≡ 0 (mod 89) copies doc id+1 with its first
    *    token replaced (near-dup signal for MinHash/SimHash),
    *  - embeddings plant the standard cos ≈ 0.9999 twins: vec_ids
    *    [n/2, n/2+5) are probe (id − n/2)'s vector + 1% noise — the
    *    recall-floor gates (knn/ivf/beam) work unchanged. */
  def buildDocsCorpus(
      spark: org.apache.spark.sql.SparkSession, mult: Int,
      dirOverride: Option[String] = None): String = {
    val dir = dirOverride.getOrElse(docsCorpusDir(mult))
    val nDocs = 500L * mult
    // doc id ≡ 0 mod 97 → copy of id+1; mod 89 → near-dup of id+1
    val src = spark.range(nDocs).select(
      col("id"),
      when(col("id") % 97 === 0 && col("id") + 1 < nDocs, col("id") + 1)
        .when(col("id") % 89 === 0 && col("id") + 1 < nDocs, col("id") + 1)
        .otherwise(col("id")).as("src"),
      (col("id") % 89 === 0 && col("id") % 97 =!= 0).as("mut"))
    val toks = transform(sequence(lit(0), lit(99)),
      p => concat(lit("w"),
        pmod(hash(col("src") * 101 + p.cast("long") * 7 + 3), lit(5000))))
    val toksMut = when(col("mut"),
      concat(array(lit("zzq")), slice(toks, 2, 99))).otherwise(toks)
    src.select(
        col("id").as("doc_id"),
        array_join(toksMut, " ").as("text"),
        element_at(array(lit("en"), lit("de"), lit("fr"), lit("es")),
          (col("id") % 4 + 1).cast("int")).as("lang"),
        lit("src").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings: deterministic uniform [-1, 1) per (id, dim) — sign-LSH
    // and Lloyd training only need symmetric spread — with the twins
    // planted by remapping the source id and adding 1% hash noise
    val half = nDocs / 2
    val eSrc = when(col("id") >= half && col("id") < half + 5,
      col("id") - half).otherwise(col("id"))
    val isTwin = col("id") >= half && col("id") < half + 5
    def u(seed: org.apache.spark.sql.Column, salt: Int) =
      pmod(hash(seed * 131 + salt), lit(2000001)) / lit(1000000.0) - lit(1.0)
    spark.range(nDocs).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d => {
          val base = u(eSrc * 67 + d.cast("long") * 17, 7)
          (base + when(isTwin,
            u(col("id") * 71 + d.cast("long") * 19, 11) * lit(0.01))
            .otherwise(lit(0.0))).cast("float")
        }).as("embedding"),
        (col("id") % 8).cast("int").as("label"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Generate the mult× synthetic corpus (all 10 tables) at
    * [[corpusDir]] and return the dir — factored out of the smoke so
    * Bench's tier gate is ONE command (r13 verdict #6: a missing
    * corpus rebuilds instead of failing the recipe's first step). */
  def buildCorpus(
      spark: org.apache.spark.sql.SparkSession, mult: Int): String = {
    import spark.implicits._
    val dir = corpusDir(mult)
    val nDocs = 500 * mult
    val words = (0 until 5000).map(i => s"w$i")
    val rnd = new scala.util.Random(1)
    val docs = (0 until nDocs).map { i =>
      // 100-token random docs (uniform vocab; near-dup structure is the
      // sf corpora's job — the smoke measures collision/shuffle shape)
      val base = Array.fill(100)(words(rnd.nextInt(words.length)))
      // sprinkle the BM25 query terms so q_bm25's 40x check is
      // non-vacuous (every 4th doc carries 1-3 of them)
      if (i % 4 == 0) base(rnd.nextInt(base.length)) = "join"
      if (i % 8 == 0) base(rnd.nextInt(base.length)) = "hash"
      if (i % 16 == 0) base(rnd.nextInt(base.length)) = "scan"
      val text = base.mkString(" ")
      (i.toLong, text, Seq("en","de","fr","es")(i % 4), "src", text.length.toLong)
    }
    docs.toDF("doc_id","text","lang","source","n_chars")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val embs0 = (0 until nDocs).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), i % 8)
    }.toArray
    // Planted near-duplicate pairs for the auto-width recall floor:
    // probe i (< 5) gets a twin at i + nDocs/2 = probe + tiny noise
    // (cos ≈ 0.9999), so "does the width-scaled LSH still find what
    // ANN exists to find" is checkable at ANY width — random gaussians
    // alone have near-orthogonal neighbors and no recall to measure.
    val embs = embs0.map { case (id, v, lbl) =>
      if (id >= nDocs / 2 && id < nDocs / 2 + 5) {
        val src = embs0((id - nDocs / 2).toInt)._2
        (id, src.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq, lbl)
      } else (id, v.toSeq, lbl)
    }.toSeq
    embs.toDF("vec_id","embedding","label")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // mult× relational tables for the graph / basket / event-series ops
    // (60k·mult lineitem; 20k·mult events) — generated DISTRIBUTED via
    // spark.range + hash, no driver-side Seq at this size.
    spark.range(60000L * mult).select(
      (col("id") / 6).cast("long").as("l_orderkey"), // ~6 items/basket
      pmod(hash(col("id") * 7 + 1), lit(30000)).cast("long").as("l_partkey"),
      pmod(hash(col("id") * 13 + 5), lit(3000)).cast("long").as("l_suppkey"),
      (pmod(hash(col("id") * 61 + 37), lit(7)) + 1).cast("int").as("l_linenumber"),
      // cent-valued measures for the one-pass correlation matrix
      (pmod(hash(col("id") * 41 + 13), lit(5000)) / lit(100.0) + lit(1.0))
        .as("l_quantity"),
      (pmod(hash(col("id") * 43 + 19), lit(9000000)) / lit(100.0) + lit(900.0))
        .as("l_extendedprice"),
      (pmod(hash(col("id") * 47 + 23), lit(11)) / lit(100.0)).as("l_discount"),
      (pmod(hash(col("id") * 53 + 29), lit(9)) / lit(100.0)).as("l_tax"),
      element_at(array(lit("A"), lit("N"), lit("R")),
        pmod(hash(col("id") * 67 + 41), lit(3)) + 1).as("l_returnflag"),
      element_at(array(lit("O"), lit("F")),
        pmod(hash(col("id") * 71 + 43), lit(2)) + 1).as("l_linestatus"),
      (lit(694224000L) + pmod(hash(col("id") * 73 + 47), lit(199152000)))
        .cast("timestamp").as("l_shipdate"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // Dims sized to COVER the fact FK domains (30000 parts / 3000
    // suppliers / 5 regions) rather than scaled by mult — dims grow far
    // slower than facts in production, and keeping the domains fixed
    // preserves every previously-documented 40×/100× graph and basket
    // observation (node domain, degree caps, k-core census).
    spark.range(30000L).select(
      col("id").as("p_partkey"),
      concat(
        element_at(array(lit("blue"), lit("red"), lit("green"), lit("hot"),
          lit("cold"), lit("small"), lit("large"), lit("plain")),
          pmod(hash(col("id") * 11 + 3), lit(8)) + 1),
        lit(" "),
        element_at(array(lit("anvil"), lit("widget"), lit("ring"), lit("bolt"),
          lit("gear"), lit("cog"), lit("pin"), lit("cap")),
          pmod(hash(col("id") * 13 + 7), lit(8)) + 1)).as("p_name"),
      concat(lit("Brand#"),
        (pmod(hash(col("id") * 17 + 11), lit(25)) + 1).cast("string")).as("p_brand"),
      element_at(array(lit("ECONOMY"), lit("STANDARD"), lit("SMALL"),
        lit("MEDIUM"), lit("LARGE"), lit("PROMO")),
        pmod(hash(col("id") * 19 + 13), lit(6)) + 1).as("p_type"),
      (pmod(hash(col("id") * 23 + 17), lit(50)) + 1).cast("int").as("p_size"),
      (pmod(hash(col("id") * 29 + 19), lit(110000)) / lit(100.0) + lit(900.0))
        .as("p_retailprice"))
      .repartition(8).write.mode("overwrite").parquet(s"$dir/part.parquet")
    spark.range(3000L).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id").cast("string"), 9, "0")).as("s_name"),
      pmod(hash(col("id") * 31 + 23), lit(25)).cast("int").as("s_nationkey"),
      (pmod(hash(col("id") * 37 + 29), lit(1100000)) / lit(100.0) - lit(1000.0))
        .as("s_acctbal"))
      .repartition(4).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      element_at(array(lit("AFRICA"), lit("AMERICA"), lit("ASIA"),
        lit("EUROPE"), lit("MIDDLE EAST")), col("id").cast("int") + 1)
        .as("r_name"))
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    spark.range(20000L * mult).select(
      col("id").as("event_id"),
      // user domain scales with the corpus (50·mult = the historical
      // 2000 at 40×): a FIXED domain under growing events densifies
      // the transition graph quadratically — a generator artifact, not
      // an operator property (production user counts grow with data)
      pmod(hash(col("id") * 3 + 11), lit(50 * mult)).cast("long").as("user_id"),
      // micros TimestampType (Spark cannot emit the driver's
      // TIMESTAMP(NANOS); Tables.events handles both): second
      // resolution across 30 days from 2024-01-01
      (lit(1704067200L) + pmod(hash(col("id") * 5 + 3), lit(2592000)))
        .cast("long").cast("timestamp").as("ts"),
      element_at(
        array(lit("view"), lit("click"), lit("purchase"), lit("idle")),
        pmod(hash(col("id") + 29), lit(4)) + 1).as("event_type"),
      lit("""{"k":1}""").as("props"),
      (pmod(hash(col("id") * 17 + 7), lit(10000)) / lit(100.0)).as("value"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // mult× orders (15k·mult) + customer (1.5k·mult) for the
    // concentration / digit-law / trend ops
    spark.range(15000L * mult).select(
      col("id").as("o_orderkey"),
      pmod(hash(col("id") * 19 + 3), lit(1500 * mult)).cast("long").as("o_custkey"),
      element_at(array(lit("O"), lit("F"), lit("P")),
        pmod(hash(col("id") * 79 + 53), lit(3)) + 1).as("o_orderstatus"),
      (pmod(hash(col("id") * 23 + 9), lit(55000000)) / lit(100.0) + lit(900.0))
        .as("o_totalprice"),
      (lit(694224000L) + pmod(hash(col("id") * 29 + 17), lit(199152000)))
        .cast("timestamp").as("o_orderdate"),
      element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW")),
        pmod(hash(col("id") * 83 + 59), lit(5)) + 1).as("o_orderpriority"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.range(1500L * mult).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      pmod(hash(col("id") * 31 + 7), lit(25)).cast("int").as("c_nationkey"),
      (pmod(hash(col("id") * 37 + 11), lit(1100000)) / lit(100.0) - lit(1000.0))
        .as("c_acctbal"),
      element_at(
        array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
          lit("HOUSEHOLD"), lit("MACHINERY")),
        pmod(hash(col("id") + 41), lit(5)) + 1).as("c_mktsegment"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // 25-row nation dim (broadcast side of the k-anonymity census)
    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    dir
  }

  private def runSmoke(
      spark: org.apache.spark.sql.SparkSession, mult: Int,
      only: Option[Set[String]], dir: String): Unit = {
    import spark.implicits._
    val nDocs = 500 * mult
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(): Unit
    }
    def time(n: String): Unit = if (only.forall(_.contains(n))) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"SMOKE ${mult}x $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    Seq("q_dedup","q_minhash_lsh","q_ngram_jaccard","q_dedup_components",
      "q_simhash","q_lang_id","q_pii_scrub","q_repetition","q_contamination",
      "q_substr_dedup","q_bigram_score","q_image_hash",
      "q_pack","q_vocab","q_embed_quant","q_ann_lsh","q_ann_ivf",
      "q_cosine_topk","q_embed_dedup",
      "q_tfidf","q_bpe_train","q_mix_sample","q_kmeans_cluster",
      "q_semantic_dedup","q_chunk","q_winnow","q_entropy",
      "q_simhash_pairs","q_quality_clf","q_colloc",
      "q_minhash_est","q_dedup_keep_best","q_bpe_apply","q_knn_graph",
      "q_countmin","q_dupe_stats",
      "q_dedup_incremental","q_cluster_incremental","q_video_meta","q_video_dup",
      "q_pagerank","q_triangles","q_basket","q_edit_dist","q_gap_fill",
      "q_bfs","q_degree_dist","q_dedup_funnel",
      "q_label_prop","q_knn_classify","q_gini","q_benford","q_linreg",
      "q_changepoint",
      "q_dq_rules","q_kanon","q_seq_pairs","q_backtest","q_sql_rec",
      "q_interval_union","q_chisq","q_paths","q_acf","q_ltv",
      "q_corr_matrix","q_union_drift","q_auc","q_decile_lift","q_psi","q_ks",
      "q_emd","q_survival","q_seasonal",
      "q_link_predict","q_bm25","q_weighted_sample","q_stickiness",
      "q_mutual_info","q_confusion","q_calibration","q_l_diversity",
      "q_anova","q_cramers_v",
      "q_kcore","q_rrf","q_pq_adc","q_line_dedup","q_kmv","q_kmv_overlap",
      "q_closeness","q_topk_native","q_audio_dup","q_modularity",
      "q_assortativity","q_embed_drift","q_silhouette","q_ann_beam")
      .foreach(time)
    // Width-scaled sign-LSH: the fixed 4-plane demo width is the ONE
    // quadratic knob in the embedding family (in-bucket population is
    // n/2^planes, and the kNN stage squares it — 10.7s→92s from 40× to
    // 100× at width 4). The width is now DERIVED per corpus
    // (SimilarityQueries.autoPlaneCount — the same log2 rule this
    // smoke established), so q_knn_graph itself re-linearizes with no
    // knob change; time the auto plan here to keep that pinned.
    val scaledPlanes = graft.similarity.SimilarityQueries.autoPlaneCount(nDocs.toLong)
    if (only.forall(_.contains("q_knn_graph_scaled"))) {
      val t0 = System.nanoTime()
      graft.similarity.SimilarityQueries.knnGraphPlanAuto(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"SMOKE ${mult}x q_knn_graph_scaled[$scaledPlanes planes auto] " +
        f"${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // Recall floor at the derived width: each planted probe's twin has
    // cos ≈ 0.9999, so it must surface as the probe's TOP neighbor in
    // the auto-width kNN graph unless LSH bucketing lost it. Width
    // scaling is a recall trade by design — the floor pins that the
    // derived width keeps what ANN exists to keep (≥4 of the 5 planted
    // pairs; a lone plane-straddling twin is within tolerance).
    // Shingle pair-mass census (r14 verdict #5): the q_ngram_jaccard
    // candidate mass is Σ C(df,2) over DF-capped shingles, provably
    // ≤ (cap−1)/2 × occurrences — LINEAR in corpus size at any shingle
    // distribution (SCALE.md §r15; SimilaritySpec gates the bound).
    // This census prints the measured mass next to the bound so the
    // tier run verifies the curve empirically, not just algebraically.
    if (only.forall(_.contains("q_pairmass_census"))) {
      import graft.similarity.SimilarityQueries.{shingles, MaxShingleDf}
      val df = shingles(spark, dir).groupBy(col("s"))
        .agg(count(lit(1)).as("df"))
        .agg(sum(col("df")).as("occ"),
          sum((col("df") * (col("df") - 1) / 2).cast("long")).as("mass"),
          count(lit(1)).as("distinct_sh"))
        .collect()(0) // 1 row: corpus-wide census sums
      val (occ, mass) = (df.getLong(0), df.getLong(1))
      val bound = (MaxShingleDf - 1).toLong * occ / 2
      println(s"SMOKE ${mult}x pairmass_census occurrences=$occ " +
        s"distinct=${df.getLong(2)} pair_mass=$mass linear_bound=$bound")
      require(mass <= bound,
        s"capped pair mass $mass exceeded the linear bound $bound")
    }
    if (only.forall(_.contains("q_knn_recall_floor"))) {
      val hits = graft.similarity.SimilarityQueries.knnGraphPlanAuto(spark, dir)
        .filter(col("vec_id") < 5 && col("rn") === 1L &&
          col("nbr_id") === col("vec_id") + nDocs / 2)
        .count()
      println(s"SMOKE ${mult}x knn_recall_floor[$scaledPlanes planes auto] " +
        s"planted twins ranked first: $hits/5")
      require(hits >= 4,
        s"auto-width LSH lost ${5 - hits} of 5 planted near-dup pairs " +
          s"at $scaledPlanes planes — width rule broke recall")
    }
    // IVF recall floor at the DERIVED cell count (r10 verdict #3): a
    // cos ≈ 0.9999 twin assigns to the same trained cell as its probe
    // (or the probe's second cell) at any k, so it must survive the
    // nprobe=2 candidate cut and land in the ADC-exact top-5.
    if (only.forall(_.contains("q_ivf_recall_floor"))) {
      val hits = SparkEntry.queries("q_ann_ivf")(spark, dir)
        .filter(col("vec_id") === col("q_id") + nDocs / 2)
        .count()
      println(s"SMOKE ${mult}x ivf_recall_floor planted twins in IVF top-5: $hits/5")
      require(hits >= 4,
        s"IVF ANN lost ${5 - hits} of 5 planted near-dup twins at ${mult}x " +
          "- derived cell count broke recall")
    }
    // Beam-search ANN recall floor: the hybrid entry layer seeds the
    // beam with the query's own sign-LSH bucket, and a cos ≈ 0.9999
    // twin shares that bucket up to one plane straddle — so ≥4 of the
    // 5 planted twins must appear in the beam top-5 at ANY corpus
    // size, independent of whether the random bulk gives the walk a
    // gradient. Losing more means the entry seeding or the ef-search
    // frontier rule broke at scale.
    if (only.forall(_.contains("q_beam_recall_floor"))) {
      val hits = graft.similarity.SimilarityQueries.annBeamPlan(spark, dir)
        .filter(col("vec_id") === col("q_id") + nDocs / 2)
        .count()
      println(s"SMOKE ${mult}x beam_recall_floor planted twins in beam top-5: $hits/5")
      require(hits >= 4,
        s"beam-search ANN lost ${5 - hits} of 5 planted near-dup twins at ${mult}x")
    }
    // Beam query-batch scaling: a production search runs thousands of
    // queries per batch, not the oracle family's 5 — and the per-hop
    // dataflow carries only (q_id, cand) pairs, so 100× the queries
    // must cost FAR less than 100× the time (the hub/bucket entry scan
    // and the edge table are shared across the whole batch). Both runs
    // search the same persisted index (built once, mtime-cached); the
    // gate is generous half-linear to stay robust to job-overhead
    // noise at smoke scale.
    // one normEmb-shaped frame shared by both beam blocks (built
    // lazily so runs that select neither never scan the embeddings)
    lazy val beamNe = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      .localCheckpoint(true, // DISK_ONLY: corpus-scale vectors (r16 rule)
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    if (only.forall(_.contains("q_beam_batch"))) {
      import graft.similarity.SimilarityQueries
      val idxRoot = SimilarityQueries.beamIndexFor(spark, dir)
      val ne = beamNe
      def tSearch(qs: Long): Double = {
        val t0 = System.nanoTime()
        SimilarityQueries.beamSearchPlan(spark, idxRoot, ne, queryLimit = qs)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      tSearch(5) // warm-up (graph read + codegen)
      val t5 = tSearch(5)
      val t500 = tSearch(500)
      println(f"SMOKE ${mult}x beam_batch t5=$t5%.2fs t500=$t500%.2fs " +
        f"ratio=${t500 / t5}%.1fx for 100x queries")
      require(t500 < 50 * t5,
        f"beam search scales linearly-or-worse in query count: " +
          f"100x queries cost ${t500 / t5}%.1fx")
    }
    // Beam-index APPEND economics: the affected-bucket claim is that
    // an append recomputes in-bucket kNN only for the buckets the
    // batch touches — the QUADRATIC term is what partiality bounds, so
    // that is what the gate measures (scored-pair counts, exact and
    // deterministic). Wall-clock is printed for the record but NOT
    // gated: at smoke scale both paths are job-count-bound (the
    // monotone fast path saves the global sort and the full finger
    // rewrite — O(batch·log n) delta rows instead of O(n log n), the
    // term that matters at production n — but spends those savings on
    // its extra bookkeeping jobs here). The structural incrementality
    // (original finger files untouched by a monotone append) is pinned
    // in BeamIndexSpec instead.
    if (only.forall(_.contains("q_beam_append"))) {
      import graft.similarity.SimilarityQueries
      val ne = beamNe
      val planes = SimilarityQueries.autoPlaneCount(nDocs.toLong)
      // batch sized to a quarter of the bucket count, so the touched
      // fraction (and the pair gate) is stable at ANY smoke multiplier
      // — a fixed 16 would touch most of the 16 buckets the 4-plane
      // floor yields at small mult and fail spuriously
      val batchN = math.max(4, (1 << planes) / 4)
      val base = ne.filter(col("vec_id") < nDocs - batchN)
      val tmp = java.nio.file.Files.createTempDirectory("beam_append").toString
      try {
        val t0 = System.nanoTime()
        SimilarityQueries.beamIndexCreate(spark, base, planes, s"$tmp/idx")
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        SimilarityQueries.beamIndexAppend(spark, ne, s"$tmp/idx")
        val tAppend = (System.nanoTime() - t1) / 1e9
        val nodes = SimilarityQueries.beamNodesFrame(spark, s"$tmp/idx")
        val sizes = nodes.groupBy(col("bucket")).count().collect()
          .map(r => (r.getInt(0), r.getLong(1))).toMap
        val touched = nodes.filter(col("vec_id") >= nDocs - batchN)
          .select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
        val totalPairs = sizes.values.map(c => c * (c - 1)).sum
        val appendPairs = touched.toSeq.map(b => sizes(b)).map(c => c * (c - 1)).sum
        println(f"SMOKE ${mult}x beam_append build=$tBuild%.2fs " +
          f"append$batchN%d=$tAppend%.2fs " +
          f"pairs=${appendPairs * 100.0 / totalPairs}%.0f%% of full " +
          f"(${touched.size}/${sizes.size} buckets)")
        // Structural partiality is the scale-invariant gate: the batch
        // touches at most one bucket per vector, strictly fewer than
        // all of them. The ≤50%-of-pair-MASS bound additionally holds
        // at the 40× default corpus (12/64 buckets, 41%) but is a
        // corpus property, not a law — batch ids sample buckets
        // mass-proportionally, so at 100× (25/126 buckets) the touched
        // fifth of buckets carries ~62% of the skew-concentrated pair
        // mass. Gate the mass bound where it is a committed fact,
        // print it everywhere for SCALE.md.
        require(touched.size <= batchN && touched.size < sizes.size &&
            appendPairs < totalPairs,
          s"append rescored $appendPairs of $totalPairs pairs across " +
            s"${touched.size}/${sizes.size} buckets — partiality broke")
        if (mult <= 40) require(appendPairs * 2 < totalPairs,
          s"append rescored $appendPairs of $totalPairs pairs — " +
            "affected-bucket partiality is not bounding the quadratic term")
      } finally rmTree(new java.io.File(tmp))
    }
    // Beam-index DELETE + CDC upsert economics (r12 verdict #6): the
    // delete recomputes in-bucket kNN only for the SURVIVORS of the
    // buckets that held deleted ids — the same partiality bound as
    // append, gated on exact scored-pair counts; the CDC upsert
    // (delete then monotone re-add, AnnIndexStream's batch shape) must
    // restore the vector count and keep the planted-twin recall floor.
    // Exact delete ≡ rebuild / upsert ≡ one-shot equality is
    // BeamIndexSpec/AnnIndexStreamSpec's job — this block gives the
    // claims SCALE evidence (SCALE.md carries the 100× row).
    if (only.forall(_.contains("q_beam_cdc"))) {
      import graft.similarity.SimilarityQueries
      val ne = beamNe
      val planes = SimilarityQueries.autoPlaneCount(nDocs.toLong)
      val batchN = math.max(4, (1 << planes) / 4)
      val tmp = java.nio.file.Files.createTempDirectory("beam_cdc").toString
      try {
        SimilarityQueries.beamIndexCreate(spark, ne, planes, s"$tmp/idx")
        val nodesBefore = SimilarityQueries.beamNodesFrame(spark, s"$tmp/idx")
          .localCheckpoint(true)
        val delFrom = (nDocs - batchN).toLong
        val deleted = spark.range(delFrom, nDocs.toLong)
          .select(col("id").as("vec_id"))
        val surviving = ne.filter(col("vec_id") < delFrom).localCheckpoint(
          true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val affected = nodesBefore.filter(col("vec_id") >= delFrom)
          .select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
        val t0 = System.nanoTime()
        SimilarityQueries.beamIndexDelete(spark, surviving, deleted, s"$tmp/idx")
        val tDel = (System.nanoTime() - t0) / 1e9
        val survSizes = SimilarityQueries.beamNodesFrame(spark, s"$tmp/idx")
          .groupBy(col("bucket")).count().collect()
          .map(r => (r.getInt(0), r.getLong(1))).toMap
        val totalPairs = survSizes.values.map(c => c * (c - 1)).sum
        val delPairs = affected.toSeq.map(b => survSizes.getOrElse(b, 0L))
          .map(c => c * (c - 1)).sum
        println(f"SMOKE ${mult}x beam_cdc delete$batchN%d=$tDel%.2fs " +
          f"pairs=${delPairs * 100.0 / totalPairs}%.0f%% of full " +
          f"(${affected.size}/${survSizes.size} buckets)")
        // same gating philosophy as beam_append: structural partiality
        // (bucket subset) everywhere; the pair-MASS bound only at the
        // 40× committed corpus (skew makes it a corpus property)
        require(affected.size <= batchN && affected.size < survSizes.size &&
            delPairs < totalPairs,
          s"delete rescored $delPairs of $totalPairs pairs across " +
            s"${affected.size}/${survSizes.size} buckets — partiality broke")
        if (mult <= 40) require(delPairs * 2 < totalPairs,
          s"delete rescored $delPairs of $totalPairs pairs — " +
            "affected-bucket partiality is not bounding the quadratic term")
        // structural leaf check: unaffected buckets still read their
        // ORIGINAL generation's leaves (the manifest remaps only
        // affected ones)
        val knMap = SimilarityQueries.beamManifest(spark, s"$tmp/idx").knDirs
        val stale = knMap.filter { case (b, d) =>
          !affected.contains(b) && !d.startsWith("g0/") }
        require(stale.isEmpty,
          s"delete rewrote unaffected kn leaves: ${stale.take(5)}")
        // upsert: re-add the deleted range (monotone fast path — the
        // streaming CDC shape) and hold the planted-twin recall floor
        val t1 = System.nanoTime()
        SimilarityQueries.beamIndexAppend(spark, ne, s"$tmp/idx")
        val tAdd = (System.nanoTime() - t1) / 1e9
        require(SimilarityQueries.beamMeta(spark, s"$tmp/idx")._2 == nDocs.toLong,
          "CDC upsert did not restore the vector count")
        val twins = SimilarityQueries.beamSearchPlan(spark, s"$tmp/idx", ne)
          .filter(col("vec_id") === col("q_id") + nDocs / 2)
          .count()
        println(f"SMOKE ${mult}x beam_cdc upsert=$tAdd%.2fs twins=$twins%d/5")
        require(twins >= 4,
          s"post-CDC recall floor broke: $twins/5 planted twins")
      } finally rmTree(new java.io.File(tmp))
    }
    // PQ-ADC recall floor: each planted probe's twin (cos ≈ 0.9999 at
    // id + nDocs/2) must appear in the probe's ADC top-5 — 8 coarse
    // codes per vector lose plenty of precision, but a near-identical
    // vector encodes to (nearly) the same codes, so losing ≥2 of 5
    // twins means training or the ADC lookup broke at scale.
    if (only.forall(_.contains("q_pq_recall_floor"))) {
      val hits = SparkEntry.queries("q_pq_adc")(spark, dir)
        .filter(col("vec_id") === col("q_id") + nDocs / 2)
        .count()
      println(s"SMOKE ${mult}x pq_recall_floor planted twins in ADC top-5: $hits/5")
      require(hits >= 4,
        s"PQ-ADC lost ${5 - hits} of 5 planted near-dup twins at ${mult}x")
    }
    // KMV accuracy floor: the smoke corpus has exactly 50·mult distinct
    // users per event segment; the k=64 sketch estimate must land
    // within 3·rsd ≈ 40% of the truth for every segment (deterministic
    // given the corpus — a regression pin, not a statistical test).
    if (only.forall(_.contains("q_kmv_floor"))) {
      val exact = 50.0 * mult
      val ests = SparkEntry.queries("q_kmv")(spark, dir)
        .select(col("event_type"), col("est_r")).collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      ests.foreach { case (t, e) =>
        println(f"SMOKE ${mult}x kmv_floor $t est=$e%.1f exact=$exact%.0f")
        require(math.abs(e - exact) / exact < 0.40,
          f"KMV estimate for '$t' strayed ${math.abs(e - exact) / exact * 100}%.0f%% from $exact%.0f")
      }
    }
    // Heap vs sort top-k at 40× (r10 verdict #5): time the
    // row_number window idiom (Spark's SPARK-37099 WindowGroupLimit
    // inference), the native heap operator, and the window idiom with
    // the TopKRewrite rule enabled, on two key shapes — moderate
    // cardinality (l_partkey: 30k keys) and pathological skew
    // (l_suppkey % 8: 8 keys × 300k rows each, where each
    // WindowGroupLimit stage sorts a 300k-row run and the heap keeps
    // 5 rows). The decision this feeds is documented at
    // plans/TopKRewrite.scala and BASELINE.md §r11.
    if (only.forall(_.contains("q_topk_paths"))) {
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), (col("l_suppkey") % 8).as("skewkey"),
          col("l_extendedprice").as("v"), col("l_orderkey"), col("l_linenumber"))
        .localCheckpoint(true) // isolate the scan from the comparison
      def winTopK(key: String): org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy(col(key))
          .orderBy(col("v").desc, col("l_orderkey"), col("l_linenumber"))
        li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      }
      def heapTopK(key: String): org.apache.spark.sql.DataFrame =
        graft.plans.TopKPerKey(li, Seq(key),
          Seq(col("v").desc, col("l_orderkey").asc, col("l_linenumber").asc), 5)
      def tRun(label: String, df: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SMOKE ${mult}x topk_paths $label $dt%.2f s")
        dt
      }
      for (key <- Seq("l_partkey", "skewkey")) {
        // TopKRewrite is ON by default, so the window baseline must
        // explicitly disable it — otherwise winTopK plans through the
        // same heap pair as the rewrite run and this harness times
        // identical plans, blind to any regression vs the true
        // WindowGroupLimit path (r11 advice).
        spark.conf.set("spark.graft.topkRewrite", "false")
        try {
          tRun(s"window[$key]", winTopK(key))    // warm-up
          tRun(s"window[$key]", winTopK(key))
        } finally spark.conf.unset("spark.graft.topkRewrite")
        tRun(s"heap[$key]", heapTopK(key))
        tRun(s"rewrite[$key]", winTopK(key))
      }
    }
    // BPE marginal-iteration cost: the trainer's scale claim is that
    // after the one corpus-wide word count, every merge iteration is
    // VOCAB-sized. Measured directly: train at 4 then 8 merges (one
    // warm-up pass first so page cache/JIT don't bias the delta) —
    // the 4 extra iterations must cost less than the whole 4-merge
    // run, i.e. t8 < 2·t4; corpus-sized iterations would land at ~2×
    // and a quadratic rewrite far above.
    if (only.forall(_.contains("q_bpe_iters"))) {
      def tTrain(m: Int): Double = {
        val t0 = System.nanoTime()
        graft.text.TextQueries.bpeTrainPlan(spark, dir, m)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      tTrain(4) // warm-up
      val t4 = tTrain(4)
      val t8 = tTrain(8)
      println(f"SMOKE ${mult}x bpe_iters t4=$t4%.2fs t8=$t8%.2fs " +
        f"marginal=${(t8 - t4) / 4}%.2fs/iter")
      require(t8 < 2 * t4,
        f"BPE iterations are not vocab-sized: 4 extra merges cost " +
          f"${t8 - t4}%.2fs vs $t4%.2fs for the whole 4-merge run")
    }
    spark.stop()
  }
}
