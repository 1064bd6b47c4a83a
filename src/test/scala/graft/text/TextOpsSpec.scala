package graft.text

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unicode behavior of the text operators — the oracle corpus is
  * ASCII, so multi-byte/multi-script correctness is pinned here:
  * the BPE pretokenizer must class accented and non-Latin letters as
  * letters, and the rolling hash must fold over UTF-8 BYTES (not
  * codepoints), matching what a byte-stream Rabin-Karp chunker sees.
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("unidocs").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_text_bpe classes Unicode letters/digits correctly (\\p{L}/\\p{N})") {
    val dir = docsDir(Seq(
      "Héllo wörld 42 naïve!",   // [Héllo][ wörld][ 42][ naïve][!] = 5
      "años 日本語 123",          // [años][ 日本語][ 123] = 3
      "abc"))                     // [abc] = 1
    val got = TextQueries.textBpe.run(spark, dir)
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    assert(got(0L) === 5L)
    assert(got(1L) === 3L)
    assert(got(2L) === 1L)
  }

  test("q_text_normalize converges composed and decomposed Unicode to one hash") {
    val composed = "café latte"            // é as one codepoint
    val decomposed = "café   latte"       // e + combining acute, extra spaces
    val dir = docsDir(Seq(composed, decomposed, "CAFE latte"))
    val got = TextQueries.textNormalize.run(spark, dir)
      .select("doc_id", "norm_hash").as[(Long, String)].collect().toMap
    assert(got(0L) === got(1L),
      "NFC + whitespace collapse must make composed/decomposed forms identical")
    assert(got(0L) !== got(2L), "case differs only after the fold -> 'cafe' != 'café'")
  }

  test("q_sample_stratified is deterministic and respects per-stratum rates") {
    val dir = docsDir((0 until 400).map(i => s"doc number $i"))
    val a = TextQueries.sampleStratified.run(spark, dir).collect().map(_.getLong(0)).toSet
    val b = TextQueries.sampleStratified.run(spark, dir).collect().map(_.getLong(0)).toSet
    assert(a === b, "same input must always select the same sample")
    // fixture lang is 'xx' -> 30% stratum; md5 buckets are uniform-ish
    assert(a.size > 400 * 30 / 100 - 40 && a.size < 400 * 30 / 100 + 40,
      s"sample size ${a.size} far from the 30% rate")
  }

  test("q_pii_scrub counts and redacts planted emails and phone numbers") {
    val dir = docsDir(Seq(
      "contact alice.smith+x@example.co.uk or 555-123-4567 today",
      "two mails a@b.io c@d.org and phone 800.555.1212",
      "nothing sensitive here"))
    val got = TextQueries.piiScrub.run(spark, dir)
      .select("doc_id", "n_emails", "n_phones", "scrub_hash")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === 1L && got(0)._3 === 1L)
    assert(got(1)._2 === 2L && got(1)._3 === 1L)
    assert(got(2)._2 === 0L && got(2)._3 === 0L)
    // redaction actually happened: hash equals md5 of the scrubbed text
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("contact [EMAIL] or [PHONE] today".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(0)._4 === expected)
  }

  test("q_repetition: token histogram stats (total, distinct, top frequency)") {
    val dir = docsDir(Seq(
      "spam spam spam eggs spam",  // 5 tokens, 2 distinct, top=4
      "all words here differ"))    // 4 tokens, 4 distinct, top=1
    val got = TextQueries.repetition.run(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((0L, 5L, 2L, 4L)))
    assert(got(1) === ((1L, 4L, 4L, 1L)))
  }

  test("q_contamination flags corpus docs sharing an 8-gram with the eval set") {
    // docs 0 and 1 are "eval" (doc_id < 25) and share their 8-grams —
    // the corpus hit count must still be per DISTINCT gram (2), not per
    // eval occurrence (4). doc 30 copies 9 eval tokens -> two shared
    // 8-grams; doc 31 shares only 7 consecutive tokens -> clean;
    // doc 32 disjoint -> clean.
    val evalText = "one two three four five six seven eight nine ten"
    val texts = Seq(
      (0L, evalText),
      (1L, s"$evalText extra tail"),
      (30L, "STOLEN one two three four five six seven eight nine END"),
      (31L, "one two three four five six seven CHANGED nine ten"),
      (32L, "completely different content with no overlap whatsoever at all"))
    val dir = Files.createTempDirectory("contam").toString
    texts.map { case (i, t) => (i, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.contamination.run(spark, dir)
      .select("doc_id", "n_shared_grams").as[(Long, Long)].collect().toMap
    assert(got === Map(30L -> 2L))
  }

  test("q_substr_dedup coalesces shared ≥20-token passages into maximal runs") {
    // P is a 25-token passage: a shared copy must surface as ONE
    // coalesced run of n_tokens=25 (6 shared 20-grams), not 6 rows.
    // doc 3 shares only 19 consecutive tokens -> below threshold, no
    // row. doc 4 contains P TWICE -> two runs per partner, at distinct
    // b_start offsets (within-doc repeats are separate passages; the
    // doc 4 self-pair is excluded).
    val P = (1 to 25).map(i => s"s$i").mkString(" ")
    val P19 = (1 to 19).map(i => s"s$i").mkString(" ")
    val texts = Seq(
      (1L, s"a1 a2 a3 $P"),        // P at pos 4
      (2L, s"$P b1 b2"),           // P at pos 1
      (3L, s"c1 c2 c3 $P19 c4"),   // 19-token share only -> clean
      (4L, s"$P d1 $P"))           // P at pos 1 and pos 27
    val dir = Files.createTempDirectory("substr").toString
    texts.map { case (i, t) => (i, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.substrDedup.run(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 4L, 1L, 25L),
      (1L, 4L, 4L, 1L, 25L), (1L, 4L, 4L, 27L, 25L),
      (2L, 4L, 1L, 1L, 25L), (2L, 4L, 1L, 27L, 25L)))
  }

  test("q_substr_dedup's gram artifact: warm serve is stable, rewritten corpus rebuilds") {
    val P = (1 to 22).map(i => s"p$i").mkString(" ")
    def write(dir: String, extra: String): Unit =
      Seq((1L, s"x1 $P"), (2L, s"$P y1 $extra"))
        .map { case (i, t) => (i, t, "xx", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dir = Files.createTempDirectory("substrart").toString
    write(dir, "")
    val first = TextQueries.substrDedup.run(spark, dir).collect().toSet
    assert(TextQueries.substrDedup.run(spark, dir).collect().toSet === first,
      "warm gram-artifact serve changed the result")
    // rewrite: doc 2 loses the shared passage (different mtime+length)
    Seq((1L, s"x1 $P"), (2L, "y1 y2 y3"))
      .map { case (i, t) => (i, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(TextQueries.substrDedup.run(spark, dir).collect().isEmpty,
      "stale gram artifact served after a corpus rewrite")
  }

  test("q_line_dedup's span artifact: read equals recompute, warm serve stable, rewrite rebuilds") {
    // 3 docs share the same first 8-token span (df >= 3 -> boilerplate,
    // dropped from all three); doc 4 is clean.
    val B = (1 to 8).map(i => s"b$i").mkString(" ")
    def write(dir: String, tail: String): Unit =
      Seq((1L, s"$B u1 u2"), (2L, s"$B v1"), (3L, s"$B w1 w2 w3"),
        (4L, s"clean only doc $tail"))
        .map { case (i, t) => (i, t, "xx", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dir = Files.createTempDirectory("spanart").toString
    write(dir, "x")
    // artifact read is bit-identical to the inline projection
    assert(TextQueries.lineDedupSpans(spark, dir).collect().map(_.toString).toSet
      === TextQueries.spansOf(spark, dir).collect().map(_.toString).toSet)
    val first = TextQueries.lineDedup.run(spark, dir).collect().toSet
    // the shared span is dropped from docs 1-3 (their kept counts lose
    // one span each); doc 4 keeps everything
    val kept = TextQueries.lineDedup.run(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2 - r._3)).toMap
    assert(kept(1L) === 1 && kept(2L) === 1 && kept(3L) === 1 && kept(4L) === 0,
      s"boilerplate span must be dropped from exactly docs 1-3: $kept")
    assert(TextQueries.lineDedup.run(spark, dir).collect().toSet === first,
      "warm span-artifact serve changed the result")
    write(dir, "different tail y z") // rewrite: new mtime AND length
    val second = TextQueries.lineDedup.run(spark, dir).collect().toSet
    val clean = Files.createTempDirectory("spanart2").toString
    write(clean, "different tail y z")
    assert(TextQueries.lineDedup.run(spark, clean).collect().toSet === second,
      "stale span artifact served after a corpus rewrite")
  }

  test("q_pack: per-shard greedy concatenation packing matches a JVM replica") {
    val dir = docsDir((0 until 200).map(i => Seq.fill(i % 40 + 1)("tok").mkString(" ")))
    val got = TextQueries.pack.run(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === 200)
    got.foreach { case (id, shard, n, _) =>
      assert(shard >= 0 && shard < 8)
      assert(n === id % 40 + 1, s"doc $id token count")
    }
    // replay the packing law per shard: pack_id = floor(start_offset / 2048)
    got.groupBy(_._2).foreach { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, packId) =>
        assert(packId === cum / 2048, s"doc $id in shard $shard")
        cum += n
      }
    }
    assert(got.map(_._2).distinct.length > 1, "shards should actually spread")
  }

  test("q_bigram_score: familiarity mass and rarest-bigram count per doc") {
    val dir = docsDir(Seq(
      "a b a b",  // bigrams: (a b)x2, (b a)  -> model: a_b=3, b_a=1
      "a b c",    // bigrams: (a b), (b c)    -> model: b_c=1
      "zz"))      // single token -> no bigrams -> absent
    val got = TextQueries.bigramScore.run(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 1L))
    assert(got(0) === ((0L, 3L, 7L, 1L))) // 3+1+3 mass, rarest b_a=1
    assert(got(1) === ((1L, 2L, 4L, 1L))) // 3+1 mass, rarest b_c=1
  }

  test("q_tfidf ranks each doc's unique term first; corpus-wide terms score zero") {
    val dir = docsDir(Seq(
      "the apple apple", "the banana", "the cherry", "the dates"))
    val rows = TextQueries.tfidf.run(spark, dir)
      .select("doc_id", "term", "score_r", "rn")
      .as[(Long, String, Double, Long)].collect()
    val first = rows.filter(_._4 == 1L).map(r => r._1 -> r._2).toMap
    assert(first === Map(0L -> "apple", 1L -> "banana", 2L -> "cherry", 3L -> "dates"))
    // "the" appears in all 4 docs: idf = ln(4/4) = 0 exactly
    rows.filter(_._2 == "the").foreach(r => assert(r._3 === 0.0))
  }

  test("q_bpe_train learns the dominant merge and applies it TWICE per pass (run of identical symbols)") {
    // "aaaa" x3: iter-1 pairs are (a a)x9 vs (b b)x3 -> merge "a a".
    // Two-pass replace turns "a a a a" into "aa aa" (one pass leaves
    // "aa a a" and iter 2 would learn "aa a" instead of "aa aa").
    val dir = docsDir(Seq("aaaa aaaa aaaa bbbb"))
    val got = TextQueries.bpeTrain.run(spark, dir)
      .select("it", "pair", "merged", "c").as[(Long, String, String, Long)]
      .collect().sortBy(_._1)
    assert(got(0) === ((1L, "a a", "aa", 9L)))
    assert(got(1) === ((2L, "aa aa", "aaaa", 3L)),
      s"second merge ${got(1)} — single-pass replace would have left 'aa a a'")
  }

  test("q_mix_sample applies table rates, defaults unknown sources to 10, and is deterministic") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextQueries.mixSample.run(spark, dir)
      .select("source", "rate", "n_total", "n_kept", "kept_id_sum")
      .as[(String, Long, Long, Long, Long)].collect()
    val bys = rows.map(r => r._1 -> r).toMap
    assert(bys("src0")._2 === 50L && bys("src1")._2 === 40L && bys("src2")._2 === 25L)
    rows.filterNot(r => Set("src0", "src1", "src2")(r._1))
      .foreach(r => assert(r._2 === 10L, s"${r._1} should default to rate 10"))
    rows.foreach(r => assert(r._4 <= r._3 && (r._4 > 0 || r._5 == 0)))
    val again = TextQueries.mixSample.run(spark, dir)
      .select("source", "rate", "n_total", "n_kept", "kept_id_sum")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("q_entropy: zero for a constant doc, ln(k) for a uniform one") {
    val dir = docsDir(Seq(
      "spam spam spam spam",        // constant -> entropy 0
      "a b c d e f g h",            // 8 uniform tokens -> ln(8)
      "x x y"))                     // 2/3,1/3 mix
    val got = TextQueries.entropy.run(spark, dir)
      .select("doc_id", "entropy_r").as[(Long, Double)].collect().toMap
    assert(got(0L) === 0.0)
    assert(math.abs(got(1L) - math.log(8)) < 1e-6)
    val mix = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(got(2L) - mix) < 1e-6)
  }

  test("q_chunk: 64-token windows on a 48 stride with exact boundary arithmetic") {
    val toks65 = (1 to 65).map(i => s"t$i")
    val dir = docsDir(Seq(
      toks65.mkString(" "),              // 65 tokens -> 2 chunks
      (1 to 64).map(i => s"u$i").mkString(" "), // exactly 64 -> 1 chunk
      "a b c"))                          // short -> 1 chunk
    val got = TextQueries.chunk.run(spark, dir)
      .select("doc_id", "chunk_idx", "start_tok", "n_toks", "chunk_hash")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(got(0L).map(c => (c._3, c._4)) === Seq((1L, 64L), (49L, 17L)))
    assert(got(1L).map(c => (c._3, c._4)) === Seq((1L, 64L)))
    assert(got(2L).map(c => (c._3, c._4)) === Seq((1L, 3L)))
    // overlap: chunk 2 of doc 0 re-covers tokens 49..64
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got(0L)(1)._5 === md5hex(toks65.drop(48).mkString(" ")))
  }

  test("q_winnow matches a JVM replica and keeps the shared-run coverage guarantee") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10-token run >= k+w-1 = 8
    val dir = docsDir(Seq(
      s"alpha beta gamma $shared delta epsilon zeta",
      s"one two three four five $shared six seven"))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // replica of the engine's selection: 5-gram hashes, min per 4-window
    def fps(text: String): Set[Long] = {
      val w = text.trim.split("\\s+")
      val hs = w.sliding(5).map(g => java.lang.Long.parseLong(
        md5hex(g.mkString(" ")).take(15), 16)).toArray
      hs.sliding(4).filter(_.length == 4).map(_.min).toSet
    }
    val texts = Seq(
      s"alpha beta gamma $shared delta epsilon zeta",
      s"one two three four five $shared six seven")
    val expect = texts.map(fps)
    assert(expect(0).intersect(expect(1)).nonEmpty,
      "winnowing guarantee: a shared >= k+w-1 run must share a fingerprint")
    val got = TextQueries.winnow.run(spark, dir)
      .select("doc_id", "n_fp", "fp_xor").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val e = fps(t)
      assert(got(i.toLong) === ((e.size.toLong, e.reduce(_ ^ _))),
        s"doc $i: engine fingerprints diverge from the replica")
    }
  }

  test("q_rolling_hash folds over UTF-8 bytes, not codepoints") {
    val texts = Seq("aé", "日本", "plain ascii", "")
    val dir = docsDir(texts)
    def expected(t: String): Long =
      t.getBytes("UTF-8").foldLeft(0L)((acc, b) =>
        (acc * 31 + (b & 0xff)) % 1000000007L)
    val got = TextQueries.rollingHash.run(spark, dir)
      .select("doc_id", "fp_roll").as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === expected(t), s"mismatch for <$t>")
    }
  }

  test("q_quality_clf: label is sign(score), scores are centered, both classes occur") {
    val rows = TextQueries.qualityClf.run(spark, "/root/testdata/sf0.001")
      .select("score_r", "label").as[(Double, Long)].collect()
    assert(rows.length == 500)
    rows.foreach { case (s, l) =>
      assert(l == (if (s > 0) 1L else 0L), s"label $l inconsistent with score $s")
      assert(math.abs(s) <= 1.0, "mean of [-1,1] weights left the unit interval")
    }
    // hash weights are ~uniform on [-1000,1000]: a one-sided split
    // would mean the hashing or pooling is broken
    assert(rows.exists(_._2 == 1L) && rows.exists(_._2 == 0L))
  }

  test("q_bpe_apply: merges strictly compress docs containing the merged pairs") {
    val dir = "/root/testdata/sf0.001"
    val applied = TextQueries.bpeApply.run(spark, dir)
      .select("doc_id", "n_bpe_tokens", "n_words")
      .as[(Long, Long, Long)].collect()
    assert(applied.length == 500)
    applied.foreach { case (_, nBpe, nWords) =>
      assert(nBpe >= nWords, "a word never encodes to fewer than 1 token")
    }
    // 3 corpus-level merges must shrink SOMETHING vs raw chars
    val totalBpe = applied.map(_._2).sum
    val totalChars = TestSpark.spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("CAST(sum(length(regexp_replace(text, '\\\\s+', ''))) AS LONG)")
      .as[Long].collect().head
    assert(totalBpe < totalChars, s"no compression: $totalBpe vs $totalChars chars")
  }

  test("q_countmin: estimates are one-sided (est >= true, every row)") {
    val rows = TextQueries.countMin.run(spark, "/root/testdata/sf0.001")
      .select("true_c", "est_c").as[(Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (t, e) =>
      assert(e >= t, s"count-min UNDER-estimated: est=$e true=$t")
    }
  }

  test("Count-Min merges: per-day partial sketches summed cell-wise == one-shot sketch") {
    // The re-aggregation property that makes sketches useful at 100 TB:
    // sign each day (partition, datacenter) independently, merge by
    // ADDING counters — never re-scan history. Counters are linear, so
    // the merged matrix must equal the one-shot matrix EXACTLY.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def tokOf(pred: org.apache.spark.sql.Column) = TestSpark.spark.read
      .parquet(s"$dir/documents.parquet")
      .filter(pred)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
    val day1 = TextQueries.cmSketch(tokOf(col("doc_id") < 250))
    val day2 = TextQueries.cmSketch(tokOf(col("doc_id") >= 250))
    val merged = day1.union(day2)
      .groupBy(col("j"), col("b")).agg(sum(col("c")).as("c"))
      .as[(Int, Long, Long)].collect().toSet
    val oneShot = TextQueries.cmSketch(tokOf(lit(true)))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === oneShot, "merged partials diverged from the one-shot sketch")
  }

  test("HLL merges: per-day sketch partials unioned == one-shot sketch estimate") {
    // Same property for the distinct-count sketch (q_hll_distinct's
    // production shape): Spark's DataSketches HLL surface exposes the
    // binary sketches, so per-day partials union into EXACTLY the
    // estimate the one-shot aggregation yields.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val li = TestSpark.spark.read.parquet(s"$dir/lineitem.parquet")
    val daily = li
      .groupBy((col("l_orderkey") % 2).as("day"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("nd"))
      .as[Long].collect().head
    val oneShot = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("nd"))
      .as[Long].collect().head
    assert(merged === oneShot,
      s"HLL union of daily partials ($merged) != one-shot estimate ($oneShot)")
    // and the estimate is a real distinct count, not a degenerate 0
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].collect().head
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged vs exact $exact drifted beyond 5%")
  }

  test("q_bm25 planted: term frequency raises, document length normalizes") {
    val dir = docsDir(Seq(
      "join join join alpha",       // doc 0: k=3, short
      "join " + ("pad " * 40).trim, // doc 1: k=1, long — length-normalized down
      "hash scan alpha beta"))      // doc 2: two distinct query terms
    val rows = TextQueries.bm25.run(spark, dir)
      .as[(Long, Long, Double)].collect()
    val m = rows.map(r => r._1 -> r).toMap
    assert(m.keySet === Set(0L, 1L, 2L), "all and only matching docs rank")
    assert(m(0L)._3 > m(1L)._3,
      "3x tf in a short doc must outscore 1x tf in a long doc")
    assert(m(2L)._2 === 2L, "doc 2 matches two query terms")
    assert(rows.forall(_._3 > 0.0))
  }

  test("q_bm25 matches a sequential BM25 replica") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> Option(t).getOrElse("").trim.split("\\s+").toSeq
    }.toMap
    val n = docs.length.toLong
    val sumDl = toks.values.map(_.length.toLong).sum
    val terms = Seq("join", "hash", "scan")
    val dfm = terms.map(t => t -> toks.values.count(_.contains(t)).toLong).toMap
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expect = toks.toSeq.flatMap { case (id, ws) =>
      val present = terms.filter(ws.contains)
      if (present.isEmpty) None
      else {
        val dl = ws.length.toLong
        val s = present.map { t =>
          val k = ws.count(_ == t).toLong
          val df = dfm(t)
          r9(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * (k * 2.2) /
            (k + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumDl * 1.0 / n))))
        }.sum
        Some((id, present.size.toLong,
          s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = TextQueries.bm25.run(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === expect, "top-10 BM25 ranking diverged from the replica")
  }

  test("q_weighted_sample matches the Efraimidis-Spirakis replica and skews long") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect()
    def key(id: Long, w: Long): Double = {
      val h = (id % 2147483647L) * 2654435761L % 2147483647L
      BigDecimal(math.log((h + 1).toDouble / 2147483648.0) / math.max(w, 1L))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = docs.map { case (id, nc) => (id, nc, key(id, nc)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(25).toSeq
    val got = TextQueries.weightedSample.run(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === expect, "E-S top-25 diverged from the replica")
    val sampleMean = expect.map(_._2).sum.toDouble / expect.size
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"char-weighted sampling must overrepresent long docs " +
        s"(sample $sampleMean vs corpus $corpusMean)")
  }

  test("q_line_dedup drops a span repeated across >= 3 docs, keeps rarer spans") {
    // Footer = exactly one 8-token span, planted at position 0 so it
    // lands on the non-overlapping span grid in every carrier doc.
    val footer = "copyright acme corp all rights reserved contact us"
    val dir = docsDir(Seq(
      s"$footer one two three four five six seven eight",  // doc 0: footer + 1 span
      s"$footer nine ten eleven twelve thirteen fourteen fifteen sixteen", // doc 1
      s"$footer unique tail of doc two only here present", // doc 2
      "entirely fresh words that no other document shares at all today")) // doc 3
    val out = TextQueries.lineDedup.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // carriers: 2 spans total, footer dropped -> 1 kept, 8 tokens kept
    Seq(0L, 1L, 2L).foreach { id =>
      assert(out(id) === ((2L, 1L, 8L)), s"doc $id")
    }
    // doc 3: 11 tokens -> spans of 8 + 3, nothing hot, all kept
    assert(out(3L) === ((2L, 2L, 11L)))
  }
}
