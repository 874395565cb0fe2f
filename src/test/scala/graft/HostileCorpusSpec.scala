package graft

import org.apache.spark.sql.functions._

/** Adversarial-input hardening for the text/dedup family (r5 ask #6).
  *
  * Every fixture doc is whitespace-tokenizable ASCII of moderate length;
  * this spec replaces `documents` with a corpus built to break substring
  * arithmetic and cap assumptions — empty strings, 1-char docs, a 100 kB
  * single token, deep multi-byte UTF-8 (CJK / emoji / combining / RTL),
  * whitespace-only docs, and a heavy exact-dup block — and asserts that
  * every text-family operator still evaluates without throwing and that
  * the hot-bucket caps still bind. Results are NOT oracle-checked here
  * (no planted truth); the contract under test is totality + bounded
  * buckets, the properties that keep a 100 TB run alive when real-web
  * garbage arrives. */
class HostileCorpusSpec extends SparkTestBase {

  private val dir = "/tmp/graft_hostile"

  private lazy val corpus: Unit = {
    // full fixture layout so any table an op touches resolves; documents
    // is then overwritten with the hostile corpus
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val big = "x" * 100000                  // one 100 kB token, no spaces
    val bigTokens = ("tok " * 20000).trim   // 100 kB of 4-char tokens
    val docs: Seq[(Long, String, String, String)] = Seq(
      (0L, "", "en", "web"),
      (1L, "a", "en", "web"),
      (2L, " ", "en", "web"),
      (3L, "          ", "en", "web"),      // whitespace-only
      (4L, "✓", "de", "web"),               // 1 multi-byte char
      (5L, "日本語のテキストです、トークン境界なし", "ja", "web"),
      (6L, "🎉🎊🎈 emoji 🎉 soup 🎊 with 🎈 tokens", "en", "web"),
      (7L, "é́́ combining ́ marks é", "fr", "web"),
      (8L, "نص عربي من اليمين إلى اليسار مع كلمات", "ar", "web"),
      (9L, big, "en", "crawl"),
      (10L, bigTokens, "en", "crawl"),
      (11L, "\n\t\r mixed \n whitespace \t forms \r", "en", "web"),
      (12L, "null", "en", "web"),
      (13L, "{\"json\": \"looking\", \"doc\": [1,2]}", "en", "web"),
      (14L, "short", "en", "web"),
      (15L, "0123456789", "en", "web"),     // exactly k+w-2: winnow boundary
      (16L, "01234567890", "en", "web"),    // exactly k+w-1: smallest winnowable
      (17L, "word " * 3 + "tail", "en", "web"),
      (18L, "ascii mixed with 中文 and عربي and русский in one doc", "xx", "web")
    ) ++ (19L until 59L).map(i =>           // 40-copy exact-dup block
      (i, "duplicate boilerplate block that repeats verbatim many times",
       "en", "boiler")) ++
      (59L until 79L).map(i =>              // near-dups of one base
      (i, s"almost identical document with tiny variation number ${i % 3}",
       "en", "web"))
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // the text/dedup surface that consumes `documents.text` — every op that
  // does substring/token arithmetic on raw text
  private val ops = Seq(
    "q_text_stats", "q_text_tokens", "q_text_ttr", "q_text_zipf",
    "q_text_ngram_coverage",
    "q_text_langid", "q_eval_langid", "q_text_quality", "q_text_entropy",
    "q_text_lmscore", "q_text_lmbuckets", "q_text_gopher", "q_text_blocklist",
    "q_text_code_detect", "q_text_repetition", "q_text_chunk",
    "q_text_tokcount", "q_text_tokcount_re", "q_text_fingerprint",
    "q_text_winnow", "q_text_winnow_pairs", "q_text_dupspans",
    "q_dedup_substring", "q_text_readability", "q_text_bpe",
    "q_text_containment_pairs",
    "q_text_contamination", "q_text_novelty", "q_text_keywords",
    "q_text_tfidf", "q_text_cluster_topics", "q_text_heavyhitters",
    "q_dedup_exact", "q_dedup_norm", "q_dedup_near", "q_dedup_minhash",
    "q_dedup_lsh", "q_dedup_minhash_fast", "q_dedup_lsh_fast",
    "q_dedup_simhash", "q_dedup_editdist", "q_dedup_cluster", "q_dedup_cdc",
    "q_dedup_cdc_fast",
    "q_dedup_soft", "q_dedup_segments", "q_scrub_boilerplate",
    "q_dedup_incremental",
    "q_pack_sequences", "q_pack_mask", "q_pipeline_curate")

  test("every text/dedup op is total over the hostile corpus") {
    corpus
    val failures = ops.flatMap { n =>
      spark.catalog.clearCache()
      try { SparkEntry.queries(n)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$n: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"ops threw on the hostile corpus:\n${failures.mkString("\n")}")
  }

  test("hot-bucket caps still bind on the dup-heavy hostile corpus") {
    corpus
    import graft.ops.LlmOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val gramCap = math.max(
      math.min(LlmOps.hotGramFrac * nDocs, LlmOps.hotGramAbs),
      LlmOps.hotGramMin)
    val maxGram = LlmOps.gramsCapped(docs).groupBy("g").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxGram <= gramCap,
      s"hostile corpus pushed a gram bucket to $maxGram past cap $gramCap")
    val banded = LlmOps.dropHotBuckets(
      LlmOps.minhashBands(LlmOps.minhashSigs(docs)), Seq("band", "sig"))
    val maxBand = banded.groupBy("band", "sig").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxBand <= LlmOps.bandBucketCap,
      s"hostile corpus pushed a band bucket to $maxBand past the cap")
  }

  test("jarowinkler block cap binds on a single hot block (r11 ask #3)") {
    import spark.implicits._
    // 1200 parts, ALL in one p_size block (over the 1000 cap): the
    // secondary first-token key must sub-block the candidate set
    val hot = (1 to 1200).map { i =>
      val tok = Seq("alpha", "beta", "gamma", "delta")(i % 4)
      // two planted near-pairs INSIDE the alpha sub-block (ids 4,8 get
      // names one edit apart); everything else is far apart
      val name =
        if (i == 4) "alpha anvil linen rose"
        else if (i == 8) "alpha anvil linen rosy"
        else s"$tok item number $i distinct"
      (i.toLong, name, 7)
    }
    // one near-pair that CROSSES sub-blocks — the documented loss when
    // the cap binds (uncapped blocking would have scored it)
    val cross = Seq(
      (5001L, "omega anvil linen rose", 7),
      (5002L, "omeba anvil linen rose", 7))
    val d = java.nio.file.Files.createTempDirectory("graft_jwhot").toString
    (hot ++ cross).toDF("p_partkey", "p_name", "p_size")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val out = graft.ops.Inference.ops.find(_.name == "q_text_jarowinkler")
      .get.fn(spark, d).collect()
    val pairs = out.map(r =>
      (r.getAs[Long]("p1"), r.getAs[Long]("p2"))).toSet
    assert(pairs.contains((4L, 8L)),
      s"the within-sub-block near-pair must survive the cap: $pairs")
    assert(!pairs.contains((5001L, 5002L)),
      "a cross-first-token pair inside an over-cap block is the " +
      "documented blocking loss")
    // every returned pair shares the secondary key: the enforced bound
    val names = out.map(r =>
      (r.getAs[String]("name1").split(" ").head,
       r.getAs[String]("name2").split(" ").head))
    assert(names.forall { case (x, y) => x == y },
      s"over-cap block pairs must share the first token: ${names.toSeq}")
    // and an UNDER-cap table keeps cross-token matches (cap inert)
    val d2 = java.nio.file.Files.createTempDirectory("graft_jwcold").toString
    (hot.take(100) ++ cross).toDF("p_partkey", "p_name", "p_size")
      .write.mode("overwrite").parquet(s"$d2/part.parquet")
    val out2 = graft.ops.Inference.ops.find(_.name == "q_text_jarowinkler")
      .get.fn(spark, d2).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"))).toSet
    assert(out2.contains((5001L, 5002L)),
      s"under the cap the secondary key must stay inert: $out2")
  }

  test("CDC chunk bounds bind on boundary-dense and boundary-free text") {
    corpus
    import graft.ops.LlmOps
    // construct the two pathological extremes deterministically: a
    // single-char doc whose (only) window hash is NOT ≡ 0 mod 64 — zero
    // candidates, every cut is forced at prev+256 — and a 2-char-period
    // doc where one rotation IS ≡ 0 — a candidate every 2 chars, so the
    // minLen floor is what keeps chunks from collapsing to 2 chars
    def h8(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16)
    val freeChar = ('a' to 'z')
      .find(c => h8(c.toString * 8) % 64 != 0).get
    val densePat = (for {
      a <- '!' to '~'; b <- '!' to '~' if a != b
      w = (s"$a$b" * 4)
      if h8(w) % 64 == 0 || h8(w.tail + a) % 64 == 0
    } yield s"$a$b").headOption
    import spark.implicits._
    val pathological = Seq(
      (1000L, freeChar.toString * 2000),           // boundary-free
      (1001L, densePat.map(_ * 1000).getOrElse(""))) // boundary-dense
      .filter(_._2.nonEmpty)
      .toDF("doc_id", "text")
    val hostile = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").unionByName(pathological)
    for (fast <- Seq(false, true)) {
      val chunks = LlmOps.cdcChunks(hostile, 8, 64, 16, 256, fast)
        .groupBy("doc_id")
        .agg(max(when(col("cl") > 256, col("cl"))).as("over"),
             // only the FINAL chunk may undershoot minLen (the FastCDC
             // tail contract), so at most one short chunk per doc
             count(when(col("cl") < 16, lit(1))).as("under"))
        .collect()
      assert(chunks.nonEmpty)
      chunks.foreach { r =>
        assert(r.isNullAt(1),
          s"fast=$fast doc ${r.get(0)}: a chunk exceeds maxLen=256")
        assert(r.getLong(2) <= 1,
          s"fast=$fast doc ${r.get(0)}: only the final chunk may be " +
          s"shorter than minLen=16, got ${r.getLong(2)} short chunks")
      }
    }
    // the md5 form's extremes are exact: boundary-free docs cut at the
    // forced maximum every time; boundary-dense docs sit on the minLen
    // floor (first candidate ≥ prev+16 lands at prev+16 or prev+17)
    val byDoc = LlmOps.cdcChunks(pathological, 8, 64, 16, 256, fast = false)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("cl")).toSeq }
    byDoc.get(1000L).foreach { cls =>
      assert(cls.count(_ == 256L) == cls.size - 1 || cls.forall(_ == 256L),
        s"boundary-free doc must chunk at the forced max: $cls")
    }
    if (densePat.nonEmpty)
      byDoc.get(1001L).foreach { cls =>
        // every chunk lands on the minLen floor (16 or 17, depending on
        // candidate parity) except at most the final tail
        assert(cls.count(c => c < 16L || c > 17L) <= 1 &&
                 cls.filter(c => c < 16L || c > 17L).forall(_ < 16L),
          s"boundary-dense doc must sit on the minLen floor: $cls")
      }
  }

  test("token counters return a non-negative count for every hostile doc") {
    corpus
    val rows = SparkEntry.queries("q_text_tokcount")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("ws_tokens")
      assert(c >= 0L, s"doc ${r.get(0)}: negative token count $c")
      assert(r.getAs[Long]("subword_est") >= 0L)
      assert(r.getAs[Long]("chars") >= 0L)
    }
  }
}
