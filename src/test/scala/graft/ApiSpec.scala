package graft

import graft.ops.LlmOps

/** The DataFrame-parameterized API must work on ANY table with the
  * documented column shape — not just the driver fixtures. These tests
  * build tiny in-memory tables from scratch and run the public operators
  * on them. */
class ApiSpec extends SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight", 51L),
      (1L, "the quick brown fox jumps over the lazy dog tonight", 51L), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog today", 49L),   // near dup of 0
      (3L, "completely different content about spark query engines", 54L),
      (4L, "another unrelated document mentioning database systems", 54L))
    rows.toDF("doc_id", "text", "n_chars")
  }

  test("exactDedup groups identical texts with min-id survivor") {
    val out = LlmOps.exactDedup(docs).collect()
    assert(out.length == 4, "5 docs, one exact-dup pair -> 4 groups")
    val dupGroup = out.find(_.getLong(1) == 2L).get
    assert(dupGroup.getLong(0) == 0L, "survivor must be the min doc_id")
  }

  test("jaccardPairs finds the planted near-dup on a hand-built table") {
    val pairs = LlmOps.jaccardPairs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair (jaccard 1.0)")
    assert(pairs.contains((0L, 2L)), "near dup pair (differs in last token)")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
           "unrelated doc must not pair")
  }

  test("minhashPairs and simhashPairs surface the exact-dup pair") {
    val mh = LlmOps.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((0L, 1L)), "identical texts share every band")
    val sh = LlmOps.simhashPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.contains((0L, 1L)), "identical texts have Hamming 0")
  }

  test("dedupClusters assigns one canon id to the {0,1,2} component") {
    val canon = LlmOps.dedupClusters(docs, 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon(0L) == 0L && canon(1L) == 0L && canon(2L) == 0L,
           s"component must canonicalize to min id, got $canon")
  }

  test("dedupClusters returns empty on a table with no near-dup pairs") {
    import spark.implicits._
    // every pairwise 3-gram Jaccard is 0 — the near-dup graph has no
    // edges; sum-over-empty convergence must not NPE (regression)
    val clean = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", 35L),
      (1L, "one two three four five six seven", 33L),
      (2L, "red orange yellow green blue indigo violet", 42L))
      .toDF("doc_id", "text", "n_chars")
    assert(LlmOps.dedupClusters(clean, 0.5).collect().isEmpty)
  }

  test("operators derive n_chars when the column is absent") {
    val noChars = docs.drop("n_chars")
    val dd = LlmOps.exactDedup(noChars).collect()
    assert(dd.length == 4 && dd.find(_.getLong(1) == 2L).get.getLong(2) == 51L,
           "derived n_chars must equal length(text)")
    assert(LlmOps.editDistancePairs(noChars, 8).collect()
             .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(LlmOps.qualityScores(noChars, 2).collect().length == 5)
  }

  test("clusterPairs components any pair table; incremental dedup crosses slices") {
    import spark.implicits._
    // chain 10-11-12 plus isolated pair 20-21
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val canon = LlmOps.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(canon(10L) == ((10L, 3L)) && canon(11L) == ((10L, 3L)) &&
           canon(12L) == ((10L, 3L)), s"chain must canonicalize to 10, got $canon")
    assert(canon(20L) == ((20L, 2L)) && canon(21L) == ((20L, 2L)))

    val newSlice = docs.filter("doc_id = 1 or doc_id = 2")
    val corpus = docs.filter("doc_id = 0 or doc_id >= 3")
    val inc = LlmOps.incrementalDedupPairs(newSlice, corpus, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.contains((1L, 0L)), "new exact-dup doc must hit the corpus index")
    assert(!inc.exists(_._2 == 4L), "unrelated corpus doc must not pair")

    // overlapping slices must not emit (id, id) self-pairs
    val overlap = LlmOps.incrementalDedupPairs(docs, docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(overlap.nonEmpty && overlap.forall { case (a, b) => a != b },
           s"overlapping slices leaked self-pairs: ${overlap.filter(p => p._1 == p._2)}")
  }

  test("winnowing fingerprints: identical texts match, distinct content differs") {
    val fp = LlmOps.winnowFingerprints(docs, 8, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fp(0L) == fp(1L), "exact dups must fingerprint identically")
    assert(fp(0L) != fp(3L), "unrelated docs must not share the summary")
  }

  test("contamination flags only corpus docs overlapping the benchmark") {
    val bench = docs.filter("doc_id = 0")
    val corpus = docs.filter("doc_id >= 2")
    val hits = LlmOps.contamination(corpus, bench, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 2 shares all but the last-token 3-grams with doc 0; 3 and 4
    // share none
    assert(hits.keySet == Set(2L), s"got $hits")
    assert(hits(2L) >= 3L)
  }

  test("curateCorpus keeps exact survivors and near-dup canons only") {
    val kept = LlmOps.curateCorpus(
        docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
            .withColumn("source", org.apache.spark.sql.functions.lit("web")),
        0.5, 0.0)
      .collect().map(_.getLong(0)).toSet
    // 1 is an exact dup of 0 (loses the survivor vote), 2 is a near dup
    // of 0 (loses the canon vote); 0, 3, 4 survive at quality floor 0
    assert(kept == Set(0L, 3L, 4L), s"got $kept")
  }

  test("every dedup/text operator returns empty (not an error) on an empty table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("web"))
    assert(LlmOps.exactDedup(empty).collect().isEmpty)
    assert(LlmOps.jaccardPairs(empty, 0.5).collect().isEmpty)
    assert(LlmOps.minhashPairs(empty).collect().isEmpty)
    assert(LlmOps.simhashPairs(empty, 3).collect().isEmpty)
    assert(LlmOps.lshDedupPairs(empty, 0.5).collect().isEmpty)
    assert(LlmOps.dedupClusters(empty, 0.5).collect().isEmpty)
    assert(LlmOps.editDistancePairs(empty, 8).collect().isEmpty)
    assert(LlmOps.incrementalDedupPairs(empty, empty, 0.5).collect().isEmpty)
    assert(LlmOps.contamination(empty, empty, 1).collect().isEmpty)
    assert(LlmOps.tokenCounts(empty).collect().isEmpty)
    assert(LlmOps.vocabStats(empty).collect().isEmpty)
    assert(LlmOps.corpusStats(empty).collect().isEmpty)
    assert(LlmOps.qualityScores(empty, 5).collect().isEmpty)
    assert(LlmOps.curateCorpus(empty, 0.5, 0.5).collect().isEmpty)
  }

  test("packSequences bins are contiguous, offsets in-bounds, langs independent") {
    import spark.implicits._
    val d = Seq(
      (0L, "en", "a b c d e"), // 5 toks: bin 0 off 0
      (1L, "en", "f g h"),     // starts at tok 5: bin 0 off 5, straddles
      (2L, "en", "i j k l"),   // starts at tok 8: bin 1 off 0
      (3L, "de", "x y z"))     // separate lang restarts at bin 0
      .toDF("doc_id", "lang", "text")
    val out = LlmOps.packSequences(d, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(out.toSet == Set(
      (0L, "en", 0L, 0L), (1L, "en", 0L, 5L), (2L, "en", 1L, 0L),
      (3L, "de", 0L, 0L)), out.mkString(", "))
  }

  test("chunkDocs windows overlap by window-stride and cover every token") {
    import spark.implicits._
    val d = Seq((0L, (1 to 10).map(i => s"t$i").mkString(" "))) // 10 toks
      .toDF("doc_id", "text")
    val out = LlmOps.chunkDocs(d, 4, 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    // starts 1,4,7,10 -> chunks of 4,4,4,1 tokens; adjacent chunks share 1
    assert(out.toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"), (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10"), (3L, 1L, "t10")), out.mkString(", "))
    intercept[IllegalArgumentException] { LlmOps.chunkDocs(d, 2, 3) }
  }

  test("tokenCounts and qualityScores run on the hand-built table") {
    val tc = LlmOps.tokenCounts(docs).collect()
    assert(tc.length == 5 && tc.head.getLong(1) > 0)
    val q = LlmOps.qualityScores(docs, 2).collect()
    assert(q.length == 5 && q.forall(r => r.getDouble(5) > 0.0))
  }

  test("cosineTopK and cosineDupPairs run on a hand-built embedding table") {
    import spark.implicits._
    // unit-norm 4-dim vectors: 0 and 1 identical, 2 orthogonal
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions.col
    val top = LlmOps.cosineTopK(emb, col("vec_id") === 0L, 1).collect()
    assert(top.length == 1 && top.head.getLong(1) == 1L &&
           top.head.getDouble(2) == 1.0)
    val dups = LlmOps.cosineDupPairs(emb, 0.9).collect()
    assert(dups.length == 1 &&
           (dups.head.getLong(0), dups.head.getLong(1)) == (0L, 1L))
  }

  test("containment dominates jaccard and catches the exact-dup pair") {
    val cont = LlmOps.containmentPairs(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
                (r.getDouble(2), r.getDouble(3))).toMap
    assert(cont.contains((0L, 1L)), s"suffix pair missing from $cont")
    // every containment value bounds the pair's jaccard from above:
    // |A∩B|/min-side ≥ |A∩B|/|A∪B|
    val jac = LlmOps.jaccardPairs(docs, 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    cont.foreach { case (k, (ab, ba)) =>
      jac.get(k).foreach(j =>
        assert(math.max(ab, ba) >= j - 1e-9,
               s"containment below jaccard for $k: ($ab,$ba) vs $j"))
    }
  }

  test("normalizedDedup collapses case/punctuation variants; repetition flags loops") {
    import spark.implicits._
    val t = Seq(
      (0L, "Alpha, beta GAMMA!"),
      (1L, "alpha beta gamma"),
      (2L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
    val nd = LlmOps.normalizedDedup(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nd(0L) == 2L, s"variants must collapse to doc 0: $nd")
    assert(nd(2L) == 1L)
    val rep = LlmOps.repetitionSignals(t).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rep(2L) > 0.9, s"pure loop must score ~1: $rep")
    assert(rep(0L) < 0.9, s"non-repetitive doc must not: $rep")
  }

  test("cooccur and seenBloom run on hand-built tables with the documented shapes") {
    import spark.implicits._
    // cooccur: (cust, supp) membership — items 10 and 11 share 2 customers
    val m = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 12L))
      .toDF("cust", "supp")
    val pairs = graft.ops.Graph.cooccur(m, degCap = 100, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((10L, 11L, 2L)), pairs.mkString(","))
    // seenBloom: (doc_id, text) on both sides
    val cp = Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
    val nd = Seq((10L, "alpha"), (11L, "gamma")).toDF("doc_id", "text")
    val sb = graft.ops.Curation.seenBloom(nd, cp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sb(10L) == ((1L, 1L)), "exact copy must be candidate + actual")
    assert(sb(11L)._2 == 0L, "novel doc is not an actual dup")
  }
}
