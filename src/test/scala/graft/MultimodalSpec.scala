package graft

import graft.ops.{Multimodal, Tables}

/** The multimodal decode contract: schema, determinism, batch shape. */
class MultimodalSpec extends SparkTestBase {

  test("decode output carries the typed schema") {
    val out = Multimodal.decodeDocuments(spark, Tables.documents(spark, sf))
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "width", "height", "format", "n_bytes"))
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.width >= 64 && r.width < 256)
      assert(r.n_bytes > 0)
    }
  }

  test("decode is deterministic and partition-preserving") {
    val docs = Tables.documents(spark, sf).repartition(7)
    val a = Multimodal.decodeDocuments(spark, docs).collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.decodeDocuments(spark, docs).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
    // mapPartitions must not shuffle: partition count is preserved
    assert(Multimodal.decodeDocuments(spark, docs).rdd.getNumPartitions == 7)
  }

  test("frame sampling explodes 1->N with deterministic frame grid") {
    val frames = Multimodal.frameSample(spark, Tables.documents(spark, sf), 500L)
      .collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.size == Tables.documents(spark, sf).count())
    byDoc.values.foreach { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.head.frame_idx == 0 && sorted.head.ts_ms == 0L)
      // every-500ms grid: ts = idx * 500
      sorted.foreach(f => assert(f.ts_ms == f.frame_idx * 500L))
      assert(fs.length >= 2, "stub duration >= 1s at 500ms sampling")
    }
  }

  test("resize chains after decode and rescales byte size") {
    import spark.implicits._
    val resized = Multimodal.decodeDocuments(spark, Tables.documents(spark, sf))
      .mapPartitions(it => Multimodal.resizeBatch(it, 32, 32))
      .collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.width == 32 && r.height == 32 && r.n_bytes >= 1)
    }
  }

  test("extracted features are unit-norm and feed the similarity operators") {
    import org.apache.spark.sql.functions.col
    val feats = Multimodal.extractFeatures(spark, Tables.documents(spark, sf))
    val norms = feats.collect().map(f => math.sqrt(f.features.map(x => x.toDouble * x).sum))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-3, s"norm $n"))
    // composition: media features are a (vec_id, embedding) table like any
    // other — the similarity surface applies unchanged
    val emb = feats.toDF().select(col("doc_id").as("vec_id"),
                                  col("features").as("embedding"))
    val top = graft.ops.LlmOps.cosineTopK(emb, col("vec_id") < 2, 3).collect()
    assert(top.nonEmpty && top.forall(_.getLong(3) <= 3))
  }

  test("batch shape: decoder sees one iterator per partition") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).repartition(5)
    val batchSizes = docs
      .select($"doc_id", $"text".cast("binary").as("payload"), $"lang")
      .as[Multimodal.MediaRow]
      .mapPartitions(it => Iterator.single(it.size.toLong))
      .collect()
    assert(batchSizes.length == 5, "one batch per partition")
    assert(batchSizes.sum == docs.count())
  }

  test("batched inference groups rows into fixed micro-batches per partition") {
    val docs = Tables.documents(spark, sf).repartition(3)
    val n = docs.count()
    val scored = Multimodal.scoreDocuments(spark, docs, 32).collect()
    assert(scored.length == n, "one score per row")
    assert(scored.forall(r => r.score >= 0.0 && r.score < 1.0))
    // every micro-batch is full-size except possibly one tail per partition
    assert(scored.forall(_.batch_size <= 32))
    // (rows in a ragged batch all report its size, so at most one ragged
    // batch per partition bounds ragged rows by 31 × 3 partitions)
    val raggedRows = scored.count(_.batch_size < 32)
    assert(raggedRows <= 31 * 3,
      s"more ragged-batch rows than one tail per partition allows: $raggedRows")
    // deterministic across runs
    val again = Multimodal.scoreDocuments(spark, docs, 32).collect()
      .map(r => r.doc_id -> r.score).toMap
    assert(scored.forall(r => again(r.doc_id) == r.score))
  }

  test("arrow columnar transport is bit-identical to the row transport") {
    // the Arrow seam changes HOW bytes reach the model (off-heap
    // offsets+data buffers per micro-batch), never WHAT the model sees:
    // scores and batch shapes must match the row path exactly, so the
    // two transports are interchangeable per partition
    val docs = Tables.documents(spark, sf).repartition(3)
    val row = Multimodal.scoreDocuments(spark, docs, 32).collect()
      .map(r => r.doc_id -> ((r.score, r.batch_size))).toMap
    val arrow = Multimodal.scoreDocumentsArrow(spark, docs, 32).collect()
    assert(arrow.length == row.size, "one score per row")
    arrow.foreach { r =>
      assert(row(r.doc_id) == ((r.score, r.batch_size)),
        s"transport mismatch for doc ${r.doc_id}")
    }
    // multi-byte payloads exercise the buffer walk: force a UTF-8-heavy
    // payload through the arrow path and check the byte-sum is over
    // BYTES (buffer length), not characters
    import spark.implicits._
    val weird = Seq((1L, "日本語🎉", "xx"), (2L, "", "xx"))
      .toDF("doc_id", "text", "lang")
    val ws = Multimodal.scoreDocumentsArrow(spark, weird, 32).collect()
      .map(r => r.doc_id -> r.score).toMap
    val expected = Seq(1L -> "日本語🎉", 2L -> "").map { case (id, t) =>
      id -> ((t.getBytes("UTF-8").foldLeft(0L)((a, b) => a + (b & 0xff))
              % 1000L) / 1000.0)
    }.toMap
    assert(ws == expected, "arrow path must sum raw UTF-8 bytes")
  }
}
