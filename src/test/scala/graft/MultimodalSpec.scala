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
}
