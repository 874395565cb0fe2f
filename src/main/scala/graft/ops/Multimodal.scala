package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal decode plumbing: opaque binary payloads flow through a
  * per-partition batch decoder with typed input/output schemas.
  *
  * The decoder itself is a clearly-marked STUB — the image/audio libraries
  * are not in this container — but everything Spark-side is real and
  * tested: the binary column, the case-class schemas, the mapPartitions
  * batch shape (one iterator per partition, so a real decoder can amortize
  * model/codec initialization per partition, the same contract as
  * mapInPandas batches), and the partition-preserving execution.
  */
object Multimodal {

  /** Input row: an opaque media payload plus routing metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String)

  /** Decoder output: typed media features. */
  case class DecodedMedia(doc_id: Long, lang: String, width: Int, height: Int,
                          format: String, n_bytes: Long)

  /** STUB batch decoder. A real implementation would initialize a codec
    * once here (per partition) and decode each payload; this fake derives
    * deterministic "dimensions" from the bytes so tests are stable. The
    * signature and batch shape are the real contract. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[DecodedMedia] = {
    // [real decoder init would happen here, once per partition]
    rows.map { r =>
      val b = r.payload
      val w = 64 + ((b.headOption.getOrElse(0: Byte) & 0xff) % 192)
      val h = 64 + ((b.lastOption.getOrElse(0: Byte) & 0xff) % 192)
      val fmt = if (b.length % 2 == 0) "png" else "jpeg"
      DecodedMedia(r.doc_id, r.lang, w, h, fmt, b.length.toLong)
    }
  }

  /** documents.text → binary payload → per-partition decode. */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
              col("lang"))
      .as[MediaRow]
      .mapPartitions(decodeBatch _)
  }

  val ops: Seq[OpDef] = Seq(
    // no-oracle: the decode is opaque by design (rows-only check; schema,
    // determinism, and batch shape are asserted in MultimodalSpec)
    OpDef.noOracle("q_multimodal_decode") { (s, d) =>
      decodeDocuments(s, Tables.documents(s, d)).toDF().orderBy("doc_id")
    }
  )
}
