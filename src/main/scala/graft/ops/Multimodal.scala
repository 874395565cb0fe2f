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

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Long, n_bytes: Long)

  /** STUB frame sampler — the 1→N shape of video processing: each input
    * row explodes into every-`everyMs` frames through a per-partition
    * iterator (a real implementation opens the container once per row and
    * seeks; init cost amortizes per partition). The fake derives a
    * deterministic "duration" from the payload so tests are stable. */
  def sampleFrames(rows: Iterator[MediaRow], everyMs: Long): Iterator[Frame] = {
    // [real demuxer/codec init would happen here, once per partition]
    rows.flatMap { r =>
      val durMs = 1000L + (r.payload.length % 9000)
      (0L until durMs by everyMs).zipWithIndex.iterator.map { case (t, i) =>
        Frame(r.doc_id, i, t, math.min(r.payload.length.toLong, 4096L))
      }
    }
  }

  /** documents.text → binary payload → per-partition frame sampling. */
  def frameSample(spark: SparkSession, docs: DataFrame,
                  everyMs: Long): Dataset[Frame] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
              col("lang"))
      .as[MediaRow]
      .mapPartitions(rows => sampleFrames(rows, everyMs))
  }

  /** Resized media row (payload size rescaled by pixel ratio). */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, n_bytes: Long)

  /** STUB resize — a typed transform CHAINED after decode, the shape of a
    * multi-stage media pipeline (decode → resize → encode) where each
    * stage is an independent per-partition batch. */
  def resizeBatch(rows: Iterator[DecodedMedia], w: Int, h: Int): Iterator[ResizedMedia] =
    rows.map { m =>
      val scaled = m.n_bytes * (w.toLong * h) / math.max(m.width.toLong * m.height, 1L)
      ResizedMedia(m.doc_id, w, h, math.max(scaled, 1L))
    }

  /** Media feature vector — the contract a real image/audio encoder
    * (CLIP-ish) would fill; output flows directly into the similarity
    * operators (LlmOps.cosineTopK / cosineDupPairs take any
    * (vec_id, embedding) table). */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** STUB feature extractor: deterministic L2-normalized 8-bin byte
    * histogram standing in for an encoder forward pass. The batch shape —
    * iterator in, iterator out, weights loaded once per partition — is the
    * real contract. */
  def extractFeaturesBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // [encoder weights would load here, once per partition]
    rows.map { r =>
      val hist = new Array[Float](8)
      r.payload.foreach(b => hist((b & 0xff) >> 5) += 1f)
      val n = math.max(math.sqrt(hist.map(x => x * x).sum).toFloat, 1e-6f)
      MediaFeatures(r.doc_id, hist.map(_ / n))
    }
  }

  /** documents → per-partition feature extraction. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
              col("lang"))
      .as[MediaRow]
      .mapPartitions(extractFeaturesBatch _)
  }

  /** Per-row model score — what a quality/toxicity/NSFW classifier head
    * emits per document or image. */
  case class InferredScore(doc_id: Long, score: Double, batch_size: Int)

  /** STUB batched inference — the GPU-inference shape: rows are grouped
    * into fixed-size micro-batches INSIDE each partition and "the model"
    * consumes a whole batch per forward pass (`grouped(batchSize)`), which
    * is the throughput contract that separates accelerator inference from
    * per-row map. The fake scorer is a deterministic byte-sum in [0,1);
    * weights would load once per partition, the batch loop is real, and
    * each output row records the batch it rode in (asserted in
    * MultimodalSpec). */
  def inferBatched(rows: Iterator[MediaRow], batchSize: Int): Iterator[InferredScore] = {
    // [model weights would load here, once per partition]
    rows.grouped(batchSize).flatMap { batch =>
      // [real forward pass: model(batch) — one call per micro-batch]
      batch.map { r =>
        val s = (r.payload.foldLeft(0L)((a, b) => a + (b & 0xff)) % 1000L) / 1000.0
        InferredScore(r.doc_id, s, batch.size)
      }
    }
  }

  /** documents → binary payload → per-partition micro-batched scoring. */
  def scoreDocuments(spark: SparkSession, docs: DataFrame,
                     batchSize: Int): Dataset[InferredScore] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
              col("lang"))
      .as[MediaRow]
      .mapPartitions(rows => inferBatched(rows, batchSize))
  }

  /** Arrow-columnar micro-batched inference — the TRANSPORT upgrade of
    * [[inferBatched]] (r6 "What's missing" #3): each micro-batch is
    * assembled into an off-heap Arrow `VectorSchemaRoot` (BigIntVector
    * ids + VarBinaryVector payloads) and "the model" consumes the root's
    * RAW BUFFERS — offsets + data ArrowBuf reads, no per-element byte[]
    * materialization — which is the seam a real accelerator runtime
    * (ONNX Runtime / Triton / anything speaking the Arrow C-Data
    * interface) binds to zero-copy: at that boundary you hand over two
    * pointers per column, not N objects. The JVM-side row→column
    * assembly remains (Scala `mapPartitions` receives rows; the fully
    * columnar scan→model path needs Spark's columnar-plan SPI and is
    * documented, not simulated), but the per-row object churn at the
    * MODEL boundary — the part a GPU pipeline actually chokes on — is
    * gone. Same deterministic byte-sum score as the row path;
    * MultimodalSpec asserts the two transports are bit-identical, so
    * swapping them can never change results. Allocator lifecycle: one
    * root per partition, reused across micro-batches (`setRowCount`
    * resets), closed via the task-completion listener so a mid-task
    * failure cannot leak off-heap memory. */
  def inferBatchedArrow(rows: Iterator[MediaRow],
                        batchSize: Int): Iterator[InferredScore] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VectorSchemaRoot}
    if (!rows.hasNext) Iterator.empty
    else {
      val allocator = new RootAllocator()
      val ids = new BigIntVector("doc_id", allocator)
      val payloads = new VarBinaryVector("payload", allocator)
      val root = VectorSchemaRoot.of(ids, payloads)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          root.close(); allocator.close()
        })
      rows.grouped(batchSize).flatMap { batch =>
        // assemble the micro-batch column-wise
        root.setRowCount(0)
        ids.setInitialCapacity(batch.size)
        var i = 0
        batch.foreach { r =>
          ids.setSafe(i, r.doc_id)
          payloads.setSafe(i, r.payload)
          i += 1
        }
        root.setRowCount(i)
        // [real forward pass: hand `root` across the C-Data interface —
        //  one (offsets, data) buffer pair per column per batch]
        // stub model: consume the columnar buffers directly
        val off = payloads.getOffsetBuffer
        val data = payloads.getDataBuffer
        (0 until i).map { j =>
          val start = off.getInt(j * 4L)
          val end = off.getInt((j + 1) * 4L)
          var sum = 0L
          var p = start
          while (p < end) { sum += (data.getByte(p) & 0xff); p += 1 }
          InferredScore(ids.get(j), (sum % 1000L) / 1000.0, i)
        }
      }
    }
  }

  /** documents → binary payload → Arrow-columnar micro-batched scoring. */
  def scoreDocumentsArrow(spark: SparkSession, docs: DataFrame,
                          batchSize: Int): Dataset[InferredScore] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
              col("lang"))
      .as[MediaRow]
      .mapPartitions(rows => inferBatchedArrow(rows, batchSize))
  }

  val ops: Seq[OpDef] = Seq(
    // no-oracle: the decode is opaque by design (rows-only check; schema,
    // determinism, and batch shape are asserted in MultimodalSpec)
    OpDef.noOracle("q_multimodal_decode") { (s, d) =>
      decodeDocuments(s, Tables.documents(s, d)).toDF().orderBy("doc_id")
    },
    OpDef.noOracle("q_multimodal_frames") { (s, d) =>
      frameSample(s, Tables.documents(s, d), 500L).toDF()
        .orderBy("doc_id", "frame_idx")
    },
    OpDef.noOracle("q_multimodal_infer") { (s, d) =>
      scoreDocuments(s, Tables.documents(s, d), 32).toDF().orderBy("doc_id")
    },
    OpDef.noOracle("q_multimodal_infer_arrow") { (s, d) =>
      scoreDocumentsArrow(s, Tables.documents(s, d), 32).toDF()
        .orderBy("doc_id")
    },

    /** Binary-content exact dedup — the image/audio dedup primitive: hash
      * the opaque payload bytes, group, keep the min-id copy. Unlike the
      * decode ops this IS oracle-checked: the fixture payload is the
      * UTF-8 encoding of `text`, and md5 over those bytes is the same
      * hex string whether computed on Spark's BINARY or DuckDB's VARCHAR
      * — so the driver hash-verifies the exact pipeline a real corpus
      * would run on image bytes. Scale: map-only hashing, then a groupBy
      * on the 32-hex-char digest — partial aggregation collapses every
      * duplicate cluster map-side (same argument as exactDedup, but the
      * shuffle key is a fixed 32-byte hash instead of the full payload —
      * the reason content-addressed dedup is THE way to dedup 100 TB of
      * media). */
    OpDef(
      "q_mm_dedup_binary",
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY keep_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"), md5(col("payload")).as("content_hash"))
        .groupBy("content_hash")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("content_hash", "keep_id", "n_copies")
        .orderBy("keep_id")
    },

    /** Training-shard packing for media payloads (the WebDataset/TFRecord
      * shard-writer shape): greedy sequential bin-packing of each
      * source's payloads into ~2000-byte shards, in content-hash order.
      * Hash order is deliberate — it decorrelates shard membership from
      * ingest order (shards become IID samples of the source, which is
      * what a training loader wants) while staying fully deterministic.
      * A document lands in shard ⌊bytes-before-it / target⌋, so shards
      * fill to the boundary and the straddling item spills into its
      * shard's tail (shards may run slightly over; none run under until
      * the source is exhausted — the standard greedy writer contract).
      *
      * Scale: ONE window, partitioned by `source` — the packing unit IS
      * the parallelism unit, exactly how a sharded writer runs per
      * output partition at 100 TB (a global pack order would serialize
      * the corpus through one task; per-source packing shuffles each
      * source's metadata once). Pure integer cumulative sums ⇒
      * oracle-checked. */
    OpDef(
      "q_mm_shard_pack",
      """WITH m AS (
        |  SELECT doc_id, source, md5(text) AS h,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |w AS (SELECT doc_id, source, h, n_bytes,
        |        CAST(sum(n_bytes) OVER (PARTITION BY source
        |          ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum_bytes
        |      FROM m)
        |SELECT source, (cum_bytes - n_bytes) // 2000 AS shard_idx,
        |       doc_id, n_bytes, cum_bytes
        |FROM w ORDER BY source, shard_idx, doc_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
                md5(encode(col("text"), "UTF-8")).as("h"),
                octet_length(col("text").cast("binary")).cast("long")
                  .as("n_bytes"))
        .withColumn("cum_bytes", sum(col("n_bytes")).over(w))
        .select(col("source"),
                expr("(cum_bytes - n_bytes) div 2000").as("shard_idx"),
                col("doc_id"), col("n_bytes"), col("cum_bytes"))
        .orderBy("source", "shard_idx", "doc_id")
    }
  )
}
