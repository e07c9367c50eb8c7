package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched
  * per-partition passes. No image/audio codec ships in this
  * container, so the decode kernel is a clearly-marked deterministic
  * STUB — but everything Spark-side is real: the binary schema, the
  * typed Dataset, the mapPartitions batching (modeling a vectorized
  * decoder that amortizes per-batch setup), and the frame-sampling
  * explode. Swapping `decodeStub`/`frameChecksum` for a real codec
  * is a one-function change.
  *
  * The stub is arithmetic over the raw bytes, so a SQL oracle can
  * reproduce it byte-for-byte: the oracles decode octets from the
  * hex dump of the BLOB (`hex(CAST(text AS BLOB))`), so parity with
  * `content(i) & 0xff` here is exact even for non-ASCII payloads —
  * no codepoint/byte conflation.
  */
object Multimodal {

  /** Typed media row: binary payload + source metadata. */
  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Stub "decoded image" features. Deterministic fake of a decode:
    * dimensions from the leading bytes, mean intensity over the
    * payload. A real implementation would call the codec here. */
  case class DecodedMedia(doc_id: Long, n_bytes: Long, width: Long,
                          height: Long, mean_byte: Double)

  case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long,
                   checksum: Long)

  /** Deterministic MULTI-BYTE payload probe (the PII-injection
    * precedent): a 2-byte (é), 3-byte (CJK), and 4-byte (emoji,
    * surrogate pair in source) UTF-8 sequence appended to every
    * doc_id ≡ 0 (mod [[MbResidue]]) payload, so the byte-level
    * oracles provably execute on non-ASCII bytes — the fixture text
    * is pure ASCII, which would otherwise leave the "exact for
    * non-ASCII too" BLOB-parity claims untested. Escapes, not raw
    * glyphs, so source-encoding drift can't change the bytes. */
  val MbProbe: String = // " café 数据管道 🧪"
    " caf\u00e9 \u6570\u636e\u7ba1\u9053 \ud83e\uddea"
  val MbResidue = 7

  /** documents.text → opaque binary payloads (the real pipeline would
    * read image/audio bytes from object storage); [[MbProbe]] rides
    * in on the residue class. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), lit("image/stub").as("media_type"),
              concat(col("text"),
                when(pmod(col("doc_id"), lit(MbResidue)) === 0, lit(MbProbe))
                  .otherwise(lit(""))).cast("binary").as("content"))
      .as[MediaRow]
  }

  /** STUB decode kernel — replace with a real codec at deploy time. */
  private def decodeStub(r: MediaRow): DecodedMedia = {
    val b = r.content
    val w = 1L + (if (b.length > 0) (b(0) & 0xff) % 64 else 0)
    val h = 1L + (if (b.length > 1) (b(1) & 0xff) % 64 else 0)
    var sum = 0L
    var i = 0
    while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
    val mean = if (b.length == 0) 0.0 else sum.toDouble / b.length
    // floor(x·1e4 + 0.5)/1e4: same IEEE ops as the SQL oracle
    DecodedMedia(r.doc_id, b.length.toLong, w, h,
      math.floor(mean * 1e4 + 0.5) / 1e4)
  }

  /** Batched decode: partitions are processed in fixed-size groups,
    * the shape a vectorized decoder (or GPU batch) wants — per-batch
    * setup cost is amortized, memory is bounded by `batchSize`. */
  def decode(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real codecs initialize once per batch here
        batch.map(decodeStub)
      }
    }
  }

  /** Frame sampling: treat the payload as fixed-size frames, keep
    * every `every`-th frame with a per-frame checksum ("video" path;
    * explode-shaped output). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 64,
                   every: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val b = r.content
      val nFrames = (b.length + frameSize - 1) / frameSize
      (0 until nFrames).filter(_ % every == 0).map { f =>
        val start = f * frameSize
        val end = math.min(start + frameSize, b.length)
        var sum = 0L
        var i = start
        while (i < end) { sum += (b(i) & 0xff); i += 1 }
        Frame(r.doc_id, f.toLong, (end - start).toLong, sum % 256)
      }
    }
  }

  /** Oracle-checkable query: decoded stub features per doc. */
  def qMultimodalDecode(spark: SparkSession, dir: String): DataFrame =
    decode(mediaTable(spark, dir)).toDF().orderBy("doc_id")

  /** Oracle-checkable query: sampled frames per doc. */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir)).toDF().orderBy("doc_id", "frame_idx")

  /** Stub media EMBEDDING row — vec_id/embedding named so the frame
    * drops straight into the Similarity search surface. */
  case class MediaEmbedding(vec_id: Long, embedding: Array[Float])

  /** STUB embedding kernel: a 16-bin histogram of byte values mod 16.
    * Deterministic fake of a vision/audio encoder (swap for the real
    * model at deploy time, same batching); counts are INTEGERS stored
    * as floats, so both engines hold the embedding bit-exactly and
    * the downstream cosine algebra is the proven cross-engine kind. */
  private def embedStub(r: MediaRow): MediaEmbedding =
    MediaEmbedding(r.doc_id, byteHistogram(r))

  /** The stub's 16-bin feature extraction, shared by the bare stub
    * and the weights-as-table projection path. */
  private def byteHistogram(r: MediaRow): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < r.content.length) {
      hist((r.content(i) & 0xff) % 16) += 1f
      i += 1
    }
    hist
  }

  /** Batched embedding pass — the [[decode]] shape (per-batch model
    * setup amortized; GPU-batch-sized groups). */
  def embed(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real encoder loads weights / pins the accelerator once
        // per batch here
        batch.map(embedStub)
      }
    }
  }

  /** ENCODER weights as a TABLE — the entry point a real encoder
    * export rides in through (the classifierWeightsOf twin): a
    * (out_dim, in_dim, weight) long-format projection matrix, read
    * with the bounded model-collect convention (out·16 rows) into a
    * dense row-major matrix. Rows are dense: every (out, in) cell
    * 0..out−1 × 0..15 must be present exactly once. */
  def projectionOf(weights: DataFrame): Array[Array[Float]] = {
    val rows = weights.select(col("out_dim").cast("int"),
        col("in_dim").cast("int"), col("weight").cast("float"))
      .collect()
    require(rows.nonEmpty, "empty projection weights table")
    val outDim = rows.map(_.getInt(0)).max + 1
    require(rows.length == outDim * 16 &&
      rows.map(r => (r.getInt(0), r.getInt(1))).distinct.length == rows.length,
      s"projection must cover 0..${outDim - 1} x 0..15 exactly once")
    val m = Array.fill(outDim)(new Array[Float](16))
    rows.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getFloat(2))
    m
  }

  /** [[embed]] with the encoder's final projection supplied as data:
    * the SAME batched mapPartitions pass, the stub features pushed
    * through W·h. Swapping stub → trained encoder is exactly this
    * substitution — the plan (schema, partitioning, batch shape) is
    * unchanged, which is the whole point of the seam. */
  def embedWith(media: Dataset[MediaRow], projection: Array[Array[Float]],
                batchSize: Int = 64): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val h = byteHistogram(r)
          val out = new Array[Float](projection.length)
          var o = 0
          while (o < projection.length) {
            val row = projection(o)
            var i = 0
            var acc = 0f
            while (i < 16) { acc += row(i) * h(i); i += 1 }
            out(o) = acc
            o += 1
          }
          MediaEmbedding(r.doc_id, out)
        }
      }
    }
  }

  /** MULTIMODAL RETRIEVAL — media bytes → stub embeddings → the REAL
    * √n-cell IVF top-k search ([[Similarity.ivfSearch]], the
    * sim_ivf_scaled plan): the cross-family composition a multimodal
    * corpus runs, with only the encoder stubbed. Embedding is one
    * batched map-only pass; search adds exactly the one broadcast
    * probe join the gated search has. Corpus size comes from the
    * documents parquet footer — zero jobs at plan build. */
  def qMultimodalEmbedAnn(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val emb = embed(mediaTable(spark, dir)).toDF()
    Similarity.ivfSearch(emb, Similarity.scaledCentroids(n), nProbes = 2,
      sq8 = false)
  }
}
