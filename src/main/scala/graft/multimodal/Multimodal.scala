package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs partition-
  * parallel over the bytes.
  *
  * The actual codecs (image/audio/video) are NOT available in this
  * environment, so [[MediaDecoder]] is a pluggable trait with a
  * deterministic stub implementation — the Spark-side plumbing (schema,
  * batching, partition parallelism, metadata propagation) is real and
  * tested; swapping in a JNI/codec-backed decoder changes no query code.
  */
trait MediaDecoder extends Serializable {
  /** Decode a payload into a fixed-length feature vector. */
  def features(payload: Array[Byte], dims: Int): Array[Float]
  /** Extract (width, height) style shape metadata. */
  def shape(payload: Array[Byte]): (Int, Int)
  /** Re-encode the payload at a target shape (image-resize face). */
  def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  /** Split a (video-style) payload into per-frame payloads. */
  def frameSplit(payload: Array[Byte], frameBytes: Int): Seq[Array[Byte]]
}

/** Deterministic stand-in for a real codec: features are a byte-histogram
  * projection, shape derives from payload length. Stable across runs so
  * downstream operators (dedup, ANN) are testable. */
object StubDecoder extends MediaDecoder {
  def features(payload: Array[Byte], dims: Int): Array[Float] = {
    val acc = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      acc(java.lang.Byte.toUnsignedInt(payload(i)) % dims) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    acc.map(_ / n)
  }
  def shape(payload: Array[Byte]): (Int, Int) =
    (payload.length % 640, payload.length / 640 + 1)
  /** Nearest-neighbor index resample of the byte stream to w·h bytes —
    * deterministic, shape-exact, codec-free. */
  def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(w * h, 1))
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }
  def frameSplit(payload: Array[Byte], frameBytes: Int): Seq[Array[Byte]] =
    payload.grouped(math.max(frameBytes, 1)).toSeq
}

object Multimodal {

  /** Wrap a text/bytes column as a media payload with typed metadata:
    * (id, payload binary, n_bytes, digest). */
  def asBinaryTable(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(col(idCol),
      encode(col(contentCol), "UTF-8").as("payload"),
      octet_length(col(contentCol)).cast("bigint").as("n_bytes"),
      sha2(col(contentCol), 256).as("digest"))

  /** Partition-parallel resize: payload → re-encoded payload at (w, h) +
    * updated metadata. Same mapPartitions tier as [[decodeFeatures]] — a
    * codec call per row inside the partition, nothing on the driver. */
  def resized(df: DataFrame, decoder: MediaDecoder, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    // regenerate EVERY payload-derived column: carrying the input's
    // n_bytes/width/height would duplicate the fresh ones (ambiguous
    // references downstream), and a carried digest would describe the
    // pre-resize bytes — it is recomputed from the resized payload below
    val stale = Set("payload", "n_bytes", "width", "height", "digest")
    val keep = df.schema.fields.filterNot(f => stale.contains(f.name))
    val schema = StructType(keep ++ Array(
      StructField("payload", BinaryType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_bytes", LongType)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name))
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val res = decoder.resize(row.getAs[Array[Byte]](payloadIdx), w, h)
        Row.fromSeq(keepIdx.toIndexedSeq.map(row.get) ++ Seq(res, w, h, res.length.toLong))
      }
    }
    spark.createDataFrame(rdd, schema)
      .withColumn("digest", sha2(col("payload"), 256))
  }

  /** Frame sampling (video face): split each payload into fixed-size
    * frames inside the partition, keep every `everyN`-th, and EXPLODE to
    * one row per kept frame — the fan-out happens executor-side with
    * nothing resident beyond one payload's frames at a time. Output:
    * input columns (minus payload) + (frame_no, frame_payload,
    * frame_digest). */
  def sampleFrames(df: DataFrame, decoder: MediaDecoder,
                   frameBytes: Int, everyN: Int): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    val spark = df.sparkSession
    val keep = df.schema.fields.filterNot(_.name == "payload")
    val schema = StructType(keep ++ Array(
      StructField("frame_no", IntegerType),
      StructField("frame_payload", BinaryType)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name))
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val frames = decoder.frameSplit(row.getAs[Array[Byte]](payloadIdx), frameBytes)
        frames.iterator.zipWithIndex
          .filter { case (_, i) => i % everyN == 0 }
          .map { case (f, i) =>
            Row.fromSeq(keepIdx.toIndexedSeq.map(row.get) ++ Seq(i, f))
          }
      }
    }
    spark.createDataFrame(rdd, schema)
      .withColumn("frame_digest", sha2(col("frame_payload"), 256))
  }

  /** 64-bit perceptual hash (average-hash): the decoder resamples each
    * payload to an 8×8 grid (64 bytes) and each bit is that cell vs the
    * grid mean — the standard aHash, built on the SAME pluggable decoder
    * as the other multimodal faces (a real image decoder slots in with no
    * query change). Same mapPartitions tier as [[decodeFeatures]]: one
    * codec call per row inside the partition. Output: input columns +
    * `phash` (bigint). Near-dup pairs then come from
    * [[graft.dedup.SimHash.pairsFromFingerprints]] — the multimodal
    * NEAR-dup face beside mm_dedup's exact-digest grouping. */
  def withPerceptualHash(df: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField("phash", LongType))
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val g = decoder.resize(row.getAs[Array[Byte]](payloadIdx), 8, 8)
        var sum = 0L
        var i = 0
        while (i < 64) { sum += java.lang.Byte.toUnsignedInt(g(i)); i += 1 }
        val mean = sum / 64L
        var h = 0L
        i = 0
        while (i < 64) {
          if (java.lang.Byte.toUnsignedInt(g(i)) > mean) h |= (1L << i)
          i += 1
        }
        Row.fromSeq(row.toSeq :+ h)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partition-parallel decode: payload → feature vector + shape metadata.
    * This is the `mapInPandas`-shaped stage: batches flow through the
    * decoder inside each partition; no data concentrates on the driver. */
  def decodeFeatures(df: DataFrame, decoder: MediaDecoder, dims: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields ++ Array(
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("width", IntegerType), StructField("height", IntegerType)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val fv = decoder.features(payload, dims)
        val (w, h) = decoder.shape(payload)
        Row.fromSeq(row.toSeq ++ Seq(fv.toIndexedSeq, w, h))
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
