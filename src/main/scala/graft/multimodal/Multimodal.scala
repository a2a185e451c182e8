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
}

object Multimodal {

  /** Wrap a text/bytes column as a media payload with typed metadata:
    * (id, payload binary, n_bytes, digest). */
  def asBinaryTable(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(col(idCol),
      encode(col(contentCol), "UTF-8").as("payload"),
      octet_length(col(contentCol)).cast("bigint").as("n_bytes"),
      sha2(col(contentCol), 256).as("digest"))

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
