package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, "spark multimodal pipeline"), (3L, ""))
      .toDF("doc_id", "text")
  }

  test("asBinaryTable carries payload bytes + typed metadata") {
    val b = Multimodal.asBinaryTable(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(b(0).getAs[Array[Byte]]("payload").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(b(0).getAs[Long]("n_bytes") == 11L)
    assert(b(0).getAs[String]("digest").length == 64)
  }

  test("decodeFeatures adds deterministic feature vectors partition-parallel") {
    val bin = Multimodal.asBinaryTable(docs, "doc_id", "text").repartition(3)
    val f1 = Multimodal.decodeFeatures(bin, StubDecoder, 8)
      .orderBy("doc_id").select("features", "width", "height").collect()
    val f2 = Multimodal.decodeFeatures(bin, StubDecoder, 8)
      .orderBy("doc_id").select("features", "width", "height").collect()
    assert(f1.toSeq == f2.toSeq)
    val fv = f1(0).getSeq[Float](0)
    assert(fv.length == 8)
    assert(math.abs(fv.sum - 1.0f) < 1e-5) // histogram normalized by length
  }

  test("empty payload decodes without error") {
    val bin = Multimodal.asBinaryTable(docs.filter(col("doc_id") === 3), "doc_id", "text")
    val f = Multimodal.decodeFeatures(bin, StubDecoder, 4).collect()
    assert(f.length == 1)
    assert(f(0).getSeq[Float](f(0).fieldIndex("features")).forall(_ == 0f))
  }
}
