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

  test("resized re-encodes every payload to the target shape with fresh metadata") {
    val bin = Multimodal.asBinaryTable(docs, "doc_id", "text").repartition(2)
    val r = Multimodal.resized(bin.select("doc_id", "payload"), StubDecoder, 8, 4)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getAs[Int]("width") == 8))
    assert(r.forall(_.getAs[Int]("height") == 4))
    assert(r.forall(_.getAs[Long]("n_bytes") == 32L))
    // sequential recompute of the stub resample
    val expect = StubDecoder.resize("hello world".getBytes("UTF-8"), 8, 4).toSeq
    assert(r(0).getAs[Array[Byte]]("payload").toSeq == expect)
  }

  test("sampleFrames explodes every Nth fixed-size frame executor-side") {
    import spark.implicits._
    val payload = (0 until 2500).map(i => (i % 251).toByte).toArray
    val bin = Seq((7L, payload)).toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.sampleFrames(bin, StubDecoder, frameBytes = 1000, everyN = 2)
      .orderBy("frame_no").collect()
    // 3 frames of (1000, 1000, 500) bytes; every 2nd → frames 0 and 2
    assert(out.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 2))
    assert(out(0).getAs[Array[Byte]]("frame_payload").length == 1000)
    assert(out(1).getAs[Array[Byte]]("frame_payload").length == 500)
    assert(out(0).getAs[Array[Byte]]("frame_payload").toSeq == payload.take(1000).toSeq)
    assert(out.forall(_.getAs[String]("frame_digest").length == 64))
  }

  test("perceptual hash: identical payloads collide, small edits stay near, pairs complete") {
    import graft.multimodal.{Multimodal, StubDecoder}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Array.tabulate(500)(i => (i * 37 % 251).toByte)
    val nearDup = base.clone(); nearDup(3) = 99; nearDup(400) = 7
    val far = Array.tabulate(500)(i => (255 - i % 17 * 15).toByte)
    val df = Seq((1L, base), (2L, base.clone()), (3L, nearDup), (4L, far))
      .toDF("doc_id", "payload")
    val hashed = Multimodal.withPerceptualHash(df, StubDecoder)
      .select("doc_id", "phash")
    val fp = hashed.as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L), "identical payloads must share the hash")
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <= 8,
      "a 2-byte edit must stay within the hamming budget")
    // pigeonhole candidates = brute-force hamming pairs at the budget
    val got = graft.dedup.SimHash
      .pairsFromFingerprints(hashed, "doc_id", "phash", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ids = fp.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(fp(a) ^ fp(b)) <= 8
    } yield (a, b)).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)))
  }

  test("mm_resize and mm_frames query faces return deterministic rows") {
    val r1 = graft.queries.Q.mmResize(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val r2 = graft.queries.Q.mmResize(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(r1 == r2 && r1.nonEmpty)
    val f = graft.queries.Q.mmFrames(spark, "/root/testdata/sf0.001")
      .collect()
    assert(f.nonEmpty)
    assert(f.forall(r => r.getLong(1) >= r.getLong(2))) // frames >= distinct frames
  }
}
