package graft.text

import graft.SparkSpec

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunking reassembles exactly and the last chunk is ragged") {
    val words = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((0L, words), (1L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, "doc_id", "text", 4)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    val d0 = out.filter(_._1 == 0L)
    assert(d0.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d0.map(_._4).toSeq == Seq(4L, 4L, 2L))
    assert(d0.map(_._3).mkString(" ") == words)       // lossless reassembly
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 1 && d1.head._3 == "solo" && d1.head._4 == 1L)
  }
}
