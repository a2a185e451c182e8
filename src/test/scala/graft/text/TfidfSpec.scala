package graft.text

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopK scores with smoothed idf and ranks per doc") {
    val df = Seq(
      (0L, "cat cat dog"),
      (1L, "dog fish"),
      (2L, "cat bird bird bird")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(df, "doc_id", "text", 2)
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._4).toSeq).toMap

    def idf(dfreq: Int): Double = math.log((1.0 + 3.0) / (1.0 + dfreq)) + 1.0
    // doc 0: cat tf=2 df=2, dog tf=1 df=2 → cat wins
    val d0 = out(0L)
    assert(d0.head._2 == "cat" && d0.head._4 == 2.0 * idf(2))
    assert(d0(1)._2 == "dog" && d0(1)._4 == 1.0 * idf(2))
    // doc 2: bird tf=3 df=1 beats cat tf=1 df=2
    val d2 = out(2L)
    assert(d2.head._2 == "bird" && d2.head._4 == 3.0 * idf(1))
    // k=2 bound respected everywhere
    assert(out.values.forall(_.size <= 2))
  }

  test("tfidf ties break alphabetically by term") {
    val df = Seq((0L, "b a"), (1L, "x")).toDF("doc_id", "text")
    // in doc 0, a and b both have tf=1 df=1 → identical tfidf; top-1 is "a"
    val top1 = TextAnalysis.tfidfTopK(df, "doc_id", "text", 1)
      .filter($"doc_id" === 0L).as[(Long, String, Long, Double)].collect()
    assert(top1.head._2 == "a")
  }

  test("heap-aggregate top-k is row-identical to the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the sf corpus plus tie-heavy and multibyte-term docs: the aggregate's
    // UTF8-binary (score desc, term asc) order must match the window's
    val extra = Seq((900L, "tie tie tee tee toe toe"), (901L, "ü2 ü2 zz aa"),
      (902L, "one"))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").unionByName(extra)
    val k = 5
    val viaAgg = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k)
      .as[(Long, String, Long, Double)].collect().toSet
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    val viaWindow = TextAnalysis.tfidfScored(docs, "doc_id", "text")
      .withColumn("_rk", row_number().over(w)).filter($"_rk" <= k)
      .select($"doc_id", $"term", $"tf", $"tfidf")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }
}
