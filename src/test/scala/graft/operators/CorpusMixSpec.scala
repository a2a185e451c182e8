package graft.operators

import graft.SparkSpec

class CorpusMixSpec extends SparkSpec {
  import spark.implicits._

  // Dense ids per source so the scramble's bucket distribution is exactly
  // uniform and kept counts hit the target ratios to the 0.01% resolution.
  private def corpus(perSource: Int, sources: Seq[String]) =
    sources.zipWithIndex.flatMap { case (s, si) =>
      (0 until perSource).map(i => (si.toLong * perSource + i, s))
    }.toDF("doc_id", "source")

  test("kept counts are proportional to target weights; top source keeps all") {
    val df = corpus(10000, Seq("web", "wiki", "code"))
    val kept = CorpusMix.resample(df, "doc_id", "source",
        Map("web" -> 1.0, "wiki" -> 0.5, "code" -> 0.25))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // equal input sizes → rates are exactly the weights; web keeps 100%
    assert(kept("web") == 10000L)
    assert(kept("wiki") == 5000L)
    assert(kept("code") == 2500L)
  }

  test("unlisted sources are dropped; resample is deterministic") {
    val df = corpus(1000, Seq("web", "junk"))
    val a = CorpusMix.resample(df, "doc_id", "source", Map("web" -> 1.0))
    assert(a.filter($"source" === "junk").count() == 0L)
    val ids1 = a.as[(Long, String)].collect().toSet
    val ids2 = CorpusMix.resample(df, "doc_id", "source", Map("web" -> 1.0))
      .as[(Long, String)].collect().toSet
    assert(ids1 == ids2 && ids1.nonEmpty)
  }

  test("unequal source sizes still hit the target mixture") {
    // web 4× larger than wiki but equal target weight → web downsampled to
    // wiki's kept volume
    val df = corpus(8000, Seq("web")).union(corpus(2000, Seq("wiki"))
      .withColumn("doc_id", org.apache.spark.sql.functions.col("doc_id") + 100000L))
    val kept = CorpusMix.resample(df, "doc_id", "source",
        Map("web" -> 1.0, "wiki" -> 1.0))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("wiki") == 2000L)            // rarer source keeps everything
    assert(math.abs(kept("web") - 2000L) <= 20L) // 0.01% bucket resolution
  }

  test("a NULL doc id fails the resample loudly instead of silently dropping") {
    val df = Seq((Some(1L), "web"), (None: Option[Long], "web"), (Some(2L), "wiki"))
      .toDF("doc_id", "source")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      CorpusMix.resample(df, "doc_id", "source", Map("web" -> 1.0, "wiki" -> 1.0)).count()
    }
    assert(msgs(e).exists(_.contains("contains NULLs")), msgs(e).mkString(" | "))
  }
}
