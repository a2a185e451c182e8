package graft.text

import graft.SparkSpec

/** Planted vocabularies must separate into distinct clusters whose top
  * terms come from their own vocabulary. */
class TopicsSpec extends SparkSpec {
  import spark.implicits._

  test("two planted vocabularies split cleanly and label themselves") {
    val fruit = Seq("apple banana cherry apple", "banana cherry apple banana",
      "cherry apple banana cherry", "apple apple banana cherry")
    val metal = Seq("iron copper zinc iron", "copper zinc iron copper",
      "zinc iron copper zinc", "iron zinc copper iron")
    val docs = (fruit ++ metal).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Topics.mine(docs, "doc_id", "text", dim = 16, k = 2,
        iters = 4, topTerms = 3)
      .as[(Int, Long, String)].collect()
    assert(out.length == 2)
    assert(out.map(_._2).sum == 8L)
    val labels = out.map(_._3)
    val fruitLabel = labels.find(_.contains("apple"))
    val metalLabel = labels.find(_.contains("iron"))
    assert(fruitLabel.isDefined && metalLabel.isDefined)
    // no vocabulary bleeds into the other cluster's label
    assert(!fruitLabel.get.split(" ").exists(Set("iron", "copper", "zinc")))
    assert(!metalLabel.get.split(" ").exists(Set("apple", "banana", "cherry")))
  }

  test("deterministic across invocations") {
    val docs = (1L to 30L)
      .map(i => (i, if (i % 2 == 0) s"alpha beta gamma d$i" else s"delta epsilon zeta d$i"))
      .toDF("doc_id", "text")
    val a = Topics.mine(docs, "doc_id", "text", dim = 16, k = 2, iters = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Topics.mine(docs, "doc_id", "text", dim = 16, k = 2, iters = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
