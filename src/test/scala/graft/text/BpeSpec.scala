package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** True-BPE token counting: the embedded merge table, its divergence from
  * the regex approximation, and the budgeted faces that consume it. */
class BpeSpec extends SparkSpec {

  test("countWord applies merges to fusion; unknown words fall back to chars") {
    // frequent corpus words fuse to a single token under the trained table
    for (w <- Seq("join", "hash", "batch", "column", "merge", "order", "table"))
      assert(Bpe.countWord(w) == 1, s"'$w' should fuse to one token")
    // the table is truncated below full fusion: rarer corpus words keep
    // real subword structure (pinned against the offline trainer)
    assert(Bpe.countWord("query") == 4) // q·u·er·y
    assert(Bpe.countWord("spark") == 3) // s·par·k
    assert(Bpe.countWord("the") == 3)   // t·h·e — rare in this corpus
    // an out-of-vocabulary word splits into subword tokens: fewer than its
    // characters (shared merges fire) but more than one (never seen whole)
    val c = Bpe.countWord("sparkling") // s·par·k·l·in·g
    assert(c == 6, s"sparkling -> $c tokens")
    // a word over a disjoint alphabet gets no merges at all — one per char
    assert(Bpe.countWord("zzzq") == 4)
    assert(Bpe.countWord("") == 0)
    assert(Bpe.countWord("a") == 1)
  }

  test("countText: words + one token per non-space non-alpha char") {
    assert(Bpe.countText("") == 0)
    assert(Bpe.countText("   ") == 0)
    assert(Bpe.countText("join hash") == 2)
    // digits and punctuation count one token EACH (byte-fallback), unlike
    // the regex face which counts a digit RUN as one pseudo-token
    assert(Bpe.countText("join 1234 hash!") == 2 + 4 + 1)
  }

  test("merge table is well-formed: operands are chars or earlier products") {
    val produced = collection.mutable.Set.empty[String]
    Bpe.merges.foreach { case (l, r) =>
      for (t <- Seq(l, r))
        assert(t.length == 1 || produced.contains(t),
          s"operand '$t' is neither a char nor an earlier merge product")
      val fused = l + r
      assert(!produced.contains(fused), s"duplicate product '$fused'")
      produced += fused
    }
  }

  test("the native expression matches the scala helper and diverges from the regex face") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick spark query"),
      (2L, "seventeen 42 tokens, maybe more!"),
      (3L, "zzzq qqzz")
    ).toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    val got = docs.select(col("doc_id"),
        call_function("graft_bpe_count", col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.collect().foreach { r =>
      assert(got(r.getLong(0)) == Bpe.countText(r.getString(1)),
        s"expression vs helper on doc ${r.getLong(0)}")
    }
    // divergence pin: on '42' the regex face counts 1 run, BPE counts 2
    // chars; on an in-vocab sentence the two agree word-for-word
    assert(Bpe.countText("42") == 2)
    assert(got(2L) > 5, "digit chars and punctuation must each count")
  }

  test("sf corpus: BPE and regex faces agree on direction but not value") {
    val rows = graft.queries.Q.textTokensBpe(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // the truncated table leaves some words multi-token and the corpus is
    // pure lowercase words, so BPE counts dominate the regex face per doc
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bpe") >= r.getAs[Long]("n_bpeish"))
      assert(r.getAs[Long]("n_bpe") > 0)
    }
    assert(rows.exists(r => r.getAs[Long]("n_bpe") != r.getAs[Long]("n_bpeish")),
      "faces never diverge — the BPE face is redundant")
  }

  test("packWindows consumes BPE counts: budgets shrink vs whitespace counts") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val ws = Packing.packWindows(docs, "doc_id",
      size(split(col("text"), " ")).cast("bigint"), budget = 512)
    val bpe = Packing.packWindows(docs, "doc_id",
      call_function("graft_bpe_count", col("text")).cast("bigint"), budget = 512)
    val wsTotal = ws.agg(max(col("tok_start") + col("n_tokens"))).collect().head.getLong(0)
    val bpeTotal = bpe.agg(max(col("tok_start") + col("n_tokens"))).collect().head.getLong(0)
    // same corpus, different tokenizer: totals differ, both faces pack it
    assert(wsTotal != bpeTotal, "BPE face changed nothing")
    assert(bpe.count() == docs.count())
  }

  test("chunkBudgeted packs greedily under a BPE budget with exact costs") {
    import spark.implicits._
    val d = Seq((1L, "join hash batch column merge 42!")).toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    // per-token BPE costs: the five fused words cost 1 each; "42!" costs 3
    val chunks = Packing.chunkBudgeted(d, "doc_id", "text", budget = 3,
      t => call_function("graft_bpe_count", t))
      .orderBy("chunk_id").collect()
    // greedy: [join hash batch]=3, [column merge]=2 (42! would overflow), [42!]=3
    assert(chunks.length == 3, s"got ${chunks.toSeq}")
    assert(chunks.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("join hash batch", "column merge", "42!"))
    assert(chunks.map(_.getAs[Long]("n_chunk_cost")).toSeq == Seq(3L, 2L, 3L))
    // an over-budget single token still lands in its own chunk
    val big = Seq((1L, "the 123456 the")).toDF("doc_id", "text")
    val c2 = Packing.chunkBudgeted(big, "doc_id", "text", budget = 2,
      t => call_function("graft_bpe_count", t)).orderBy("chunk_id").collect()
    assert(c2.map(_.getAs[String]("chunk_text")).toSeq == Seq("the", "123456", "the"))
    // concatenating chunks in order restores the document
    assert(c2.map(_.getAs[String]("chunk_text")).mkString(" ") == "the 123456 the")
  }
}
