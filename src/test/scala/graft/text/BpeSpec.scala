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

  // the oracle discipline, in-test: apply the merges ONCE EACH in rank
  // order as string replaces over the '|t|' token representation — the
  // exact algebra the generated DuckDB replace-chain runs. For a
  // well-formed table this equals the priority loop.
  private def seqReplaceCount(word: String, merges: Seq[(String, String)]): Int = {
    var s = word.map(ch => s"|$ch|").mkString
    merges.foreach { case (l, r) => s = s.replace(s"|$l||$r|", s"|$l$r|") }
    s.count(_ == '|') / 2
  }

  private def assertWellFormed(merges: Seq[(String, String)]): Unit = {
    val produced = collection.mutable.Set.empty[String]
    merges.foreach { case (l, r) =>
      for (t <- Seq(l, r))
        assert(t.length == 1 || produced.contains(t),
          s"operand '$t' is neither a char nor an earlier merge product")
      val fused = l + r
      assert(!produced.contains(fused), s"duplicate product '$fused'")
      produced += fused
    }
  }

  test("parseMerges/renderMerges round-trip; headers skip; malformed lines fail") {
    val txt = "#version: 0.2\n\ne r\nin g\ner ing\n"
    val m = Bpe.parseMerges(txt)
    assert(m == IndexedSeq(("e", "r"), ("in", "g"), ("er", "ing")))
    assert(Bpe.parseMerges(Bpe.renderMerges(m)) == m)
    // the embedded table round-trips through the file format too
    assert(Bpe.parseMerges(Bpe.renderMerges(Bpe.merges)) == Bpe.merges.toIndexedSeq)
    intercept[IllegalArgumentException](Bpe.parseMerges("e r extra"))
    intercept[IllegalArgumentException](Bpe.parseMerges("lonetoken"))
  }

  test("train learns deterministic well-formed merges that fuse frequent words") {
    val wc = Seq(("data", 50L), ("table", 40L), ("datatable", 10L), ("rare", 1L))
    val m = Bpe.train(wc, numMerges = 20, minCount = 2L)
    assertWellFormed(m)
    val t = new BpeTable(m)
    assert(t.countWord("data") == 1)
    assert(t.countWord("table") == 1)
    // minCount floor: the count-1 word contributes no merges of its own
    assert(t.countWord("rare") > 1)
    // determinism: same input, same table
    assert(Bpe.train(wc, 20, 2L) == m)
  }

  test("a trained ≥1k-merge external table runs the native expression under the replace-chain oracle") {
    import spark.implicits._
    // synthetic corpus with deep pair structure: all two-syllable words
    // over 40 distinct CV-C syllables, each word count 2 (≥ minCount)
    val cons = "bcdfghjklmnpqrstvwxz"
    // (consonant, vowel) pairs are distinct, so all 40 syllables are too
    val syls = for (c1 <- 0 until 8; v <- 0 until 5)
      yield s"${cons(c1)}${"aeiou"(v)}${cons((c1 * 5 + v) % 20)}"
    val words = for (a <- syls; b <- syls if a != b) yield a + b
    val wc = words.map(w => (w, 2L))
    val merges = Bpe.train(wc, numMerges = 1200, minCount = 2L)
    assert(merges.length >= 1000, s"only ${merges.length} merges learned")
    assertWellFormed(merges)
    // priority loop ≡ rank-ordered sequential replace, across the whole
    // vocabulary and OOV probes — the well-formedness equivalence the
    // generated-oracle discipline rests on, at 1k+ merges
    val table = new BpeTable(merges)
    val probes = words.take(300) ++ Seq("zzzq", "aeiou", syls.head * 3,
      words.head + words.last)
    probes.foreach { w =>
      assert(table.countWord(w) == seqReplaceCount(w, merges),
        s"priority loop vs replace chain diverge on '$w'")
    }
    // the 2-arg native expression carries the external table through the
    // plan (addReferenceObj) and matches the same oracle algebra
    graft.functions.GraftFunctions.register(spark)
    val mergesTxt = Bpe.renderMerges(merges)
    val docs = probes.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        call_function("graft_bpe_count", col("text"), lit(mergesTxt)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    probes.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == seqReplaceCount(w, merges), s"expression on '$w'")
    }
    // and the external table actually CHANGES counts vs the default
    assert(table.countWord(words.head) == 1)
    assert(Bpe.countWord(words.head) > 1)
  }

  test("trainFromCorpus aggregates distributed and fuses the corpus' frequent words") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val m = Bpe.trainFromCorpus(docs, "text", numMerges = 128, maxVocab = 5000)
    // sf0.001's vocabulary dries up (best pair count < minCount) before
    // 128 merges — the early stop is the contract, not a shortfall
    assert(m.length >= 64 && m.length <= 128)
    assertWellFormed(m)
    // a table trained on the live corpus fuses at least as well as the
    // embedded 64-merge prefix on the corpus' own text
    val t = new BpeTable(m)
    val sample = docs.select("text").limit(20).collect().map(_.getString(0))
    val (trained, embedded) =
      (sample.map(t.countText).sum, sample.map(Bpe.countText).sum)
    assert(trained <= embedded, s"trained=$trained embedded=$embedded")
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

  test("bpe_train_count face: corpus-trained merges apply through the native counter") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.queries.Q.bpeTrainCount(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_bpe_trained") >= 1L)
      assert(r.getAs[Long]("n_bpe_default") >= 1L)
      assert(r.getAs[Long]("n_merges") >= 1L)
    }
    // training is deterministic: a second train+count run is identical
    val again = graft.queries.Q.bpeTrainCount(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    // the trained table differs from the default: corpus statistics drove it
    assert(out.exists(r => r.getAs[Long]("n_bpe_trained") !=
      r.getAs[Long]("n_bpe_default")))
  }
}
