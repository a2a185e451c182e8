package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (1L, base, "s1"),
      (2L, base, "s1"), // exact dup of 1
      (3L, base.replace("today", "tomorrow"), "s1"), // near dup of 1
      (4L, "completely different text about spark query engines and shuffles maybe", "s1"),
      (5L, "another unrelated document with its own words entirely separate here now", "s2")
    ).toDF("doc_id", "text", "source")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val g = Dedup.exact(docs, "doc_id", "text")
    assert(g.count() == 4)
    val dup = g.filter(col("n_copies") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 1L)
  }

  test("jaccard pairs find exact and near duplicates, not unrelated docs") {
    val p = Dedup.jaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)))
    assert(p.contains((1L, 3L)) && p.contains((2L, 3L)))
    assert(!p.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("prefix-filter jaccard pairs equal brute-force all-pairs exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
      "sigma", "tau", "upsilon")
    def randDoc(): Array[String] =
      Array.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
    val bases = Vector.fill(60)(randDoc())
    // 60 random docs + 60 mutations of them → pairs across the whole
    // similarity range, including some sitting right at the threshold
    val rows = bases.zipWithIndex.map { case (d, i) => (i + 1L, d.mkString(" "), s"s${i % 3}") } ++
      bases.zipWithIndex.map { case (d, i) =>
        val m = d.clone()
        (0 until (1 + rnd.nextInt(4))).foreach { _ =>
          m(rnd.nextInt(m.length)) = vocab(rnd.nextInt(vocab.size))
        }
        (i + 61L, m.mkString(" "), s"s${i % 3}")
      }
    val d = rows.toDF("doc_id", "text", "source")
    val t = 0.25
    def pairSet(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fast = pairSet(Dedup.jaccardPairs(d, "doc_id", "text", "source", n = 3, threshold = t))
    val sh = d.select(col("doc_id").as("id"), col("source").as("block"),
      Dedup.shingleHashes(col("text"), 3).as("sh")).filter(size(col("sh")) > 0)
    val brute = pairSet(
      sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
        .join(sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b")), Seq("block"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("jaccard", Dedup.jaccardHashed(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard"))
    assert(brute.nonEmpty, "test corpus produced no qualifying pairs")
    assert(fast == brute)
  }

  test("containment sees a quoted subset document that jaccard misses") {
    import spark.implicits._
    // doc 2 is doc 1's opening quarter verbatim: containment(2→1) = 1.0
    // while jaccard is ~0.25 — the asymmetric signal this operator exists for
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, long, "s1"), (2L, short, "s1"),
      (3L, "unrelated words entirely different from the others here", "s1"))
      .toDF("doc_id", "text", "source")
    val c = Dedup.containmentPairs(d, "doc_id", "text", "source", n = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(c.toSeq == Seq((2L, 1L, 1.0)), s"got ${c.toSeq}")
    val j = Dedup.jaccardPairs(d, "doc_id", "text", "source", n = 2, threshold = 0.9)
    assert(j.count() == 0, "jaccard at the same threshold must miss the subset pair")
  }

  test("prefix-filter containment pairs equal brute-force all-pairs exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
      "sigma", "tau", "upsilon")
    def randDoc(len: Int): Array[String] =
      Array.fill(len)(vocab(rnd.nextInt(vocab.size)))
    val bases = Vector.fill(50)(randDoc(10 + rnd.nextInt(25)))
    // random docs + random SLICES of them (the subset regime) + mutations —
    // pairs across the containment range, including threshold-boundary ones
    val rows = bases.zipWithIndex.map { case (d, i) => (i + 1L, d.mkString(" "), s"s${i % 3}") } ++
      bases.zipWithIndex.map { case (d, i) =>
        val from = rnd.nextInt(d.length / 2)
        val slice = d.slice(from, from + 4 + rnd.nextInt(d.length - from))
        (i + 51L, slice.mkString(" "), s"s${i % 3}")
      } ++
      bases.zipWithIndex.map { case (d, i) =>
        val m = d.clone()
        (0 until (1 + rnd.nextInt(5))).foreach { _ =>
          m(rnd.nextInt(m.length)) = vocab(rnd.nextInt(vocab.size))
        }
        (i + 101L, m.mkString(" "), s"s${i % 3}")
      }
    val d = rows.toDF("doc_id", "text", "source")
    val t = 0.3
    def pairSet(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fast = pairSet(Dedup.containmentPairs(d, "doc_id", "text", "source", n = 2, threshold = t))
    val sh = d.select(col("doc_id").as("id"), col("source").as("block"),
      Dedup.shingleHashes(col("text"), 2).as("sh")).filter(size(col("sh")) > 0)
    val brute = pairSet(
      sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
        .join(sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b")), Seq("block"))
        .filter(size(col("sh_a")) < size(col("sh_b")) ||
          (size(col("sh_a")) === size(col("sh_b")) && col("id_a") < col("id_b")))
        .withColumn("containment",
          org.apache.spark.sql.functions.call_function(
            "graft_sorted_intersect_size_l", col("sh_a"), col("sh_b"))
            .cast("bigint").cast("double") / size(col("sh_a")).cast("bigint"))
        .filter(col("containment") >= t)
        .select("id_a", "id_b", "containment"))
    assert(brute.nonEmpty, "test corpus produced no qualifying pairs")
    assert(fast == brute)
  }

  test("minhash finds the same near-dups as exact jaccard at its threshold") {
    val got = MinHash.pairs(docs, "doc_id", "text", n = 3, k = 32, bands = 16, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact duplicate pair must always collide in every band
    assert(got.contains((1L, 2L)))
    // verified jaccard filter keeps it a subset of the exact pairs
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact + ((4L, 5L))))
  }

  test("connected components: chains, blobs, and singletons get min-id labels") {
    import spark.implicits._
    // component {1,2,3,4} as a chain (diameter 3), blob {10,11,12} as a
    // triangle, {20} isolated
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(verts, "doc_id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("connected components: a 200-node chain converges via path halving") {
    import spark.implicits._
    // pure HashMin would need ~200 rounds; path halving needs O(log n).
    // smallGraphEdges=0 FORCES the distributed loop (the default would take
    // the driver union-find shortcut on a graph this small).
    val n = 200L
    val verts = (1L to n).toDF("doc_id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(verts, "doc_id", edges, "id_a", "id_b",
        maxIter = 15, smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length == n)
    assert(cc.forall(_._2 == 1L))
  }

  test("connected components: union-find shortcut equals the distributed loop") {
    import spark.implicits._
    // random graphs roam chain/blob/singleton mixes; both paths must agree
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val verts = (1L to n.toLong).toDF("doc_id")
      val edges = (1 to n).flatMap { _ =>
        val a = 1L + rnd.nextInt(n)
        val b = 1L + rnd.nextInt(n)
        if (a != b) Some((math.min(a, b), math.max(a, b))) else None
      }.toDF("id_a", "id_b")
      val fast = Dedup.connectedComponents(verts, "doc_id", edges, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(verts, "doc_id", edges, "id_a", "id_b",
          smallGraphEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist)
    }
  }

  test("substringSpans catches a planted 200-token span with exact offsets") {
    import spark.implicits._
    // two documents that agree ONLY on a 200-token span planted at
    // different offsets; all other tokens come from disjoint alphabets so
    // no coincidental 8-shingle can match
    val span = (0 until 200).map(i => s"s$i")
    val docA = ((0 until 100).map(i => s"a$i") ++ span ++ (0 until 50).map(i => s"x$i")).mkString(" ")
    val docB = ((0 until 37).map(i => s"b$i") ++ span ++ (0 until 80).map(i => s"y$i")).mkString(" ")
    val d = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(d, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect()
    assert(spans.length == 1, s"got ${spans.toSeq}")
    val r = spans.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("start_a") == 100L, s"start_a ${r.getAs[Long]("start_a")}")
    assert(r.getAs[Long]("start_b") == 37L, s"start_b ${r.getAs[Long]("start_b")}")
    assert(r.getAs[Long]("span_tokens") == 200L, s"span ${r.getAs[Long]("span_tokens")}")
    // the Jaccard face at a typical threshold does NOT see this pair
    // (200 shared tokens over ~350/320-token docs ≈ 0.4 overlap of distinct
    // 3-shingle sets is below a 0.5 dedup threshold), and containment at
    // 0.9 misses it too — the span detector is not redundant with either
    val j = Dedup.jaccardPairs(d.withColumn("src", lit("s")), "doc_id", "text", "src",
      n = 3, threshold = 0.75).collect()
    assert(j.isEmpty, s"jaccard unexpectedly caught it: ${j.toSeq}")
  }

  test("stripSpans removes the planted span from the higher id only, keeper untouched") {
    import spark.implicits._
    val span = (0 until 200).map(i => s"s$i")
    val aHead = (0 until 100).map(i => s"a$i"); val aTail = (0 until 50).map(i => s"x$i")
    val bHead = (0 until 37).map(i => s"b$i");  val bTail = (0 until 80).map(i => s"y$i")
    val docA = (aHead ++ span ++ aTail).mkString(" ")
    val docB = (bHead ++ span ++ bTail).mkString(" ")
    // doc 3 is the span VERBATIM — stripped to nothing (keep-first-copy:
    // doc 1 carries the surviving copy); doc 4 matches nothing
    val d = Seq((1L, docA), (2L, docB), (3L, span.mkString(" ")),
      (4L, (0 until 60).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.stripSpans(d, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_tokens_kept"),
          r.getAs[String]("cleaned_text"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "every document keeps a row")
    // doc 1 (lowest id carrying the span) is UNTOUCHED
    assert(out(1L) == (350L, 350L, docA))
    // doc 2 loses exactly the 200-token span, head and tail survive in order
    assert(out(2L)._1 == 317L && out(2L)._2 == 117L)
    assert(out(2L)._3 == (bHead ++ bTail).mkString(" "))
    // doc 3 strips to nothing but keeps its row
    assert(out(3L) == (200L, 0L, ""))
    // doc 4 untouched — cleaned_text equals the ORIGINAL text
    assert(out(4L)._2 == 60L &&
      out(4L)._3 == (0 until 60).map(i => s"z$i").mkString(" "))
  }

  test("stripSpans leaves exactly one copy of every duplicated span corpus-wide") {
    import spark.implicits._
    // three docs all sharing one span (a chain 1<2<3): doc 1 keeps it,
    // docs 2 and 3 both strip it — one surviving copy
    val span = (0 until 40).map(i => s"s$i")
    def doc(prefix: String, n: Int) = ((0 until n).map(i => s"$prefix$i") ++ span).mkString(" ")
    val d = Seq((1L, doc("a", 10)), (2L, doc("b", 20)), (3L, doc("c", 30)))
      .toDF("doc_id", "text")
    val out = Dedup.stripSpans(d, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("cleaned_text")).toMap
    val survivors = out.values.count(t => t.contains("s0 s1"))
    assert(survivors == 1, s"expected exactly one surviving span copy: $out")
    assert(out(2L) == (0 until 20).map(i => s"b$i").mkString(" "))
    assert(out(3L) == (0 until 30).map(i => s"c$i").mkString(" "))
  }

  test("substringSpans finds nothing below the span floor and merges runs maximally") {
    import spark.implicits._
    // 19 shared tokens < minSpanTokens=20 → no output; exactly 20 → one span
    val shared19 = (0 until 19).map(i => s"c$i")
    val shared20 = (0 until 20).map(i => s"d$i")
    val d = Seq(
      (1L, ((0 until 30).map(i => s"p$i") ++ shared19).mkString(" ")),
      (2L, (shared19 ++ (0 until 30).map(i => s"q$i")).mkString(" ")),
      (3L, ((0 until 11).map(i => s"u$i") ++ shared20).mkString(" ")),
      (4L, (shared20 ++ (0 until 7).map(i => s"v$i")).mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(d, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect()
    assert(spans.length == 1, s"got ${spans.toSeq}")
    val r = spans.head
    assert((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) == ((3L, 4L)))
    // maximal merge: 13 consecutive shingle hits collapse to ONE 20-token span
    assert(r.getAs[Long]("start_a") == 11L && r.getAs[Long]("start_b") == 0L)
    assert(r.getAs[Long]("span_tokens") == 20L)
  }

  test("substringSpans equals brute-force maximal shared runs on random corpora") {
    import spark.implicits._
    // tiny vocabulary → coincidental shared runs, periodic repeats, and
    // adjacent/overlapping diagonals arise naturally — the shapes the
    // corpus oracle can't systematically produce
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e")
    val k = 4
    val minSpan = 6
    def bruteSpans(a: Array[String], b: Array[String]): Set[(Long, Long, Long)] = {
      val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      for (g <- -(b.length - 1) to (a.length - 1)) {
        var i = math.max(0, g)
        var run = 0
        var start = 0
        def flush(): Unit = {
          if (run >= minSpan) out += ((start.toLong, (start - g).toLong, run.toLong))
          run = 0
        }
        while (i < a.length && i - g < b.length) {
          if (a(i) == b(i - g)) { if (run == 0) start = i; run += 1 }
          else flush()
          i += 1
        }
        flush()
      }
      out.toSet
    }
    for (trial <- 1 to 3) {
      val base = (1L to 10L).map { id =>
        id -> Array.fill(25 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      }
      // plant a literal shared span between two random docs so every trial
      // has at least one guaranteed long run
      val span = Array.fill(10)(vocab(rnd.nextInt(vocab.size)))
      val docs = base.map { case (id, t) =>
        if (id <= 2L) (id, (t.take(5) ++ span ++ t.drop(5)).mkString(" "))
        else (id, t.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.substringSpans(df, "doc_id", "text", k = k, minSpanTokens = minSpan)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("start_a"), r.getAs[Long]("start_b"),
          r.getAs[Long]("span_tokens"))).toSet
      val toks = docs.map { case (id, t) => id -> t.split(" ") }.toMap
      val expect = (for {
        ia <- docs.map(_._1); ib <- docs.map(_._1) if ia < ib
        (sa, sb, len) <- bruteSpans(toks(ia), toks(ib))
      } yield (ia, ib, sa, sb, len)).toSet
      assert(got == expect,
        s"trial $trial: got ${got.size} spans, expected ${expect.size}; " +
          s"diff ${(got diff expect) ++ (expect diff got)}")
      assert(expect.nonEmpty, s"trial $trial produced no spans — test is vacuous")
    }
  }

  test("selfSpans catches a pasted block and periodic stutter with exact offsets") {
    import spark.implicits._
    val block = (0 until 30).map(i => s"s$i")
    // doc 1: a 30-token block pasted at offsets 10 and 55 (15 unique
    // tokens between the copies)
    val doc1 = ((0 until 10).map(i => s"a$i") ++ block ++
      (0 until 15).map(i => s"b$i") ++ block ++ (0 until 5).map(i => s"c$i")).mkString(" ")
    // doc 2: period-3 stutter "p0 p1 p2" × 10 (30 tokens) inside unique filler
    val doc2 = ((0 until 8).map(i => s"u$i") ++
      Seq.fill(10)(Seq("p0", "p1", "p2")).flatten ++
      (0 until 8).map(i => s"v$i")).mkString(" ")
    // doc 3: no repetition
    val doc3 = (0 until 60).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
    val got = Dedup.selfSpans(d, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_a"),
        r.getAs[Long]("start_b"), r.getAs[Long]("span_tokens"))).toSet
    // doc 1: the pasted block — one span, offsets 10 and 55, 30 tokens
    assert(got.contains((1L, 10L, 55L, 30L)), s"pasted block missing: $got")
    // doc 2: period-3 repetition = a 27-token overlapping self-match on
    // diagonal g=3 (tokens 8..34 match tokens 11..37); diagonals 6 and 9
    // give the shorter harmonics 24 and 21
    assert(got.contains((2L, 8L, 11L, 27L)), s"periodic span missing: $got")
    assert(got.contains((2L, 8L, 14L, 24L)) && got.contains((2L, 8L, 17L, 21L)),
      s"periodic harmonics missing: $got")
    // doc 3 contributes nothing
    assert(!got.exists(_._1 == 3L), s"false positive on unique doc: $got")
  }

  test("selfSpans equals brute-force within-doc maximal runs on random text") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val vocab = Vector("a", "b", "c", "d")
    val k = 4
    val minSpan = 6
    def brute(t: Array[String]): Set[(Long, Long, Long)] = {
      val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      for (g <- 1 until t.length) {
        var i = 0
        var run = 0
        var start = 0
        def flush(): Unit = {
          if (run >= minSpan) out += ((start.toLong, (start + g).toLong, run.toLong))
          run = 0
        }
        while (i + g < t.length) {
          if (t(i) == t(i + g)) { if (run == 0) start = i; run += 1 }
          else flush()
          i += 1
        }
        flush()
      }
      out.toSet
    }
    val docs = (1L to 8L).map(id =>
      id -> Array.fill(30 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))))
    val df = docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
    val got = Dedup.selfSpans(df, "doc_id", "text", k = k, minSpanTokens = minSpan)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_a"),
        r.getAs[Long]("start_b"), r.getAs[Long]("span_tokens"))).toSet
    val expect = (for {
      (id, t) <- docs
      (sa, sb, len) <- brute(t)
    } yield (id, sa, sb, len)).toSet
    assert(got == expect, s"diff ${(got diff expect) ++ (expect diff got)}")
    assert(expect.nonEmpty, "vacuous trial — no self-runs arose")
  }

  test("removeSelfSpans strips later copies, keeps the first, unique docs untouched") {
    import spark.implicits._
    val block = (0 until 30).map(i => s"s$i")
    val doc1 = ((0 until 10).map(i => s"a$i") ++ block ++
      (0 until 15).map(i => s"b$i") ++ block ++ (0 until 5).map(i => s"c$i")).mkString(" ")
    val doc3 = (0 until 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, doc1), (3L, doc3)).toDF("doc_id", "text")
    val spans = Dedup.selfSpans(d, "doc_id", "text", k = 8, minSpanTokens = 20)
    val cleaned = Dedup.removeSelfSpans(d, spans, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // doc 1: the SECOND block copy (tokens 55..84) is cut, first copy stays
    val expect1 = ((0 until 10).map(i => s"a$i") ++ block ++
      (0 until 15).map(i => s"b$i") ++ (0 until 5).map(i => s"c$i")).mkString(" ")
    assert(cleaned(1L) == expect1, s"got ${cleaned(1L)}")
    assert(cleaned(3L) == doc3, "unique doc must pass through untouched")
    // idempotence: a second pass finds nothing left to cut
    val d2 = cleaned.toSeq.toDF("doc_id", "text")
    assert(Dedup.selfSpans(d2, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect().isEmpty)
  }

  test("removeSpans cuts the duplicated span from the higher-id doc only") {
    import spark.implicits._
    val span = (0 until 40).map(i => s"s$i")
    val aTail = (0 until 9).map(i => s"x$i")
    val docA = ((0 until 15).map(i => s"a$i") ++ span ++ aTail).mkString(" ")
    val docB = ((0 until 8).map(i => s"b$i") ++ span ++ (0 until 12).map(i => s"y$i")).mkString(" ")
    val d = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(d, "doc_id", "text", k = 8, minSpanTokens = 20)
    val cleaned = Dedup.removeSpans(d, spans, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(cleaned(1L) == docA, "lower id must keep its copy")
    val expectB = ((0 until 8).map(i => s"b$i") ++ (0 until 12).map(i => s"y$i")).mkString(" ")
    assert(cleaned(2L) == expectB, s"got ${cleaned(2L)}")
    // after removal the corpus carries no span ≥ 20 tokens
    val d2 = Seq((1L, cleaned(1L)), (2L, cleaned(2L))).toDF("doc_id", "text")
    assert(Dedup.substringSpans(d2, "doc_id", "text", k = 8, minSpanTokens = 20)
      .collect().isEmpty)
  }

  test("persisted labels: stats-from-labels equals stats-from-lineage, keep-one works") {
    val sf = "/root/testdata/sf0.001"
    val live = graft.queries.Q.dedupCluster(spark, sf)
      .select(col("doc_id").as("id"), col("cluster_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_labels").toString
    Dedup.writeClusterLabels(live, dir)
    val persisted = graft.sources.Sources.parquet(spark, dir)
    def statMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters")).toMap
    // ≡ the lineage-composed face the driver checks (dedup_stats)
    assert(statMap(Dedup.statsFromLabels(persisted)) ==
      statMap(graft.queries.Q.dedupStats(spark, sf)))
    // keep-one: one survivor per cluster, and it is the min member id
    val docs = graft.Tables(spark, sf, "documents")
    val kept = Dedup.keepOnePerCluster(docs, "doc_id", persisted)
    assert(kept.count() == persisted.select("cluster_id").distinct().count())
    val minIds = persisted.groupBy("cluster_id")
      .agg(org.apache.spark.sql.functions.min("id").as("m"))
      .collect().map(_.getAs[Long]("m")).toSet
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == minIds)
  }

  test("simhash: identical docs at hamming 0, unrelated docs far apart") {
    val p = SimHash.pairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)))
    assert(!p.contains((4L, 5L)))
  }

  test("simhash fingerprint is deterministic") {
    import spark.implicits._
    val fp1 = docs.select(SimHash.simhash64(split(col("text"), " "), 42L)).collect()
    val fp2 = docs.select(SimHash.simhash64(split(col("text"), " "), 42L)).collect()
    assert(fp1.toSeq == fp2.toSeq)
  }
}
