package graft.text

import graft.SparkSpec

/** Round-9 collocation + winnowing operators: exact-count PMI on a corpus
  * with known statistics, a brute-force reimplementation of winnowing, and
  * the Schleimer et al. 2003 screening guarantee (any shared run of
  * ≥ w+k-1 tokens shares a fingerprint).
  */
class PmiWinnowSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000007L

  /** Reference winnow: gram hashes + leftmost-min-per-window picks. */
  private def bruteWinnow(text: String, k: Int = 4, w: Int = 4): Set[(Int, Long)] = {
    val ts = text.split(" ", -1)
    if (ts.length < k) return Set.empty
    val g = ts.sliding(k).map(_.foldLeft(0L) { (h, tok) =>
      (h * 131L + (tok.length.toLong * 7L +
        (if (tok.isEmpty) 0L else tok.head.toLong))) % M
    }).toArray
    val wl = math.min(w, g.length)
    (0 to g.length - wl).map { j =>
      val win = g.slice(j, j + wl)
      val mv = win.min
      (j + win.indexOf(mv) + 1, mv) // 1-based gram position
    }.toSet
  }

  test("pmi: exact counts and formula on a corpus with known statistics") {
    // "a b" ×6, "b a" ×5 (wrap pairs), "c d" ×5 in a second doc
    val d1 = (1 to 6).map(_ => "a b").mkString(" ") // a b a b ... 12 tokens
    val d2 = (1 to 5).flatMap(_ => Seq("c", "d")).mkString(" ")
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(df, "text", minCount = 5)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // corpus: 12 a/b tokens + 10 c/d tokens; N = 22
    val n = 22.0
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("c", "d")))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ab = out(("a", "b"))
    assert(ab._3 == 6L && ab._4 == 6L && ab._5 == 6L)
    assert(ab._6 == r6(math.log(6.0 * n / (6.0 * 6.0))))
    val cd = out(("c", "d"))
    assert(cd._3 == 5L && cd._4 == 5L && cd._5 == 5L)
    assert(cd._6 == r6(math.log(5.0 * n / (5.0 * 5.0))))
  }

  test("winnow: matches the brute-force reference on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bob", "c", "dd", "eee", "f", "gg", "h")
    val docs = (1L to 40L).map { i =>
      val n = 1 + rnd.nextInt(30)
      i -> (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._3.toInt, r._2)).toSet
      }
    val summary = TextAnalysis.withWinnow(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    docs.foreach { case (id, text) =>
      val expect = bruteWinnow(text)
      assert(got.getOrElse(id, Set.empty) == expect, s"doc $id")
      val (_, _, nf, digest) = summary(id)
      assert(nf == expect.size)
      val dg = expect.toSeq.map { case (p, h) => h * p }.sum % 1000000000000037L
      assert(digest == dg)
    }
  }

  test("native graft_winnow is BITWISE the staged SQL form, adversarial inputs included") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bob", "c", "dd", "eee", "ü2", "日本", "")
    val random = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(40)
      i -> (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val edges = Seq(
      100L -> "",                       // one empty token
      101L -> " ",                      // two empty tokens
      102L -> "   ",                    // all-space run
      103L -> "solo",                   // below k tokens
      104L -> "a b c",                  // k-1 tokens
      105L -> "a b c d",               // exactly k tokens: one gram
      106L -> "a  b   c d e",          // consecutive-space empties inline
      107L -> "a b c d e ",            // trailing empty token
      108L -> " a b c d e",            // leading empty token
      109L -> "ü ü ü ü ü ü",          // multibyte first bytes (signed ascii)
      110L -> "x x x x x x x x x x")   // identical grams: distinct-pick dedup
    val df = (random ++ edges).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .selectExpr("doc_id", "n_grams", "_f")
      .as[(Long, Long, Seq[Long])].collect().map(r => r._1 -> (r._2, r._3.toList)).toMap
    val native = rows(TextAnalysis.winnowPackedHook(df, "doc_id", "text", 4, 4))
    val sql = rows(TextAnalysis.winnowPackedSql(df, "doc_id", "text", 4, 4))
    assert(native.keySet == sql.keySet)
    native.keys.toSeq.sorted.foreach { id =>
      assert(native(id) == sql(id),
        s"doc $id: native=${native(id)} sql=${sql(id)}")
    }
    // and at a different geometry
    val n2 = rows(TextAnalysis.winnowPackedHook(df, "doc_id", "text", 2, 5))
    val s2 = rows(TextAnalysis.winnowPackedSql(df, "doc_id", "text", 2, 5))
    assert(n2 == s2)
  }

  test("winnow: a shared >= w+k-1 token run always shares a fingerprint") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("x1", "y22", "z", "w4", "v55", "u6")
    val shared = (1 to 7).map(_ => vocab(rnd.nextInt(vocab.size))) // w+k-1 = 7
    def pad(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
    val a = (pad(11) ++ shared ++ pad(3)).mkString(" ")
    val b = (pad(2) ++ shared ++ pad(17)).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    val ha = fp.filter(_._1 == 1L).map(_._2).toSet
    val hb = fp.filter(_._1 == 2L).map(_._2).toSet
    assert((ha intersect hb).nonEmpty)
  }

  test("winnowPairs: a copied passage is caught with brute-force-exact counts") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector("kilo", "lima", "mike", "nov", "osc", "papa", "queb", "rom")
    def pad(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
    val passage = (1 to 40).map(_ => vocab(rnd.nextInt(vocab.size)))
    val a = (pad(15) ++ passage ++ pad(10)).mkString(" ")
    val b = (pad(5) ++ passage ++ pad(25)).mkString(" ")
    val c = pad(60).mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = TextAnalysis.winnowPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.contains((1L, 2L)))
    // brute-force distinct-hash sets reproduce n_shared/n_a/n_b/overlap
    val hs = Map(1L -> a, 2L -> b, 3L -> c).map { case (id, t) =>
      id -> bruteWinnow(t).map(_._2)
    }
    val freq = hs.values.flatten.groupBy(identity).map { case (h, o) => h -> o.size }
    val eligible = freq.filter { case (_, n) => n >= 2 && n <= 100 }.keySet
    val shared = (hs(1L) intersect hs(2L)) intersect eligible
    val (_, _, nShared, nA, nB, overlap) = out((1L, 2L))
    assert(nShared == shared.size && nShared >= 2)
    assert(nA == hs(1L).size && nB == hs(2L).size)
    assert(overlap == shared.size.toDouble / (nA + nB - shared.size).toDouble)
    // pairs that share < 2 eligible hashes never surface
    out.keys.foreach { case (x, y) =>
      val s = (hs(x) intersect hs(y)) intersect eligible
      assert(s.size >= 2)
    }
  }
}
