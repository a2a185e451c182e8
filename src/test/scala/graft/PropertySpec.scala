package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized cross-checks of the distributed algorithms against
  * sequential Scala references. Iteration counts stay small — every case
  * runs real Spark jobs — but the generators roam sizes, partition counts,
  * and missingness patterns that hand-written cases miss. */
class PropertySpec extends SparkSpec {

  private def passes(label: String, prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, s"$label: $res")
  }

  test("packing offsets equal the sequential cumsum for arbitrary corpora") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.choose(0L, 50L))
      parts <- Gen.choose(1, 9)
      budget <- Gen.choose(1, 64)
    } yield (toks, parts, budget)
    val prop = Prop.forAllNoShrink(gen) { case (toks, parts, budget) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "n")
      val got = graft.text.Packing.packWindows(df, "doc_id", col("n"), budget, parts)
        .orderBy("doc_id").select("tok_start").as[Long].collect().toSeq
      val expect = toks.scanLeft(0L)(_ + _).init
      got == expect
    }
    passes("packing", prop, 8)
  }

  test("knn impute equals brute force for random frames") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(5, 40)
      xs <- Gen.listOfN(n, Gen.choose(0, 20))            // duplicate-heavy xs
      miss <- Gen.listOfN(n, Gen.prob(0.3))
      k <- Gen.choose(1, 4)
      parts <- Gen.choose(1, 7)
    } yield (xs, miss, k, parts)
    val prop = Prop.forAllNoShrink(gen) { case (xs, miss, k, parts) =>
      val rows = xs.zip(miss).zipWithIndex.map { case ((x, m), i) =>
        (i.toLong, x.toDouble, if (m) None else Some((x * 13 % 7).toDouble + 0.25))
      }
      if (rows.forall(_._3.isEmpty)) true
      else {
        val obs = rows.collect { case (id, x, Some(y)) => (id, x, math.round(y * 100)) }
        val expect = rows.collect { case (mid, mx, None) =>
          val nn = obs.sortBy { case (oid, ox, _) => (math.abs(ox - mx), ox, oid) }.take(k)
          mid -> math.round(nn.map(_._3).sum.toDouble / nn.size).toDouble / 100.0
        }.toMap
        val got = graft.imputer.KnnImpute.impute1d(
            rows.toDF("id", "x", "y"), "id", col("x"), "y", "y_imp", k,
            numPartitions = parts)
          .filter(col("y_imp").isNotNull).as[(Long, Double)].collect().toMap
        expect.forall { case (id, v) => got(id) == v }
      }
    }
    passes("knn", prop, 6)
  }

  test("markov transitions equal the sequential per-user pair count") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 60)
      users <- Gen.listOfN(n, Gen.choose(0L, 5L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 20L))          // tie-heavy times
      types <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield users.indices.map(i => (users(i), ts(i), i.toLong, types(i)))
    val prop = Prop.forAllNoShrink(gen) { rows =>
      val got = graft.analytics.Analytics.markovTransitions(
          rows.toDF("user_id", "t", "event_id", "event_type"))
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
          case Seq(a, b) => (a, b)
        }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val totals = expect.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
      got.keySet == expect.keySet && expect.forall { case (k, n) =>
        got(k) == ((n, n.toDouble / totals(k._1).toDouble))
      }
    }
    passes("markov", prop, 8)
  }

  test("stickiness equals the brute-force 7-day window distinct count") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 50)
      pairs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 15L)))
    } yield pairs.distinct
    val prop = Prop.forAllNoShrink(gen) { pairs =>
      val got = graft.analytics.Analytics.stickiness(pairs.toDF("user_id", "d"))
        .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
      val days = pairs.map(_._2).distinct
      days.forall { d =>
        val dau = pairs.count(_._2 == d).toLong
        val wau = pairs.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.size.toLong
        got(d) == ((d, dau, wau, dau.toDouble / wau.toDouble))
      } && got.size == days.size
    }
    passes("stickiness", prop, 8)
  }

  test("zValue matches a sequential bit-interleave for arbitrary keys") {
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.zip(Gen.choose(0L, (1L << 21) - 1), Gen.choose(0L, (1L << 21) - 1)))
    val prop = Prop.forAllNoShrink(gen) { pairs =>
      val got = pairs.toDF("a", "b")
        .select(graft.sources.Sources.zValue(col("a"), col("b")).as("z"))
        .as[Long].collect().toSeq
      val expect = pairs.map { case (a, b) =>
        (0 until 21).foldLeft(0L) { (acc, i) =>
          acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
        }
      }
      got == expect
    }
    passes("zvalue", prop, 6)
  }

  test("chunking reassembles every document losslessly") {
    import spark.implicits._
    val word = Gen.choose('a', 'e').map(_.toString)
    val gen = for {
      n <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, word)
      size <- Gen.choose(1, 17)
    } yield (ws.mkString(" "), size)
    val prop = Prop.forAllNoShrink(gen) { case (text, size) =>
      val df = Seq((0L, text)).toDF("doc_id", "text")
      val chunks = graft.text.TextAnalysis.chunk(df, "doc_id", "text", size)
        .orderBy("chunk_id").select("chunk_text").as[String].collect()
      chunks.mkString(" ") == text
    }
    passes("chunk", prop, 10)
  }

  test("merge equals the sequential fold for random key-unique change batches") {
    import spark.implicits._
    val gen = for {
      nSnap <- Gen.choose(0, 12)
      snap <- Gen.listOfN(nSnap, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 99)))
      nCh <- Gen.choose(0, 10)
      ch <- Gen.listOfN(nCh, Gen.zip(Gen.choose(0L, 15L),
        Gen.oneOf("U", "D"), Gen.choose(100, 199)))
    } yield (snap.distinctBy(_._1), ch.distinctBy(_._1))
    val prop = Prop.forAllNoShrink(gen) { case (snap, ch) =>
      val snapDf = snap.map { case (k, v) => (k, v.toDouble) }.toDF("id", "bal")
      val chDf = ch.map { case (k, op, v) => (k, op, v.toDouble) }.toDF("id", "op", "bal")
      val got = graft.operators.MergeUpsert.merge(snapDf, chDf, "id")
        .select("id", "bal", "op").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1).toSeq
      // sequential reference fold
      val m = scala.collection.mutable.Map(snap.map { case (k, v) =>
        k -> (v.toDouble, "K")
      }: _*)
      ch.foreach {
        case (k, "D", _) => m.remove(k)
        case (k, "U", v) =>
          m.put(k, (v.toDouble, if (m.contains(k)) "U" else "I"))
        case _ => ()
      }
      got == m.toSeq.map { case (k, (v, op)) => (k, v, op) }.sortBy(_._1)
    }
    passes("merge", prop, 10)
  }

  test("shuffledShards is a bijection for arbitrary sparse ids and shard counts") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      ids <- Gen.listOfN(n, Gen.choose(0L, 100000L)).map(_.distinct)
      shards <- Gen.choose(1, 9)
    } yield (ids, shards)
    val prop = Prop.forAllNoShrink(gen) { case (ids, shards) =>
      val out = graft.operators.Sampling.shuffledShards(ids.toDF("id"), "id", shards)
        .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
      val allPresent = out.map(_._1).sorted.toSeq == ids.sorted
      val shardsInRange = out.forall(r => r._2 >= 0 && r._2 < shards)
      val densePositions = out.groupBy(_._2).values.forall { rs =>
        rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq
      }
      allPresent && shardsInRange && densePositions
    }
    passes("shards", prop, 10)
  }

  test("scalarChecks agree with sequential violation counting") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.choose(-50, 150))
      lo <- Gen.choose(-20, 20)
      hi <- Gen.choose(50, 120)
    } yield (xs, lo, hi)
    val prop = Prop.forAllNoShrink(gen) { case (xs, lo, hi) =>
      if (xs.isEmpty) true
      else {
        val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
        val out = graft.operators.DataQuality.scalarChecks(df, Seq(
            "range" -> !col("x").between(lo, hi),
            "neg" -> (col("x") < 0)))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        out("range") == ((xs.length.toLong, xs.count(x => x < lo || x > hi).toLong)) &&
          out("neg") == ((xs.length.toLong, xs.count(_ < 0).toLong))
      }
    }
    passes("dq", prop, 10)
  }

  test("ffillThenBfill equals the sequential fill for arbitrary frames") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      vals <- Gen.listOfN(n, Gen.option(Gen.choose(-50, 50)))
      strs <- Gen.listOfN(n, Gen.option(Gen.oneOf("a", "b", "c")))
      parts <- Gen.choose(1, 9)
      // non-contiguous, unordered-insert keys: ids get multiplied and offset
      // so bucket boundaries fall between keys unpredictably
      stride <- Gen.choose(1, 13)
    } yield (vals, strs, parts, stride)
    val prop = Prop.forAllNoShrink(gen) { case (vals, strs, parts, stride) =>
      val rows = vals.zip(strs).zipWithIndex.map { case ((v, sOpt), i) =>
        (i.toLong * stride + 7, v.map(_.toDouble), sOpt)
      }
      val df = rows.toDF("id", "x", "s").repartition(parts)
      val got = graft.imputer.FfillBfill
        .ffillThenBfill(df, "id", Seq("x", "s"), parts)
        .orderBy("id").as[(Long, Option[Double], Option[String])].collect().toSeq
      // sequential reference: ffill then bfill over the id-sorted rows
      def fill[A](xs: Seq[Option[A]]): Seq[Option[A]] = {
        val ff = xs.scanLeft(Option.empty[A])((c, v) => v.orElse(c)).tail
        ff.scanRight(Option.empty[A])((v, c) => v.orElse(c)).init
      }
      val sorted = rows.sortBy(_._1)
      val expect = sorted.map(_._1)
        .lazyZip(fill(sorted.map(_._2))).lazyZip(fill(sorted.map(_._3)))
        .map((a, b, c) => (a, b, c)).toSeq
      got == expect
    }
    passes("ffill_bfill", prop, 10)
  }
}
