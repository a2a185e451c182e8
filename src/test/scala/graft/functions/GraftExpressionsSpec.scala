package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native expressions must agree exactly with the built-in
  * formulations they replace — including bitwise double equality for the
  * dot product (same sequential accumulation). */
class GraftExpressionsSpec extends SparkSpec {

  test("graft_dot is bitwise-identical to the zip_with/aggregate fold") {
    // built from spark.range so the expressions run through WholeStageCodegen
    // (a LocalRelation would be folded and evaluated interpreted, hiding
    // codegen-only bugs like uninitialized accumulators)
    val df = spark.range(1, 51).select(
      transform(sequence(lit(0), lit(15)), d => sin(col("id") * 17 + d) * 3.7).as("a"),
      transform(sequence(lit(0), lit(15)), d => cos(col("id") * 31 + d) * 1.3).as("b"))
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == want.toSeq) // == on Double is bitwise here (no NaN)
  }

  test("graft_dot: equal empties give 0.0, mixed dimensions fail loudly") {
    import spark.implicits._
    val ok = Seq((Seq.empty[Double], Seq.empty[Double]), (Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(ok.toSeq == Seq(0.0, 11.0))
    // min-length truncation would return a silently-wrong similarity for a
    // malformed vector; the guard throws through BOTH eval paths
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val bad = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
    assert(msgs(e).exists(_.contains("mixed vector dimensions")), msgs(e).mkString(" | "))
  }

  test("graft_sorted_intersect_size matches array_intersect on sorted distinct arrays") {
    // spark.range source → codegen path (see note above)
    val df = spark.range(1, 41).select(
      sort_array(array_distinct(transform(sequence(lit(0), lit(19)),
        j => concat(lit("w"), (col("id") * 7 + j * 3) % 25)))).as("a"),
      sort_array(array_distinct(transform(sequence(lit(0), lit(19)),
        j => concat(lit("w"), (col("id") * 11 + j * 5) % 25)))).as("b"))
    val got = df.select(call_function("graft_sorted_intersect_size", col("a"), col("b")))
      .collect().map(_.getInt(0))
    val want = df.select(size(array_intersect(col("a"), col("b")))).collect().map(_.getInt(0))
    assert(got.toSeq == want.toSeq)
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("graft_deflate_len matches java.util.zip through the codegen path") {
    // spark.range source → WholeStageCodegen; texts roam repetitive,
    // prose-like, unicode, and empty shapes
    val df = spark.range(0, 40).select(
      when(col("id") % 4 === 0, concat_ws(" ",
          transform(sequence(lit(0), lit(50)), _ => lit("spam"))))
        .when(col("id") % 4 === 1,
          concat(lit("the quick brown fox jumps over doc "), col("id")))
        .when(col("id") % 4 === 2, concat(lit("héllo wörld ünïcode "), col("id")))
        .otherwise(lit("")).as("text"))
    val rows = df.select(col("text"),
      call_function("graft_deflate_len", col("text")).as("n")).collect()
    rows.foreach { r =>
      val expect = DeflateLenExpr.deflatedLen(r.getString(0).getBytes("UTF-8"))
      assert(r.getInt(1) == expect, s"text=${r.getString(0).take(30)}")
    }
    // repetitive text compresses far below natural prose
    val byKind = rows.map(r => (r.getString(0), r.getInt(1)))
    val spam = byKind.filter(_._1.startsWith("spam")).head
    val prose = byKind.filter(_._1.startsWith("the quick")).head
    assert(spam._2.toDouble / spam._1.getBytes("UTF-8").length <
      prose._2.toDouble / prose._1.getBytes("UTF-8").length)
  }

  test("graft_deflate_len: null yields null, non-string is rejected") {
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("t")
    assert(df.select(call_function("graft_deflate_len", col("t"))).collect()(0).isNullAt(0))
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(call_function("graft_deflate_len", col("x"))).collect()
    }
    assert(bad.getMessage.contains("graft_deflate_len"))
  }
}

/** Parity + argument-validation specs for round-3 native expressions. */
class ShingleTopKSpec extends SparkSpec {

  test("graft_shingle_hashes is bitwise-identical to the composed split/concat_ws/xxhash64 form") {
    // synthesize texts with repeated words (duplicate shingles), multiple
    // and trailing spaces, short docs (< n tokens), and empty strings —
    // from spark.range so both paths run codegen'd where possible
    val df = spark.range(0, 200).selectExpr(
      """CASE
         | WHEN id % 13 = 0 THEN ''
         | WHEN id % 13 = 1 THEN 'one'
         | WHEN id % 13 = 2 THEN 'one two'
         | WHEN id % 13 = 3 THEN 'a  b c' -- double space → empty token
         | WHEN id % 13 = 4 THEN 'a b c '
         | ELSE concat_ws(' ', transform(sequence(0, CAST(id % 37 AS INT)),
         |                     j -> concat('w', pmod(id * 7 + j * 3, 11))))
         |END AS text""".stripMargin)
    val native = df.select(call_function("graft_shingle_hashes", col("text"), lit(3)))
      .collect().map(_.getSeq[Long](0))
    val composed = df.selectExpr(
      """CASE WHEN size(split(text, ' ')) < 3 THEN array()
         |ELSE sort_array(array_distinct(transform(
         |  sequence(0, size(split(text, ' ')) - 3),
         |  i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i + 1, 3))))))
         |END""".stripMargin)
      .collect().map(_.getSeq[Long](0))
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (a, b) => assert(a == b) }
  }

  test("graft_shingle_hashes: null text yields null, short text yields empty array") {
    import spark.implicits._
    val df = Seq(Some("a b"), None).toDF("text")
    val rows = df.select(call_function("graft_shingle_hashes", col("text"), lit(3))).collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("graft_topk matches the row_number window formulation exactly (ties included)") {
    import org.apache.spark.sql.expressions.Window
    // scores with deliberate ties: pmod produces repeated values
    val sims = spark.range(0, 5000).selectExpr(
      "CAST(id % 7 AS BIGINT) AS query_id",
      "id AS neighbor_id",
      "CAST(pmod(id * 31, 97) AS DOUBLE) / 97.0 AS cos")
    val got = graft.similarity.AnnLsh.topK(sims, 5)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = sims.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))).cast("bigint"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("graft_topk ranks NaN scores first (descending-sort order) and never wedges on them") {
    import org.apache.spark.sql.expressions.Window
    // NaN arrives FIRST so it lands in the heap while it fills — a naive <
    // comparator would make the NaN root reject every later candidate
    val sims = spark.range(0, 200).selectExpr(
      "CAST(0 AS BIGINT) AS query_id",
      "id AS neighbor_id",
      "CASE WHEN id = 0 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id AS DOUBLE) / 200.0 END AS cos")
    val got = graft.similarity.AnnLsh.topK(sims, 4).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val want = sims.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))).cast("bigint"))
      .filter(col("rank") <= 4).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
    assert(got.head._1 == 0L) // the NaN row ranks first, like the window
  }

  test("graft_topk with fewer candidates than k returns all, ranked") {
    val sims = spark.range(0, 3).selectExpr(
      "CAST(0 AS BIGINT) AS query_id", "id AS neighbor_id", "CAST(id AS DOUBLE) AS cos")
    val got = graft.similarity.AnnLsh.topK(sims, 10).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 1L), (1L, 2L), (0L, 3L)))
  }

  test("non-literal k/seed arguments raise a clear analysis error, not an opaque NPE") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), 4)).toDF("sh", "k")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_minhash", col("sh"), col("k"), lit(42L))).collect()
    }
    assert(e1.getMessage.contains("graft_minhash"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_topk", lit(1.0), lit(1L), col("k"))).collect()
    }
    assert(e2.getMessage.contains("graft_topk"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("a b c d", 2)).toDF("t", "n")
        .select(call_function("graft_shingle_hashes", col("t"), col("n"))).collect()
    }
    assert(e3.getMessage.contains("graft_shingle_hashes"))
  }

  test("graft_argmin_sqdist is bitwise-identical to the k-literal tree past the 64KB codegen wall") {
    // k = 300 literal centroids × dim 64 is PAST the point where the old
    // expression tree blew Janino's 64 KB method limit (caught live by the
    // r16 TwoLevelIvf 256-cell run) — the tree still EXECUTES there via
    // Spark's interpreted fallback, so it remains a valid oracle; the
    // native loop must match it assignment-for-assignment while staying
    // inside codegen at any k
    val k = 300
    val dim = 64
    val centroids = Array.tabulate(k, dim)((j, i) =>
      math.sin(j * 131 + i * 17) * 2.5)
    // spark.range keeps the probe column non-foldable (codegen path runs)
    val df = spark.range(1, 201).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => sin(col("id") * 13 + d) * 3.1).as("v"))
      .localCheckpoint()
    def treeArgmin(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val dists = array(centroids.map { c =>
        val dotc = call_function("graft_dot", v, lit(c))
        val selfd = call_function("graft_dot", v, v)
        selfd - lit(2.0) * dotc + lit(c.map(x => x * x).sum)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    val native = org.apache.spark.sql.graft.ColumnBridge.column(
      ArgminSqDistExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("v")), centroids))
    val got = df.select(col("id"), native.as("c")).orderBy("id")
      .collect().map(_.getInt(1)).toSeq
    val want = df.select(col("id"), treeArgmin(col("v")).as("c")).orderBy("id")
      .collect().map(_.getInt(1)).toSeq
    assert(got == want)
    assert(got.distinct.size > 1) // the assignment actually discriminates
  }

  test("graft_top_lists matches BOTH rank formulations it replaces, bitwise") {
    import spark.implicits._
    val k = 40
    val dim = 16
    val assign = 4
    val centroids = Array.tabulate(k, dim)((j, i) => math.cos(j * 37 + i * 11) * 1.9)
    val df = spark.range(1, 101).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => sin(col("id") * 7 + d) * 2.2).as("v"))
      .localCheckpoint()
    val cf = broadcast(centroids.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toSeq, c.map(x => x * x).sum)
    }.toSeq.toDF("list", "cv", "cc"))
    def native(cosine: Boolean) = df.select(col("id"),
      explode(org.apache.spark.sql.graft.ColumnBridge.column(
        TopListsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(col("v")),
          centroids, assign, cosineScore = cosine))).as("list"))
      .orderBy("id", "list").as[(Long, Long)].collect().toSeq
    // (a) the unit-L2 graft_topk aggregate formulation (AnnIvf.selfPairs)
    val topkForm = df.join(cf, lit(true))
      .select(col("id"),
        (lit(2.0) * VectorFunctions.dot(col("v"), col("cv"))
          - VectorFunctions.dot(col("v"), col("v")) - col("cc")).as("_s"),
        col("list"))
      .groupBy("id")
      .agg(call_function("graft_topk", col("_s"), col("list"), lit(assign)).as("_tk"))
      .select(col("id"), explode(col("_tk")).as("_e"))
      .select(col("id"), col("_e.id").as("list"))
      .orderBy("id", "list").as[(Long, Long)].collect().toSeq
    assert(native(cosine = false) == topkForm)
    // (b) the cosine row_number window formulation (the index probe paths)
    import org.apache.spark.sql.expressions.Window
    val windowForm = df.join(cf, lit(true))
      .select(col("id"), col("list"),
        VectorFunctions.cosine(col("v"), col("cv")).as("_cs"))
      .withColumn("_pr", row_number().over(
        Window.partitionBy("id").orderBy(desc("_cs"), asc("list"))))
      .filter(col("_pr") <= assign)
      .select("id", "list")
      .orderBy("id", "list").as[(Long, Long)].collect().toSeq
    assert(native(cosine = true) == windowForm)
  }

  test("graft_top_lists: duplicate-centroid ties go to the lower index; k clamps nowhere (require)") {
    import spark.implicits._
    val cs = Array(Array(3.0, 3.0), Array(1.0, 0.0), Array(1.0, 0.0))
    val df = Seq(Tuple1(Seq(2.0, 0.0))).toDF("v")
    val got = df.select(org.apache.spark.sql.graft.ColumnBridge.column(
        TopListsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(col("v")),
          cs, 2, cosineScore = false)))
      .collect().head.getSeq[Long](0)
    // both copies of (1,0) beat (3,3) for (2,0); the FIRST copy ranks first
    assert(got == Seq(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      TopListsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(col("v")),
        cs, 4, cosineScore = false)
    }
    assert(e.getMessage.contains("k in [1, 3]"))
  }

  test("graft_argmin_sqdist: first-min tie-break, dim mismatch fails loudly") {
    import spark.implicits._
    // two identical centroids: the FIRST index must win (array_position rule)
    val cs = Array(Array(1.0, 0.0), Array(5.0, 5.0), Array(1.0, 0.0))
    val df = Seq(Tuple1(Seq(1.0, 0.0)), Tuple1(Seq(4.0, 4.0))).toDF("v")
    val native = org.apache.spark.sql.graft.ColumnBridge.column(
      ArgminSqDistExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("v")), cs))
    assert(df.select(native).collect().map(_.getInt(0)).toSeq == Seq(0, 1))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("v").select(native).collect()
    }
    assert(msgs(e).exists(_.contains("mixed vector dimensions")), msgs(e).mkString(" | "))
  }
}
