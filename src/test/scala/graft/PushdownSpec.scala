package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-level evidence that Catalyst's two free 100 TB optimizations reach
  * the parquet leaves of the registered plans:
  *
  *  - COLUMN PRUNING: a query touching 3 of lineitem's 16 columns must
  *    present a 3-column ReadSchema to the scan — reading 16 means ~5×
  *    the I/O at 100 TB for identical results.
  *  - PREDICATE PUSHDOWN: a selective filter must appear in the scan's
  *    PushedFilters so parquet row-group statistics can skip data, not
  *    just rows post-read.
  *
  * PlanLintSpec bans the scale-killing OPERATORS; this spec pins the
  * scale-critical SCAN properties on representative queries, so a refactor
  * that silently breaks pruning (e.g. routing a frame through an opaque
  * UDF or RDD before its first projection) fails a spec, not a 100 TB run.
  */
class PushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** All parquet scans of `relation` (by path substring) in the plan. */
  private def scansOf(df: DataFrame, relation: String): Seq[FileSourceScanExec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FileSourceScanExec]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(relation)) =>
          out += f
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  private def readColumns(s: FileSourceScanExec): Set[String] =
    s.requiredSchema.fieldNames.toSet

  test("q6_filter prunes lineitem to its 3 used columns and pushes both predicates") {
    val scans = scansOf(SparkEntry.queries("q6_filter")(spark, sf), "lineitem")
    assert(scans.nonEmpty, "no lineitem scan found")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("l_discount", "l_quantity", "l_extendedprice"),
      s"expected exactly the 3 q6 columns at the scan, got $cols")
    // both selective predicates must reach parquet (row-group skipping)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    for (c <- Seq("l_discount", "l_quantity"))
      assert(pushed.contains(c), s"filter on $c not pushed to the scan: $pushed")
  }

  test("q1_agg prunes lineitem to the 5 aggregation columns") {
    val scans = scansOf(SparkEntry.queries("q1_agg")(spark, sf), "lineitem")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount"),
      s"q1 reads only its 5 agg columns, got $cols")
  }

  test("imp_ffill_bfill's Catalyst rewrite keeps 3-column pruning through the fill") {
    // the r5->r6 rewrite's headline win: the RDD version forced every
    // source column through the scan; the pure-Catalyst fill must keep
    // exactly (order key, 2 value columns) — this is the regression tripwire
    val scans = scansOf(SparkEntry.queries("imp_ffill_bfill")(spark, sf), "customer")
    assert(scans.nonEmpty, "no customer scan found")
    scans.foreach { s =>
      val cols = readColumns(s)
      assert(cols.size <= 3,
        s"fill must scan only orderCol+valueCols, got $cols")
    }
  }

  test("ann_topk prunes embeddings to id + vector") {
    val scans = scansOf(SparkEntry.queries("ann_topk")(spark, sf), "embeddings")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols.subsetOf(Set("vec_id", "embedding")),
      s"ann_topk needs only (vec_id, embedding), got $cols")
  }

  test("text_quality prunes documents to id + text") {
    val scans = scansOf(SparkEntry.queries("text_quality")(spark, sf), "documents")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols.subsetOf(Set("doc_id", "text")),
      s"text_quality needs only (doc_id, text), got $cols")
  }

  test("orders_pareto prunes orders to custkey + totalprice") {
    val scans = scansOf(SparkEntry.queries("orders_pareto")(spark, sf), "orders")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("o_custkey", "o_totalprice"),
      s"pareto needs only (o_custkey, o_totalprice), got $cols")
  }

  test("orders_seasonality prunes orders to orderdate + totalprice") {
    val scans = scansOf(SparkEntry.queries("orders_seasonality")(spark, sf), "orders")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("o_orderdate", "o_totalprice"),
      s"seasonality needs only (o_orderdate, o_totalprice), got $cols")
  }

  test("profile_histogram prunes lineitem to the single binned column") {
    val scans = scansOf(SparkEntry.queries("profile_histogram")(spark, sf), "lineitem")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("l_extendedprice"),
      s"histogram needs only l_extendedprice, got $cols")
  }

  test("dedup shingle frame prunes documents to (id, block, text) exactly") {
    // jaccardPairs/containmentPairs wrap this frame in a localCheckpoint,
    // which hides the parquet scan behind a Scan ExistingRDD in the final
    // plan — so the pruning tripwire sits on the factored builder, the
    // exact dataflow both operators materialize
    val docs = Tables(spark, sf, "documents")
    val scans = scansOf(
      graft.dedup.Dedup.shingleFrame(docs, "doc_id", "text", "source", 3),
      "documents")
    assert(scans.nonEmpty, "no documents scan found")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("doc_id", "source", "text"),
      s"shingle frame needs only (doc_id, source, text), got $cols")
  }

  test("incremental near-dup probe joins never shuffle the corpus index tables") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // the scale contract of MinHash.pairsIncremental: the persisted bucket
    // and shingle tables (corpus-sized at 100 TB) are SCANNED into
    // broadcast joins — batch banding and candidate ids are the broadcast
    // sides — so no per-batch shuffle ever carries corpus rows
    def scanUnder(p: SparkPlan, path: String, stopAtShuffle: Boolean): Boolean = p match {
      case _: ShuffleExchangeExec if stopAtShuffle => false
      case a: AdaptiveSparkPlanExec => scanUnder(a.executedPlan, path, stopAtShuffle)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(path))
      case other => other.children.exists(scanUnder(_, path, stopAtShuffle))
    }
    // does `p`'s subtree read RAW rows of the scan — i.e. reach it without
    // an intervening broadcast join (below a BHJ the corpus rows have
    // already been reduced to candidate-sized join output)?
    def rawScanUnder(p: SparkPlan, path: String): Boolean = p match {
      case _: BroadcastHashJoinExec => false
      case a: AdaptiveSparkPlanExec => rawScanUnder(a.executedPlan, path)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(path))
      case other => other.children.exists(rawScanUnder(_, path))
    }
    def collect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val here = pf.lift(p).toSeq
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      here ++ kids.flatMap(collect(_)(pf))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pidx").toString
    val docs = Tables(spark, sf, "documents")
    graft.dedup.MinHash.writeBandIndex(
      docs.filter(org.apache.spark.sql.functions.col("source") =!= "src0"),
      "doc_id", "text", dir, n = 3, k = 32, bands = 8, threshold = 0.1)
    val batch = docs.filter(org.apache.spark.sql.functions.col("source") === "src0")
    // bucket-probe assertions sit on the pre-checkpoint candidate builder
    // (the checkpoint hides the bucket scan behind Scan ExistingRDD in the
    // final plan — same pattern as the dedup shingle-frame tripwires)
    val candPlan = graft.dedup.MinHash.incrementalCandidates(spark, dir,
        graft.dedup.MinHash.shingleFrame(batch, "doc_id", "text", 3),
        k = 32, bands = 8, seed = 42L)
      .queryExecution.executedPlan
    // 1. no shuffle carries RAW corpus bucket rows — every shuffle above
    //    the bucket scan sits past the broadcast probe join, i.e. moves
    //    candidate-sized output only
    val shufflesOverBuckets = collect(candPlan) {
      case s: ShuffleExchangeExec if rawScanUnder(s, s"$dir/buckets") => s
    }
    assert(shufflesOverBuckets.isEmpty,
      s"corpus bucket table is shuffled raw by the probe:\n$candPlan")
    // 2. the bucket scan streams shuffle-free into a broadcast hash join
    //    (the batch banding is the broadcast side, per the explicit hint)
    val bucketBhjs = collect(candPlan) { case b: BroadcastHashJoinExec => b }
    assert(bucketBhjs.exists(b => scanUnder(b, s"$dir/buckets", stopAtShuffle = true)),
      s"corpus buckets scan does not reach a broadcast join shuffle-free:\n$candPlan")
    // 3. in the FULL probe plan, the corpus shingle table is semi-reduced
    //    by a broadcast of candidate ids before the verify join — its scan
    //    reaches a broadcast join without crossing any shuffle
    val probePlan = graft.dedup.MinHash.pairsIncremental(spark, dir,
      batch, "doc_id", "text").queryExecution.executedPlan
    val probeBhjs = collect(probePlan) { case b: BroadcastHashJoinExec => b }
    assert(probeBhjs.exists(b => scanUnder(b, s"$dir/shingles", stopAtShuffle = true)),
      s"corpus shingles scan does not reach a broadcast join shuffle-free:\n$probePlan")
  }

  test("incremental fingerprint probe joins never shuffle the corpus index tables") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.functions.{col, split}
    // the scale contract of FingerprintIndex.pairsIncremental — identical
    // to the band-index probe's: the persisted keys and fps tables
    // (corpus-sized at 100 TB) are SCANNED into broadcast joins, so no
    // per-batch shuffle ever carries corpus rows
    def scanUnder(p: SparkPlan, path: String, stopAtShuffle: Boolean): Boolean = p match {
      case _: ShuffleExchangeExec if stopAtShuffle => false
      case a: AdaptiveSparkPlanExec => scanUnder(a.executedPlan, path, stopAtShuffle)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(path))
      case other => other.children.exists(scanUnder(_, path, stopAtShuffle))
    }
    def rawScanUnder(p: SparkPlan, path: String): Boolean = p match {
      case _: BroadcastHashJoinExec => false
      case a: AdaptiveSparkPlanExec => rawScanUnder(a.executedPlan, path)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(path))
      case other => other.children.exists(rawScanUnder(_, path))
    }
    def collect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val here = pf.lift(p).toSeq
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      here ++ kids.flatMap(collect(_)(pf))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx_plan").toString
    val docs = Tables(spark, sf, "documents")
    def fps(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
    graft.dedup.FingerprintIndex.write(
      fps(docs.filter(col("source") =!= "src0")), "doc_id", "fp", dir)
    val batch = fps(docs.filter(col("source") === "src0"))
    // keys-probe assertions sit on the pre-checkpoint pair builder (the
    // checkpoint hides the keys scan behind Scan ExistingRDD downstream)
    val g = graft.dedup.SimHash.adaptiveGeometry(400, 7)
    val bkeys = batch.select("fp").distinct()
      .select(col("fp"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array(g.keyStructs: _*)).as("_ck"))
      .select(col("_ck.comb").as("comb"), col("_ck.ckey").as("ckey"), col("fp"))
    val candPlan = graft.dedup.FingerprintIndex.incrementalFpPairs(spark, dir,
      bkeys, maxHamming = 7, smallBatch = true).queryExecution.executedPlan
    // 1. no shuffle carries RAW corpus key rows
    val shufflesOverKeys = collect(candPlan) {
      case s: ShuffleExchangeExec if rawScanUnder(s, s"$dir/keys") => s
    }
    assert(shufflesOverKeys.isEmpty,
      s"corpus keys table is shuffled raw by the probe:\n$candPlan")
    // 2. the keys scan streams shuffle-free into a broadcast hash join
    //    (the batch banding is the broadcast side)
    val keyBhjs = collect(candPlan) { case b: BroadcastHashJoinExec => b }
    assert(keyBhjs.exists(b => scanUnder(b, s"$dir/keys", stopAtShuffle = true)),
      s"corpus keys scan does not reach a broadcast join shuffle-free:\n$candPlan")
    // 3. in the FULL probe plan the corpus fps table is semi-reduced by a
    //    broadcast of candidate fingerprints before the expansion joins
    val probePlan = graft.dedup.FingerprintIndex.pairsIncremental(spark, dir,
      docs.filter(col("source") === "src0")
        .select(col("doc_id"),
          graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp")),
      "doc_id", "fp").queryExecution.executedPlan
    val probeBhjs = collect(probePlan) { case b: BroadcastHashJoinExec => b }
    assert(probeBhjs.exists(b => scanUnder(b, s"$dir/fps", stopAtShuffle = true)),
      s"corpus fps scan does not reach a broadcast join shuffle-free:\n$probePlan")
  }

  test("substring positional index prunes documents to (id, text) exactly") {
    val docs = Tables(spark, sf, "documents")
    val scans = scansOf(
      graft.dedup.Dedup.positionalShingles(docs, "doc_id", "text", 8),
      "documents")
    assert(scans.nonEmpty, "no documents scan found")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("doc_id", "text"),
      s"positional index needs only (doc_id, text), got $cols")
  }

  test("LSH selfPairs prunes embeddings to (id, vector) exactly") {
    val emb = Tables(spark, sf, "embeddings")
    val scans = scansOf(
      graft.similarity.AnnLsh.selfPairs(emb, "vec_id", "embedding", 64, minCos = 0.8),
      "embeddings")
    assert(scans.nonEmpty, "no embeddings scan found")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("vec_id", "embedding"),
      s"selfPairs needs only (vec_id, embedding), got $cols")
  }

  test("winnow fingerprint core prunes documents to (id, text) exactly") {
    // winnowPairs localCheckpoints the (id, hash) index, hiding the scan
    // from the final plan — the tripwire sits on the exploded builder,
    // the exact dataflow the pair matcher materializes
    val docs = Tables(spark, sf, "documents")
    val scans = scansOf(
      graft.text.TextAnalysis.winnowFingerprints(docs, "doc_id", "text"),
      "documents")
    assert(scans.nonEmpty, "no documents scan found")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("doc_id", "text"),
      s"winnow needs only (doc_id, text), got $cols")
  }

  test("q16_suppliercnt prunes lineitem to the pair columns and pushes part filters") {
    val scans = scansOf(SparkEntry.queries("q16_suppliercnt")(spark, sf), "lineitem")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("l_partkey", "l_suppkey"),
      s"q16 needs only (l_partkey, l_suppkey) from the fact, got $cols")
    val pscans = scansOf(SparkEntry.queries("q16_suppliercnt")(spark, sf), "part")
    val pushed = pscans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    assert(pushed.contains("p_brand") && pushed.contains("p_size"),
      s"part filters not pushed: $pushed")
  }

  test("q20_excess pushes the ship-date range into the lineitem scan") {
    val scans = scansOf(SparkEntry.queries("q20_excess")(spark, sf), "lineitem")
    assert(scans.nonEmpty)
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("l_partkey", "l_suppkey", "l_quantity", "l_shipdate"),
      s"q20 needs only 4 fact columns, got $cols")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    assert(pushed.contains("l_shipdate"), s"date range not pushed: $pushed")
  }

  test("q3_join pushes the segment filter into the customer scan") {
    val scans = scansOf(SparkEntry.queries("q3_join")(spark, sf), "customer")
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    assert(pushed.contains("c_mktsegment"), s"segment filter not pushed: $pushed")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(!cols.contains("c_comment") && !cols.contains("c_address"),
      s"q3 must not drag wide customer columns, got $cols")
  }

  // The four tripwires below pin PRE-checkpoint builder frames, like the
  // dedup/winnow ones above: the operators lazy-checkpoint these frames,
  // which hides the scan behind a Scan ExistingRDD in the full query plan.

  test("fuzzy_join's distinct-name rollup prunes part to the single name column") {
    val scans = scansOf(graft.operators.FuzzyJoin.distinctNames(
      graft.Tables(spark, sf, "part"), "p_name"), "part")
    assert(scans.nonEmpty, "no part scan found")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("p_name"), s"fuzzy_join needs only p_name, got $cols")
  }

  test("graph edge builder prunes lineitem to (orderkey, partkey) exactly") {
    val scans = scansOf(graft.graph.Graph.coOccurrenceEdges(
      graft.Tables(spark, sf, "lineitem")), "lineitem")
    assert(scans.nonEmpty, "no lineitem scan found")
    val cols = scans.map(readColumns).reduce(_ union _)
    assert(cols == Set("l_orderkey", "l_partkey"),
      s"edge building needs only the pair, got $cols")
  }

  test("profile_ks band frame prunes both sides and pushes the segment filters") {
    val (a, b) = graft.analytics.Profile.ordersKsArms(spark, sf)
    val df = graft.analytics.Profile.ksBandFrame(a, b, "o_totalprice", 2, 100000L)
    val oscans = scansOf(df, "orders")
    assert(oscans.nonEmpty)
    val ocols = oscans.map(readColumns).reduce(_ union _)
    assert(ocols == Set("o_custkey", "o_totalprice"),
      s"ks needs only (custkey, totalprice) from orders, got $ocols")
    val cscans = scansOf(df, "customer")
    val pushed = cscans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    assert(pushed.contains("c_mktsegment"), s"segment filters not pushed: $pushed")
  }

  test("wave-3 faces prune their scans to exactly the consumed columns") {
    val bots = scansOf(SparkEntry.queries("events_bots")(spark, sf), "events")
      .map(readColumns).reduce(_ union _)
    assert(bots == Set("user_id", "ts"), s"bot gate needs (user_id, ts), got $bots")
    val res = scansOf(SparkEntry.queries("sample_reservoir")(spark, sf), "documents")
      .map(readColumns).reduce(_ union _)
    assert(res == Set("doc_id", "source", "lang"),
      s"reservoir face needs (doc_id, source, lang), got $res")
    // assoc's composed plan hides the scan behind its lazy checkpoint —
    // pin the pre-checkpoint builder, same pattern as the dedup heavies
    val assoc = scansOf(graft.analytics.Analytics.assocBaskets(spark, sf), "lineitem")
      .map(readColumns).reduce(_ union _)
    assert(assoc == Set("l_orderkey", "l_partkey"),
      s"assoc baskets need only (orderkey, partkey), got $assoc")
    val hd = scansOf(SparkEntry.queries("imp_hotdeck")(spark, sf), "customer")
      .map(readColumns).reduce(_ union _)
    assert(hd == Set("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"),
      s"hot-deck face must drop c_name at the scan, got $hd")
  }

  test("late wave-3 faces prune their scans to exactly the consumed columns") {
    def cols(q: String, rel: String) =
      scansOf(SparkEntry.queries(q)(spark, sf), rel).map(readColumns)
        .reduceOption(_ union _).getOrElse(Set.empty)
    // lifecycle's composed plan sits behind its lazy checkpoint — pin the
    // pre-checkpoint builder (the assoc/dedup pattern)
    assert(scansOf(graft.analytics.Analytics.lifecycleMarked(spark, sf), "events")
      .map(readColumns).reduce(_ union _) == Set("user_id", "ts"))
    assert(scansOf(graft.analytics.Analytics.overlapActive(spark, sf), "events")
      .map(readColumns).reduce(_ union _) == Set("user_id", "event_type"))
    assert(cols("events_gini", "events") == Set("user_id"))
    assert(cols("orders_cltv", "orders") ==
      Set("o_custkey", "o_totalprice", "o_orderdate"))
    assert(cols("layout_zorder", "orders") == Set("o_custkey", "o_orderdate"))
    assert(cols("corpus_scorecard", "documents") ==
      Set("source", "lang", "n_chars", "text"))
    assert(cols("embed_norm_audit", "embeddings") == Set("label", "embedding"))
    assert(cols("embed_drift", "embeddings") ==
      Set("vec_id", "label", "embedding"))
  }

  test("daily rollup and events_trigrams read only their event columns") {
    val t = scansOf(graft.analytics.Analytics.dailyTypeCounts(spark, sf), "events")
      .map(readColumns).reduce(_ union _)
    assert(t == Set("event_type", "ts"), s"daily rollup needs (event_type, ts), got $t")
    val g = scansOf(SparkEntry.queries("events_trigrams")(spark, sf), "events")
      .map(readColumns).reduce(_ union _)
    assert(g == Set("user_id", "event_id", "event_type", "ts"),
      s"trigrams needs 4 columns, got $g")
  }

  test("bucket-geometry candidate joins run as SHUFFLED HASH joins, not sort-merge") {
    // The measured law (r12, docs/SCALING.json curve_note): bucket/band/
    // pigeonhole keys are duplicate-heavy by construction, and sort-merge's
    // buffered per-key-group iteration pays ~300ns per enumerated candidate
    // pair — 19.3s vs 1.5s for the same 70M-pair simhash enumeration at the
    // fourth decade. The shuffle_hash hints encode that; this tripwire
    // keeps a refactor (or a planner change) from silently dropping them
    // back to sort-merge.
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def joins(df: DataFrame): (Int, Int) = {
      var shj = 0
      var smj = 0
      def walk(p: SparkPlan): Unit = {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case _: ShuffledHashJoinExec => shj += 1
          case _: SortMergeJoinExec => smj += 1
          case _ => ()
        }
        p.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      (shj, smj)
    }
    // candidate-only sub-plans: every equality join present IS the bucket
    // join (the verify/expansion joins are downstream of these frames)
    val docs = graft.Tables(spark, sf, "documents")
    val emb = graft.Tables(spark, sf, "embeddings")
    val simhash = graft.dedup.SimHash.pairs(docs, "doc_id", "text", maxHamming = 7)
    assert(joins(simhash)._1 >= 1, "simhash pigeonhole join lost its shuffle_hash")
    val minhash = graft.dedup.MinHash.pairs(docs, "doc_id", "text", threshold = 0.1)
    assert(joins(minhash)._1 >= 1, "minhash band join lost its shuffle_hash")
    val lshSingle = graft.similarity.AnnLsh.selfPairs(emb, "vec_id", "embedding",
      dim = 64, minCos = 0.35, planes = 4, tables = 4)
    assert(joins(lshSingle)._1 >= 1, "LSH bucket join (single-probe) lost its shuffle_hash")
    val lshProbed = graft.similarity.AnnLsh.selfPairs(emb, "vec_id", "embedding",
      dim = 64, minCos = 0.35, planes = 5, tables = 4, probes = 3)
    assert(joins(lshProbed)._1 >= 1, "LSH bucket join (multi-probe) lost its shuffle_hash")
    // the saturated-regime permuted-mask tier shares the keyed-join tail —
    // pin it independently so a permuted-path refactor can't silently
    // regress to sort-merge on the same duplicate-heavy keys
    val permuted = graft.dedup.SimHash.pairsAdaptive(docs, "doc_id", "text",
      maxHamming = 7, n = 10000000L)
    assert(joins(permuted)._1 >= 1, "permuted-mask join lost its shuffle_hash")
  }
}
