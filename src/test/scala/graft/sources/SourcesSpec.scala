package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.imputer.SparkImputer
import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.regression.DecisionTreeRegressor

/** CSV landing-file → impute → partitioned parquet, the reference's
  * territories-CSV workflow end-to-end at the engine's surface. */
class SourcesSpec extends SparkSpec {

  test("csv → SparkImputer → partitioned parquet roundtrip") {
    val dir = Files.createTempDirectory("graft_src").toString
    val csvPath = s"$dir/territories.csv"
    // territories-like frame: name/location categorical, numerics with gaps
    val rows = "id,name,location,km2,gdp_per_capita,population" +:
      (1 to 60).map { i =>
        val km2 = if (i % 7 == 3) "" else (100 + i * 3).toString
        val loc = if (i % 11 == 5) "" else s"Region${i % 4}"
        s"$i,Territory$i,$loc,$km2,${1000 + i * 17},${500 + i * 13}"
      }
    Files.write(java.nio.file.Paths.get(csvPath),
      String.join("\n", rows: _*).getBytes)

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("location", StringType), StructField("km2", DoubleType),
      StructField("gdp_per_capita", DoubleType), StructField("population", DoubleType)))
    val df = Sources.csv(spark, csvPath, schema)
    assert(df.count() == 60)
    assert(df.filter(col("km2").isNull).count() > 0)

    val imputer = new SparkImputer(idCol = "id",
      categorical = Seq("name", "location"), classThreshold = 14,
      roundColumns = Seq("population"))
    val imputed = imputer.fitTransform(df,
      new DecisionTreeClassifier(), new DecisionTreeRegressor())
    val nulls = imputed.columns.map(c => imputed.filter(col(c).isNull).count()).sum
    assert(nulls == 0)

    Sources.writePartitioned(imputed, s"$dir/out", Seq("location"))
    val back = Sources.parquet(spark, s"$dir/out")
    assert(back.count() == 60)
    // partition pruning works on the layout
    val pruned = Sources.parquet(spark, s"$dir/out").filter(col("location") === "Region1")
    assert(pruned.count() > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dims = (0 to 49).map(k => (k.toLong, s"d$k")).toDF("k", "attr")
    Sources.writeBucketed(facts, "b_facts", "k", 8)
    Sources.writeBucketed(dims, "b_dims", "k", 8)
    // force a sort-merge join (broadcast would win at this toy size and
    // hide the bucket co-location we're asserting)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("jsonLines reads with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.write(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      "{\"a\": 1, \"b\": \"x\"}\n{\"a\": 2, \"b\": \"y\"}".getBytes)
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val df = Sources.jsonLines(spark, dir, schema)
    assert(df.count() == 2 && df.schema == schema)
  }

  test("partitioned writes enable partition pruning on re-read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    val df = (1 to 300).map(i => (i.toLong, s"src${i % 3}", i * 1.5)).toDF("id", "source", "v")
    Sources.writePartitioned(df, s"$dir/docs", Seq("source"))
    val back = Sources.parquet(spark, s"$dir/docs").filter($"source" === "src1")
    assert(back.count() == 100)
    // the source predicate must become a partition filter, not a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("source"),
      s"no partition filter in plan:\n$plan")
  }

  test("orc roundtrip preserves schema and values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "name", "score")
    Sources.writeOrc(df, s"$dir/t.orc")
    val back = Sources.orc(spark, s"$dir/t.orc")
    // file formats read back as nullable — compare names and types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("approx profile tracks the exact profile within sketch error") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toDouble / 100.0, (i % 37).toDouble)).toDF("a", "b")
    val exact = graft.analytics.Profile.numeric(df, Seq("a" -> 2, "b" -> 0))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.analytics.Profile.numericApprox(df, Seq("a" -> 2, "b" -> 0))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("a", "b")) {
      assert(approx(c).getLong(1) == exact(c).getLong(1))                   // n exact
      val (dA, dE) = (approx(c).getLong(2).toDouble, exact(c).getLong(2).toDouble)
      assert(math.abs(dA - dE) / dE <= 0.15, s"$c distinct $dA vs $dE")     // hll rsd
      assert(approx(c).getDouble(5) == exact(c).getDouble(5))               // mean exact
      val (pA, pE) = (approx(c).getDouble(6), exact(c).getDouble(6))
      assert(math.abs(pA - pE) <= math.max(0.02, 0.02 * math.abs(pE)), s"$c p50")
    }
  }

  test("imputer validation rejects unknown columns (ref KeyError test)") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("id", "x")
    val bad = new SparkImputer(idCol = "id", categorical = Seq("pilot", "space"))
    val e = intercept[IllegalArgumentException] {
      bad.fit(df, new DecisionTreeClassifier(), new DecisionTreeRegressor())
    }
    assert(e.getMessage.contains("pilot"))
  }

  test("clustered write yields non-overlapping per-file key ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 10007L, i.toLong))
      .toDF("k", "payload")                      // scrambled, unsorted input
    Sources.writeClustered(df, dir, Seq("k"), targetPartitions = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1)
    val ranges = files.flatMap { f =>
      val r = spark.read.parquet(f).agg(min($"k"), max($"k"), count($"k")).head()
      if (r.getLong(2) == 0L) None else Some((r.getLong(0), r.getLong(1)))
    }.sortBy(_._1)
    // each file holds a narrow range disjoint from the next — the property
    // parquet min/max pruning needs to skip whole files on range predicates
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi vs $lo2")
      case _ => ()
    }
    // nothing lost in the relayout
    assert(spark.read.parquet(dir).count() == 5000L)
  }

  test("zValue interleaves bits; writeZOrdered tiles BOTH dimensions") {
    import spark.implicits._
    // zValue unit math: (a=1, b=0) -> 2, (a=0, b=1) -> 1, (3, 3) -> 15
    val z = Seq((1L, 0L), (0L, 1L), (3L, 3L)).toDF("a", "b")
      .select(Sources.zValue($"a", $"b", 4).as("z")).as[Long].collect()
    assert(z.toSeq == Seq(2L, 1L, 15L))

    // a 64×64 grid z-ordered into 16 files: every file's bounding box in
    // (a, b) must be a small tile, so selective predicates on EITHER
    // column can prune most files via parquet min/max stats
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    Sources.writeZOrdered(grid, dir, "a", "b", targetPartitions = 16, bits = 6)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 4)
    val boxes = files.flatMap { f =>
      val r = spark.read.parquet(f)
        .agg(min($"a"), max($"a"), min($"b"), max($"b"), count($"a")).head()
      if (r.getLong(4) == 0L) None
      else Some((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    // each tile must span far less than the full key range in BOTH dims
    // (lexicographic sort would give full-range boxes in the second dim)
    assert(boxes.forall { case (alo, ahi, blo, bhi) =>
      (ahi - alo) <= 32 && (bhi - blo) <= 32
    })
    // point query on b alone: most files' [blo, bhi] excludes it
    val hit = boxes.count { case (_, _, blo, bhi) => blo <= 5 && 5 <= bhi }
    assert(hit <= boxes.length / 2)
    assert(spark.read.parquet(dir).count() == 64L * 64L)
  }

  test("compact rewrites a sprayed table into right-sized files, content intact") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1 to 4000).map(i => (i.toLong, i % 97)).toDF("k", "v")
    df.repartition(200).write.mode("overwrite").parquet(inDir) // sprayed
    val sprayed = new java.io.File(inDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(sprayed >= 100)
    Sources.compact(spark, inDir, outDir, targetRowsPerFile = 1000L, Seq("k"))
    val compacted = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(compacted.length <= 5)
    // identical content, clustered layout preserved (disjoint k ranges)
    val a = spark.read.parquet(inDir).as[(Long, Int)].collect().sorted
    val b = spark.read.parquet(outDir).as[(Long, Int)].collect().sorted
    assert(a.toSeq == b.toSeq)
    val ranges = compacted.flatMap { f =>
      val r = spark.read.parquet(f).agg(min($"k"), max($"k"), count($"k")).head()
      if (r.getLong(2) == 0L) None else Some((r.getLong(0), r.getLong(1)))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ => ()
    }
  }

  test("resolveSwap is non-mutating; restoreUnderLock restores a crashed publish") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("graft_swap").toString
    val live = new org.apache.hadoop.fs.Path(s"$base/t")
    val old = new org.apache.hadoop.fs.Path(s"$base/_t_old")
    val lock = new org.apache.hadoop.fs.Path(s"$base/_t_lock")
    fs.mkdirs(live)
    // healthy state: resolves to live, restore is a no-op
    assert(Sources.resolveSwap(fs, live, old) == live)
    Sources.withSwapLock(fs, lock) { Sources.restoreUnderLock(fs, live, old) }
    assert(fs.exists(live) && !fs.exists(old))
    // crashed-publish state: only the backup exists. A READER must not
    // rename anything — it reads the backup in place…
    assert(fs.rename(live, old))
    assert(Sources.resolveSwap(fs, live, old) == old)
    assert(!fs.exists(live) && fs.exists(old), "reader mutated the swap state")
    // …while an APPENDER holding the maintenance lease restores it
    // immediately (under the lease no publisher can be mid-window)
    Sources.withSwapLock(fs, lock) { Sources.restoreUnderLock(fs, live, old) }
    assert(fs.exists(live) && !fs.exists(old))
    assert(!fs.exists(lock), "lease file leaked after release")
  }

  test("recursive reconcile swap preserves a late-appended partition file in place") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("graft_swap_rec").toString
    val live = new org.apache.hadoop.fs.Path(s"$base/vectors")
    val tmp = new org.apache.hadoop.fs.Path(s"$base/_vectors_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$base/_vectors_old")
    def put(p: org.apache.hadoop.fs.Path, body: String): Unit = {
      fs.mkdirs(p.getParent)
      val o = fs.create(p, true); try o.write(body.getBytes("UTF-8")) finally o.close()
    }
    // a Hive-partitioned layout with hidden state at both levels
    put(new org.apache.hadoop.fs.Path(live, "list=0/a.parquet"), "a")
    put(new org.apache.hadoop.fs.Path(live, "list=1/b.parquet"), "b")
    put(new org.apache.hadoop.fs.Path(live, "_SUCCESS"), "")
    put(new org.apache.hadoop.fs.Path(live, "list=1/.b.parquet.crc"), "x")
    val snapshot = Sources.dataFilesRecursive(fs, live)
    assert(snapshot == Set("list=0/a.parquet", "list=1/b.parquet"),
      s"hidden files must stay out of the snapshot: $snapshot")
    // the compactor's rewrite of the snapshot
    put(new org.apache.hadoop.fs.Path(tmp, "list=0/c.parquet"), "c")
    put(new org.apache.hadoop.fs.Path(tmp, "list=1/d.parquet"), "d")
    // a cooperating appender lands a micro-batch AFTER the snapshot
    put(new org.apache.hadoop.fs.Path(live, "list=1/late.parquet"), "late")
    Sources.publishSwapReconcileRecursive(fs, live, tmp, old, snapshot)
    val after = Sources.dataFilesRecursive(fs, live)
    assert(after == Set("list=0/c.parquet", "list=1/d.parquet",
      "list=1/late.parquet"),
      s"late append must survive the swap IN ITS PARTITION: $after")
    assert(!fs.exists(old) && !fs.exists(tmp))
  }

  test("withSwapLock mutually excludes, releases on failure, steals a stale lease") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("graft_lock").toString
    val lock = new org.apache.hadoop.fs.Path(s"$base/_lock")
    // mutual exclusion: a contender cannot enter while the holder is in
    // its critical section — interleavings would break the ordering below
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val holderIn = new java.util.concurrent.CountDownLatch(1)
    val t1 = new Thread(() => Sources.withSwapLock(fs, lock, leaseMs = 60000L) {
      order.add("t1-enter"); holderIn.countDown()
      Thread.sleep(300); order.add("t1-exit")
    })
    t1.start(); holderIn.await()
    val t2 = new Thread(() => Sources.withSwapLock(fs, lock, leaseMs = 60000L,
      pollMs = 20L) { order.add("t2-enter") })
    t2.start(); t1.join(); t2.join()
    assert(order.toArray.toSeq == Seq("t1-enter", "t1-exit", "t2-enter"))
    assert(!fs.exists(lock))
    // release-on-failure: a throwing body must not leave the lease held
    intercept[RuntimeException] {
      Sources.withSwapLock(fs, lock) { throw new RuntimeException("boom") }
    }
    assert(!fs.exists(lock), "lease leaked after a failed body")
    // stale steal: a lease whose holder died (no heartbeat) is taken over
    // after leaseMs instead of deadlocking forever
    val o = fs.create(lock, false); o.write("dead-holder".getBytes("UTF-8")); o.close()
    fs.setTimes(lock, System.currentTimeMillis() - 10000L, -1)
    var entered = false
    Sources.withSwapLock(fs, lock, leaseMs = 1000L, pollMs = 20L) { entered = true }
    assert(entered && !fs.exists(lock))
  }

  test("withSwapLock token fence: a stolen lease fails loudly, never deletes the thief's") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("graft_fence").toString
    val lock = new org.apache.hadoop.fs.Path(s"$base/_lock")
    def steal(): Unit = {
      // simulate a contender's stale-steal completing while the holder is
      // paused: the old lease vanishes and a NEW holder's token replaces it
      fs.delete(lock, false)
      val o = fs.create(lock, false)
      try o.write("thief-token".getBytes("UTF-8")) finally o.close()
    }
    def lockContent(): String = {
      val in = fs.open(lock)
      try { val b = new Array[Byte](64); val n = in.read(b); new String(b, 0, n, "UTF-8") }
      finally in.close()
    }
    // body completes but the lease was stolen mid-section → the call must
    // FAIL (the section was not exclusive) and the thief's lease survives
    intercept[SwapLeaseLostException] {
      Sources.withSwapLock(fs, lock) { steal() }
    }
    assert(fs.exists(lock) && lockContent() == "thief-token",
      "release deleted the new holder's lease")
    fs.delete(lock, false)
    // a FAILING body with a stolen lease: the body's exception propagates
    // (not masked by the fence) and the thief's lease still survives
    val ex = intercept[RuntimeException] {
      Sources.withSwapLock(fs, lock) { steal(); throw new RuntimeException("boom") }
    }
    assert(ex.getMessage == "boom")
    assert(fs.exists(lock) && lockContent() == "thief-token")
    fs.delete(lock, false)
    // heartbeat fencing: beats during the body read the thief's token,
    // stop extending, and the release still fails loudly
    intercept[SwapLeaseLostException] {
      Sources.withSwapLock(fs, lock, leaseMs = 200L, pollMs = 20L) {
        steal(); Thread.sleep(400)
      }
    }
    assert(lockContent() == "thief-token")
    fs.delete(lock, false)
  }

  test("withSwapLock fence tolerates transient read failures; sustained outage fails loudly") {
    val raw = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("graft_hiccup").toString
    val lock = new org.apache.hadoop.fs.Path(s"$base/_lock")
    // inject IOExceptions into the fence READ path only (open), leaving
    // create/setTimes/delete healthy — the exact failure the advice named:
    // a single hiccup during a heartbeat must not permanently kill a
    // healthy exclusive section
    val failOpens = new java.util.concurrent.atomic.AtomicInteger(0)
    val fs = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def open(p: org.apache.hadoop.fs.Path, bufferSize: Int)
          : org.apache.hadoop.fs.FSDataInputStream = {
        if (failOpens.get() > 0) {
          failOpens.decrementAndGet()
          throw new java.io.IOException("injected fence-read failure")
        }
        super.open(p, bufferSize)
      }
    }
    // TRANSIENT: two failed beats (below the 3-consecutive threshold), then
    // reads recover — the section completes and the lease releases cleanly
    var completed = false
    failOpens.set(2)
    Sources.withSwapLock(fs, lock, leaseMs = 400L, pollMs = 20L) {
      Thread.sleep(600); completed = true
    }
    assert(completed, "healthy section killed by a transient fence-read failure")
    assert(!raw.exists(lock), "lease leaked after a hiccup-tolerant release")
    // SUSTAINED: every read fails — 3 consecutive failed beats mean the
    // holder can no longer confirm ownership while a steal becomes possible,
    // so the call must fail loudly rather than return as if exclusive
    failOpens.set(1000)
    intercept[SwapLeaseLostException] {
      Sources.withSwapLock(fs, lock, leaseMs = 400L, pollMs = 20L) {
        Thread.sleep(600)
      }
    }
    failOpens.set(0)
    raw.delete(lock, false) // unconfirmable ownership → release never deletes
  }

  test("absorbRecreatedLive merges a rogue writer's committed files, drops half-state") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("graft_absorb").toString
    val live = new org.apache.hadoop.fs.Path(s"$base/t")
    val tmp = new org.apache.hadoop.fs.Path(s"$base/_t_tmp")
    def put(dir: org.apache.hadoop.fs.Path, name: String): Unit = {
      val o = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      try o.write("x".getBytes("UTF-8")) finally o.close()
    }
    fs.mkdirs(tmp); put(tmp, "part-rewritten")
    // no-op when live does not exist (the lease-protected normal case)
    Sources.absorbRecreatedLive(fs, live, tmp)
    assert(Sources.dataFiles(fs, tmp) == Set("part-rewritten"))
    // a non-cooperating writer recreated live mid-window: committed data
    // files move into tmp; committer half-state is dropped; the final
    // rename path is clear
    fs.mkdirs(live); put(live, "part-rogue")
    fs.mkdirs(new org.apache.hadoop.fs.Path(live, "_temporary"))
    Sources.absorbRecreatedLive(fs, live, tmp)
    assert(!fs.exists(live))
    assert(Sources.dataFiles(fs, tmp) == Set("part-rewritten", "part-rogue"))
    assert(fs.rename(tmp, live), "final publish rename must land on a clear path")
  }

  test("publishSwapReconcile copies post-snapshot files across the swap") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("graft_swapr").toString
    val live = new org.apache.hadoop.fs.Path(s"$base/t")
    val tmp = new org.apache.hadoop.fs.Path(s"$base/_t_tmp")
    val old = new org.apache.hadoop.fs.Path(s"$base/_t_old")
    def put(dir: org.apache.hadoop.fs.Path, name: String, body: String): Unit = {
      val o = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      try o.write(body.getBytes("UTF-8")) finally o.close()
    }
    fs.mkdirs(live); fs.mkdirs(tmp)
    put(live, "part-0", "a")
    put(live, "_SUCCESS", "")
    val snapshot = Sources.dataFiles(fs, live)
    assert(snapshot == Set("part-0")) // hidden files excluded
    put(tmp, "part-rewritten", "a-compacted")
    // a concurrent appender lands AFTER the snapshot
    put(live, "part-late", "b")
    Sources.publishSwapReconcile(fs, live, tmp, old, snapshot)
    val after = Sources.dataFiles(fs, live)
    assert(after == Set("part-rewritten", "part-late"),
      s"late append lost across the swap: $after")
    assert(!fs.exists(old) && !fs.exists(tmp))
  }
}
