package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FingerprintIndex.write / pairsIncremental / append / compact / rekey —
  * the persisted incremental workflow for the HAMMING family. The
  * contract: batch ingest against the index finds EXACTLY the pairs the
  * corpus-wide generator at the index's pinned geometry would report
  * that touch the batch, without re-fingerprinting the corpus. */
class FingerprintIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_fpidx").toString

  private val fp0 = 0x0123456789ABCDEFL
  private def flip(fp: Long, bits: Int*): Long =
    bits.foldLeft(fp)((f, b) => f ^ (1L << b))

  // corpus: two hamming-3 near-dups, one exact fp copy, one far doc
  private def corpus = Seq(
    (100L, fp0),
    (101L, flip(fp0, 0, 1, 2)),          // hamming 3 of 100/103
    (102L, 0x7EADBEEFCAFE1234L),          // far from everything
    (103L, fp0)                           // verbatim copy of 100
  ).toDF("doc_id", "fp")

  // batch: one exact copy, one hamming-5 near-dup, one novel far doc.
  // 2's flips are disjoint from 101's → hamming(2, 101) = 8 > 7: NOT a pair.
  private def batch = Seq(
    (1L, fp0),
    (2L, flip(fp0, 10, 11, 12, 13, 14)),
    (3L, 0x5A5A5A5A5A5A5A5AL)
  ).toDF("doc_id", "fp")

  /** Ground truth: corpus-wide run at the index's pinned geometry over
    * corpus ∪ batches, restricted to batch-touching pairs. */
  private def fullTouching(df: org.apache.spark.sql.DataFrame, d: Int,
                           batchIds: Set[Long]): Set[(Long, Long, Int)] =
    SimHash.pairsFromFingerprintsBlocked(df, "doc_id", "fp",
        maxHamming = 7, d = d)
      .filter(col("id_a").isin(batchIds.toSeq: _*) ||
        col("id_b").isin(batchIds.toSeq: _*))
      .as[(Long, Long, Int)].collect().toSet

  test("pairsIncremental ≡ corpus-wide adaptive pairs restricted to batch-touching") {
    val path = tmp()
    FingerprintIndex.write(corpus, "doc_id", "fp", path)
    val inc = FingerprintIndex.pairsIncremental(spark, path, batch, "doc_id", "fp")
      .as[(Long, Long, Int)].collect().toSet
    val full = fullTouching(corpus.union(batch), d = 1, Set(1L, 2L, 3L))
    assert(inc == full)
    // the planted relationships, through every candidate path:
    assert(inc.contains((1L, 100L, 0)))  // batch vs corpus, shared fp
    assert(inc.contains((1L, 103L, 0)))  // ...both members of the fp group
    assert(inc.contains((1L, 2L, 5)))    // batch-internal cross-fp
    assert(inc.contains((2L, 100L, 5)))  // batch vs corpus cross-fp
    assert(inc.contains((2L, 101L, 8)) == false) // hamming 8 > radius
    // corpus-internal pairs are NOT re-reported — including the
    // corpus-corpus members of a fingerprint group the batch touches
    assert(!inc.exists { case (a, b, _) => a >= 100L && b >= 100L })
    // novel doc pairs with nothing
    assert(inc.forall { case (a, b, _) => a != 3L && b != 3L })
  }

  test("hamming-0 pair with NO cross-fp neighbor: exact-fp corpus copy is still found") {
    // regression: the membership restriction used to be built only from
    // cross-fp candidate pairs, so a verbatim corpus copy whose
    // fingerprint had no hamming-[1,d] neighbor anywhere never entered
    // `members` and the (batch, corpus, 0) pair was silently dropped
    val path = tmp()
    FingerprintIndex.write(Seq((100L, fp0)).toDF("doc_id", "fp"),
      "doc_id", "fp", path)
    val probe = FingerprintIndex.pairsIncremental(spark, path,
        Seq((1L, fp0)).toDF("doc_id", "fp"), "doc_id", "fp")
      .as[(Long, Long, Int)].collect().toSet
    assert(probe == Set((1L, 100L, 0)))
  }

  test("append folds the batch: the NEXT probe sees it, id-guarded, fp-deduped keys") {
    val path = tmp()
    FingerprintIndex.write(corpus, "doc_id", "fp", path)
    val keys0 = spark.read.parquet(s"$path/keys").count()
    // corpus has 3 DISTINCT fps; d=1 at h=7 keys 8 combinations each
    assert(keys0 == 3 * 8)
    val b1 = Seq((1L, fp0)).toDF("doc_id", "fp") // verbatim copy: fp indexed
    FingerprintIndex.append(spark, path, b1, "doc_id", "fp")
    // one fps row, ZERO new key rows (the fingerprint is already keyed)
    assert(spark.read.parquet(s"$path/fps").count() == 5)
    assert(spark.read.parquet(s"$path/keys").count() == keys0)
    // re-append is a no-op (id guard)
    FingerprintIndex.append(spark, path, b1, "doc_id", "fp")
    assert(spark.read.parquet(s"$path/fps").count() == 5)
    assert(spark.read.parquet(s"$path/keys").count() == keys0)
    // intra-batch repeated id lands once
    val b2 = Seq((2L, flip(fp0, 20)), (2L, flip(fp0, 20))).toDF("doc_id", "fp")
    FingerprintIndex.append(spark, path, b2, "doc_id", "fp")
    assert(spark.read.parquet(s"$path/fps").filter(col("id") === 2L).count() == 1)
    assert(spark.read.parquet(s"$path/keys").count() == keys0 + 8)
    // a later batch finds pairs against BOTH appended docs
    val probe = FingerprintIndex.pairsIncremental(spark, path,
        Seq((5L, flip(fp0, 20, 21))).toDF("doc_id", "fp"), "doc_id", "fp")
      .as[(Long, Long, Int)].collect().toSet
    val all = corpus.union(b1).union(b2.dropDuplicates("doc_id"))
      .union(Seq((5L, flip(fp0, 20, 21))).toDF("doc_id", "fp"))
    assert(probe == fullTouching(all, d = 1, Set(5L)))
    assert(probe.contains((2L, 5L, 1))) // via the appended fp's key rows
  }

  test("id overlap: a re-ingested id is the same document, and its pairs still touch the batch") {
    val path = tmp()
    FingerprintIndex.write(Seq((100L, fp0), (101L, flip(fp0, 1)))
      .toDF("doc_id", "fp"), "doc_id", "fp", path)
    // the batch re-ingests id 100 (same fp — the same document): no
    // self-pair, and the (100, 101) pair IS batch-touching (100 is in the
    // batch) — the flag must be deterministic regardless of which copy of
    // the overlapping id the membership dedup kept
    val probe = FingerprintIndex.pairsIncremental(spark, path,
        Seq((100L, fp0)).toDF("doc_id", "fp"), "doc_id", "fp")
      .as[(Long, Long, Int)].collect().toSet
    assert(probe == Set((100L, 101L, 1)))
  }

  test("compact re-clusters; probes unchanged; crash windows recover") {
    val path = tmp()
    FingerprintIndex.write(corpus, "doc_id", "fp", path)
    FingerprintIndex.append(spark, path,
      Seq((1L, flip(fp0, 30))).toDF("doc_id", "fp"), "doc_id", "fp")
    FingerprintIndex.append(spark, path,
      Seq((2L, flip(fp0, 40))).toDF("doc_id", "fp"), "doc_id", "fp")
    val probeBatch = Seq((5L, flip(fp0, 30, 31))).toDF("doc_id", "fp")
    def probe() = FingerprintIndex.pairsIncremental(spark, path, probeBatch,
      "doc_id", "fp").select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val before = probe()
    assert(before.contains((1L, 5L))) // the appended near-dup is found
    val keyRows = spark.read.parquet(s"$path/keys").count()
    val fpsRows = spark.read.parquet(s"$path/fps").count()
    FingerprintIndex.compact(spark, path)
    assert(spark.read.parquet(s"$path/keys").count() == keyRows)
    assert(spark.read.parquet(s"$path/fps").count() == fpsRows)
    assert(probe() == before)
    val subs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(subs == Set("keys", "fps", "params"))
    // simulated mid-swap crash: live renamed out, not yet republished —
    // lock-free probes resolve the backup; compact recovers first
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/keys"),
      new org.apache.hadoop.fs.Path(s"$path/_keys_old")))
    assert(probe() == before)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/fps"),
      new org.apache.hadoop.fs.Path(s"$path/_fps_old")))
    FingerprintIndex.compact(spark, path)
    assert(probe() == before)
    assert(new java.io.File(path).listFiles().map(_.getName).toSet ==
      Set("keys", "fps", "params"))
  }

  test("rekey re-derives the geometry from the grown corpus; probe results unchanged") {
    val path = tmp()
    // 600 deterministic fingerprints (plus the planted family) — enough
    // rows that occupancy 1 pushes the regime switch past d=1
    val rnd = new java.util.Random(0xF00DL)
    val big = (Seq((100L, fp0), (101L, flip(fp0, 0, 1, 2))) ++
      (200 until 800).map(i => (i.toLong, rnd.nextLong()))).toDF("doc_id", "fp")
    FingerprintIndex.write(big, "doc_id", "fp", path)
    // pinned at build: 602 docs at occupancy 32 → blocked d=1
    val p0 = spark.read.parquet(s"$path/params").collect()(0)
    assert(p0.getAs[String]("regime") == "blocked" && p0.getAs[Int]("d") == 1)
    val probeBatch = Seq((5L, flip(fp0, 50))).toDF("doc_id", "fp")
    def probe() = FingerprintIndex.pairsIncremental(spark, path, probeBatch,
      "doc_id", "fp").as[(Long, Long, Int)].collect().toSet
    val before = probe()
    assert(before.nonEmpty)
    // rekey at a forced occupancy target the current corpus outgrows:
    // the regime switch now derives a WIDER combination key (d=2) — keys
    // rebuild from fps by pure bit math, params update, and the probe
    // (exact recall at every d) answers identically
    FingerprintIndex.rekey(spark, path, targetOccupancy = 1L)
    val p1 = spark.read.parquet(s"$path/params").collect()(0)
    assert(p1.getAs[String]("regime") == "blocked" && p1.getAs[Int]("d") == 2)
    assert(probe() == before)
    // key volume matches the new geometry: C(9,2)=36 combos per distinct fp
    assert(spark.read.parquet(s"$path/keys").count() ==
      spark.read.parquet(s"$path/fps").select("fp").distinct().count() * 36)
    // idempotent: same geometry → keys untouched
    val keyRows = spark.read.parquet(s"$path/keys").count()
    FingerprintIndex.rekey(spark, path, targetOccupancy = 1L)
    assert(spark.read.parquet(s"$path/keys").count() == keyRows)
    assert(probe() == before)
  }
}
