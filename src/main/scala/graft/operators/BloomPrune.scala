package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomMightContainExpr

/** Bloom-filter probe-side pruning for asymmetric joins: when a 100 TB fact
  * table joins a few-million-row key set that is still too big to broadcast
  * as a hash relation, shuffling the whole fact side is the dominant cost.
  * A Bloom sketch of the build-side keys (built with a distributed
  * `treeAggregate` via `DataFrameStatFunctions.bloomFilter`, a few MB for
  * ~1% fpp) broadcasts to every scan task and drops non-joining fact rows
  * BEFORE the exchange — the shuffle then carries only true matches plus
  * the fpp fraction.
  *
  * Guarantees: NO false negatives (the subsequent real join sees every
  * matching row), ≤ fpp false positives (removed by the join itself).
  * The probe is [[graft.functions.BloomMightContainExpr]], a native
  * codegen expression over the broadcast sketch — it lives inside the
  * scan's WholeStageCodegen span with no per-row boxing. (Spark's own
  * `might_contain` is optimizer-internal, wired in by
  * `InjectRuntimeFilter` when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` is set — this helper
  * is the explicit form for when the optimizer can't prove the pattern.)
  */
object BloomPrune {

  private def mightContain(df: DataFrame, key: String, bf: BloomFilter): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(bf)
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(col(key)), bc))
  }

  /** Build a Bloom sketch of `buildKey` and prune `probe` rows whose
    * `probeKey` cannot match. Follow with the real join for exactness. */
  def prune(probe: DataFrame, probeKey: String,
            build: DataFrame, buildKey: String,
            expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    probe.filter(mightContain(probe, probeKey, bf))
  }

  /** Bloom-pruned inner equi-join: sketch-prune the probe side, then do
    * the exact join on the survivors. */
  def join(probe: DataFrame, probeKey: String,
           build: DataFrame, buildKey: String,
           expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    prune(probe, probeKey, build, buildKey, expectedKeys, fpp)
      .join(build, col(probeKey) === build(buildKey))

  /** Bloom-accelerated ANTI join: probe rows whose key the sketch rules out
    * are emitted immediately (no false negatives ⇒ they are certainly
    * absent from the build side and never reach a shuffle); only the
    * `mightContain` candidates — the true matches plus the fpp fraction —
    * go through the exact left-anti join. On a mostly-novel 100 TB ingest
    * the shuffle carries a few percent of the batch instead of all of it. */
  def antiJoin(probe: DataFrame, probeKey: String,
               build: DataFrame, buildKey: String,
               expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val might = mightContain(probe, probeKey, bf)
    // `might` is NULL for a NULL probe key; a bare filter(!might) would
    // silently DROP those rows from BOTH branches, while an exact left-anti
    // join KEEPS them (a null key matches nothing). Route null keys to the
    // certainly-novel branch so this equals the exact anti join row-for-row.
    val certainlyNovel = probe.filter(coalesce(!might, lit(true)))
    val verified = probe.filter(coalesce(might, lit(false)))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_anti")
    certainlyNovel.unionByName(verified)
  }

  /** [[antiJoin]] for a SMALL probe against a corpus-sized build side —
    * the ingest-batch case ([[graft.dedup.Dedup.incremental]]), where
    * antiJoin's `build.distinct()` would shuffle the whole corpus key
    * column on every batch. Same result row-for-row, different plan: the
    * bloom-hit keys (true dups + fpp sliver, ≤ probe rows) broadcast into
    * a semi join that REDUCES the build side to hit keys only — the
    * corpus is scanned, never shuffled — and the exact anti join then
    * runs against a broadcast of that hit-key-sized reduction. The probe
    * (and so the hit-key set) must fit the broadcast budget: that is this
    * variant's sizing contract — for a corpus-sized PROBE use [[antiJoin]],
    * whose shuffle carries the hit fraction instead. */
  def antiJoinSmallProbe(probe: DataFrame, probeKey: String,
                         build: DataFrame, buildKey: String,
                         expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    antiJoinSmallProbe(probe, probeKey, build, buildKey,
      build.stat.bloomFilter(buildKey, expectedKeys, fpp))

  /** [[antiJoinSmallProbe]] with a PREBUILT sketch of the build side —
    * the persisted-index path ([[graft.dedup.Dedup.incrementalIndexed]]),
    * where rebuilding the sketch would rescan the corpus per batch. The
    * sketch must be a SUPERSET of the build keys (extra keys only cost
    * needless verifies; a missing key would be a false negative and break
    * the no-false-negative guarantee). */
  def antiJoinSmallProbe(probe: DataFrame, probeKey: String,
                         build: DataFrame, buildKey: String,
                         bf: BloomFilter): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val might = mightContain(probe, probeKey, bf)
    // same null-key routing as antiJoin: null keys are certainly novel
    val certainlyNovel = probe.filter(coalesce(!might, lit(true)))
    val hits = probe.filter(coalesce(might, lit(false)))
    val buildHits = build.select(col(buildKey).as(probeKey))
      .join(broadcast(hits.select(probeKey).distinct()), Seq(probeKey), "left_semi")
    val verified = hits.join(broadcast(buildHits.distinct()), Seq(probeKey), "left_anti")
    certainlyNovel.unionByName(verified)
  }
}
