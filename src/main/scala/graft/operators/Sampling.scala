package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: reproducible
  * subsets without RNG state, so a sample is re-derivable from the data
  * alone (auditable, stable across reruns, cluster topologies, and even
  * engines — the splitter is plain integer arithmetic any SQL dialect can
  * reproduce, unlike engine-specific hash functions).
  *
  * Sampling is a pure FILTER: no shuffle, pushdown-friendly, and on a
  * 1000-executor scan it costs nothing beyond the scan itself.
  */
object Sampling {

  /** Deterministic bucket in [0, 10000) from an integer id: multiplicative
    * scramble with Knuth's 2654435761, which is coprime to 10^4 — a
    * bijection on residues, so dense id ranges land EXACTLY uniformly.
    * The inner mod keeps the product well inside 63 bits. */
  def bucket(id: Column): Column =
    pmod(pmod(id, lit(10000L)) * lit(2654435761L), lit(10000L))

  /** A NULL id has no bucket, so every operator here would misroute it
    * SILENTLY — the filters drop the row (null comparison), while split's
    * when-chain would dump it in the last split. Fail loudly in-plan
    * instead (assert_true is NULL for valid rows, so the filter keeps them
    * all), same discipline as FfillBfill's order-key guard. */
  private[operators] def requireIds(df: DataFrame, idCol: String): DataFrame =
    df.filter(assert_true(col(idCol).isNotNull,
      lit(s"Sampling: id column '$idCol' contains NULLs — a null id has no " +
        "deterministic bucket; drop or impute the id first")).isNull)

  /** Keep rows whose bucket falls under `fraction` (resolution 0.01%). */
  def uniform(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    requireIds(df, idCol).filter(bucket(col(idCol)) < math.round(fraction * 10000))
  }

  /** Train/val/test assignment: adds `outCol` ('train'/'val'/'test') from
    * the same deterministic bucket, so the split is disjoint, exhaustive,
    * reproducible from ids alone, and consistent with [[uniform]] — a pure
    * projection (no shuffle, no RNG), the only safe way to split a 100 TB
    * corpus whose rows must never migrate between splits across reruns. */
  def split(df: DataFrame, idCol: String, trainFrac: Double, valFrac: Double,
            outCol: String = "split"): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"fractions must be non-negative and sum to at most 1, got $trainFrac + $valFrac")
    val b = bucket(col(idCol))
    requireIds(df, idCol).withColumn(outCol,
      when(b < math.round(trainFrac * 10000), lit("train"))
        .when(b < math.round((trainFrac + valFrac) * 10000), lit("val"))
        .otherwise(lit("test")))
  }

  /** Stratified sample: per-stratum inclusion fractions (strata absent from
    * the map fall back to `defaultFraction`). Deterministic in the id. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double],
                 defaultFraction: Double = 0.0): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "all fractions must be in [0,1]")
    val thresh = fractions.foldLeft(lit(math.round(defaultFraction * 10000))) {
      case (acc, (k, f)) =>
        when(col(stratumCol) === k, lit(math.round(f * 10000))).otherwise(acc)
    }
    requireIds(df, idCol).filter(bucket(col(idCol)) < thresh)
  }

  /** Deterministic fixed-size sample per stratum — the reservoir-sampling
    * use case (exactly k rows per group, uniform over the group) without
    * reservoir RNG state: the k rows with the SMALLEST scrambled key win,
    * which is a uniform k-subset under the same Mersenne-prime scramble
    * [[shuffledShards]] uses (bijective, uncorrelated with id order) and
    * re-derivable from ids alone in any engine. Fraction sampling can't
    * give per-group exactness ([[stratified]] yields binomial counts);
    * this face is what an eval-set builder ("exactly 1000 docs per
    * source") needs.
    *
    * Scale shape: ONE shuffle partitioned by stratum; the per-stratum
    * window sorts each stratum in one task — fine for strata up to a few
    * hundred million rows (a sort, not a collect). For monster strata the
    * heap-aggregate form (graft_topk over the scrambled key) bounds state
    * at k per stratum; this face keeps the window form because its output
    * is the full sampled ROW, not a k-array. */
  def fixedPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val m = 2147483647L
    val key = pmod(pmod(col(idCol), lit(m)) * lit(2654435761L), lit(m))
    val w = Window.partitionBy(stratumCol).orderBy(col("_key"), col(idCol))
    requireIds(df, idCol).withColumn("_key", key)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_key", "_rn")
  }

  /** Deterministic shuffled sharding: assign every row a shard and a
    * pseudo-random position WITHIN its shard — the reproducible global
    * shuffle a training-export needs (epoch order must not depend on
    * partitioning, reruns, or engine). Shard = `id mod nShards` (EXACTLY
    * even on dense ids, and consecutive ids stripe across shards); the
    * within-shard order comes from a multiplicative scramble modulo the
    * Mersenne prime 2^31−1 — a bijection on ~2.1e9 residues, so the order
    * is uncorrelated with id order at any realistic shard size (the
    * sampling bucket's 10^4-residue scramble would collapse to ~10^4/N
    * id-ascending runs per shard). Fully reproducible from ids alone — no
    * RNG state; the per-shard `row_number` is the only shuffle.
    *
    * Scale contract: each shard's position numbering runs in ONE task, so
    * `nShards` must scale with the corpus — pick it like an output file
    * count (shard ≈ 100 MB–1 GB), thousands at 100 TB, exactly as a real
    * sharded export would. A handful of shards over a huge corpus is
    * wrong usage of this operator, not a plan surprise. */
  def shuffledShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    // 2654435761 · (2^31 − 1) < 2^63: the product never overflows BIGINT,
    // so the identical expression is exact in any engine
    val m = 2147483647L
    val key = pmod(pmod(col(idCol), lit(m)) * lit(2654435761L), lit(m))
    val w = Window.partitionBy("shard").orderBy(col("_key"), col(idCol))
    requireIds(df, idCol).withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("_key", key)
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .drop("_key")
  }
}
