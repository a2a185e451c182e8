package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting is
  * the explicit fallback when a handful of keys dominate (the classic
  * power-law user_id / null-key cases) or when AQE can't split (e.g.
  * aggregations). `saltedJoin` replicates the (small) right side `salt`
  * ways and scatters the left side across the replicas, so one hot key
  * spreads over `salt` reducers instead of one straggler task.
  */
object SkewTools {

  /** Inner equi-join with an exploded right side. `salt` multiplies the
    * right side's row count — keep it ≤ ~64 and the right side the smaller
    * relation. Deterministic scatter: left salt = pmod(hash of key & a
    * per-row uniquifier), so results are stable across retries. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, leftUniquifier: String): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(hash(col(key), col(leftUniquifier)), lit(salt)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r.withColumnRenamed(key, s"_r_$key"),
        l("_salt") === r("_salt") && l(key) === col(s"_r_$key"))
      .drop("_salt", s"_r_$key")
  }

  /** Per-key frequency sketch to decide whether salting is warranted:
    * returns keys whose row count exceeds `threshold`. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).filter(col("n") > threshold)

  /** Scale-invariant skew detection: keys whose frequency exceeds `factor`×
    * the mean key frequency. The threshold is self-calibrating (no absolute
    * count to re-tune per data size), and the comparison `n·k > factor·Σn`
    * runs in decimal(38,0) — in BIGINT, a hot key on a 1e11-row corpus
    * with 1e10 keys overflows n·k PAST Long.MaxValue and would silently
    * unflag exactly the hottest keys. One count shuffle plus a broadcast
    * 1-row aggregate, valid at any scale. Feed the result to
    * [[saltedJoin]]. */
  def hotKeysRelative(df: DataFrame, key: String, factor: Long = 3L): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum(col("n")).as("_tot"), count(lit(1)).as("_k"))
    val dec = "decimal(38,0)"
    counts.crossJoin(broadcast(stats))
      .filter(col("n").cast(dec) * col("_k").cast(dec) >
        lit(factor).cast(dec) * col("_tot").cast(dec))
      .select(col(key), col("n"))
  }
}
