package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus source-mixing for training-data pipelines: deterministically
  * down-sample each source so the KEPT corpus matches a target mixture
  * (the "domain weights" step of assembling a training set from web /
  * books / code / reference crawls at different qualities).
  *
  * Given target weight w_s per source and observed count n_s, every source
  * gets keep-rate `(w_s/n_s) / max_t(w_t/n_t)` — the unique scaling where
  * the best-represented-relative-to-target source keeps everything (no
  * upsampling) and kept counts are proportional to the target weights
  * whenever feasible.
  *
  * Shape at scale: source counts are one tiny aggregation (|sources| rows);
  * rates broadcast back; the sample itself is a pure FILTER on the
  * [[Sampling.bucket]] scramble — no shuffle of the corpus, pushdown-
  * friendly, reproducible from the data alone (no RNG state).
  */
object CorpusMix {

  /** Rows of `df` kept under the target mixture `weights` (source → target
    * weight). Sources absent from the map get weight 0 and are dropped. */
  def resample(df: DataFrame, idCol: String, sourceCol: String,
               weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val rates = df.groupBy(sourceCol).agg(count(lit(1)).as("_n"))
      .select(col(sourceCol), (w / col("_n")).as("_r"))
    val maxRate = rates.agg(max(col("_r")).as("_rmax"))
    val thresholds = rates.crossJoin(broadcast(maxRate))
      .select(col(sourceCol),
        floor((col("_r") / col("_rmax") * 10000.0) + lit(0.5)).cast("bigint").as("_thresh"))
    Sampling.requireIds(df, idCol).join(broadcast(thresholds), Seq(sourceCol))
      .filter(Sampling.bucket(col(idCol)) < col("_thresh"))
      .select(col(idCol), col(sourceCol))
  }
}
