package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing for training-data pipelines: concatenate the
  * corpus in a deterministic global order (the id) and chunk the token
  * stream into fixed-budget windows. Each document gets its global token
  * offset, the window (pack) its first token lands in, and how many windows
  * it spans — the bookkeeping a loader needs to emit fixed-length training
  * sequences from variable-length documents.
  *
  * The global running sum is NOT a single-task window (`ORDER BY id` with no
  * partition collapses to one task — a non-starter at 100 TB). Two-pass
  * prefix-offset algorithm, same shape as [[graft.imputer.FfillBfill]]:
  * range-partition by the order key, reduce per-partition token sums (a
  * #partitions-row collect), broadcast the prefix offsets back, and let a
  * per-partition window — parallel over partitions — finish the cumsum.
  */
object Packing {

  /** @param tokensCol token count expression (e.g. `size(split(text, " "))`);
    *                  NULL counts (e.g. from NULL text) pack as 0 tokens
    * @param budget    tokens per context window */
  def packWindows(df: DataFrame, idCol: String, tokensCol: Column, budget: Int,
                  numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // localCheckpoint pins the sampled range boundaries so the stats job and
    // the final job see identical partition ids
    val base = df.select(col(idCol), coalesce(tokensCol.cast("bigint"), lit(0L)).as("n_tokens"))
      .repartitionByRange(parts, col(idCol).asc)
      .sortWithinPartitions(col(idCol).asc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // per-partition totals → prefix offsets (tiny: #partitions rows)
    val sums = base.groupBy("_pid").agg(sum("n_tokens").as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offMap: Map[Int, Long] = {
      var acc = 0L
      sums.map { case (pid, s) => val o = pid -> acc; acc += s; o }.toMap
    }
    val w = Window.partitionBy("_pid").orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offCol =
      if (offMap.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offMap), col("_pid")), lit(0L))
    base
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offCol)
      .withColumn("pack_id", expr(s"tok_start div $budget"))
      .withColumn("n_packs",
        expr(s"(tok_start + greatest(n_tokens - 1, 0L)) div $budget") - col("pack_id") + 1)
      .select(col(idCol), col("n_tokens"), col("tok_start"), col("pack_id"), col("n_packs"))
  }
}
