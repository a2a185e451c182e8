package graft.imputer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 1-d KNN imputation (sklearn `KNNImputer(n_neighbors=k)` on a single
  * predictor): a missing `y` is filled with the mean of the `y` values of
  * the k observed rows nearest in `x`, ties broken deterministically by
  * (distance, x, id).
  *
  * Distributed shape — NOT a cross join:
  *  0. TIE PRUNING: within each (partition, x) group only the k
  *     smallest-id observed rows survive as candidates — the (dist, x, id)
  *     order can never select a row past the first k of an equal-x run, so
  *     the pruned set provably contains the true top-k, and no later step
  *     has to reason about unbounded tie runs.
  *  1. range-partition by (x, id); within each partition the PRUNED
  *     observed rows get a dense index (`row_number`) and every missing
  *     row an anchor (running count of pruned observed rows at-or-before);
  *  2. within-partition candidates are an equality join on
  *     (partition, index) after exploding the 2k² index offsets around the
  *     anchor — k² per side because the top-k can touch up to k distinct x
  *     values and the tie-break may need ALL ≤k pruned rows of each (the
  *     smallest ids of a group are positionally FARTHEST from an anchor
  *     below it, so a ±k window would clip exactly the rows the tie-break
  *     prefers). A hash join on a fine-grained key, never a range join.
  *  3. cross-boundary exactness: each partition contributes its first-k²
  *     and last-k² pruned rows to a tiny broadcast edge pool (2·k²·P
  *     rows). Any out-of-partition true neighbor lies in that pool: a
  *     deeper row has ≥k strictly-closer distinct-x… rows between it and
  *     the boundary within its own partition. Edge candidates are pruned
  *     by the k-th-best within-partition distance before the ranking, so
  *     the pool contributes O(1) surviving rows per missing row.
  *  4. final rank is a window partitioned by the missing-row id (high
  *     cardinality → full parallelism) over ≤ k² + pool survivors rows,
  *     ordered by the full (distance, x, id) tie-break.
  *
  * The neighbor mean is computed in exact integer units (`y · 10^scale`
  * rounded to a long — the integer-cents oracle discipline), summed as
  * BIGINT (order-free), one double division at the end.
  */
object KnnImpute {

  /** @param xCol   numeric predictor (cast to double; must be non-null)
    * @param yCol   column to impute (numeric)
    * @param outCol name of the imputed output column
    * @param k      neighbor count
    * @param scale  fixed-point digits for the exact neighbor mean
    * @return (idCol, outCol): observed rows keep y, missing rows get the
    *         k-nearest-neighbor mean rounded to one unit */
  def impute1d(df: DataFrame, idCol: String, xCol: Column, yCol: String,
               outCol: String, k: Int, scale: Int = 2,
               numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // the cross-boundary edge pool broadcasts 2·k²·partitions rows (first/
    // last k² pruned rows per partition); past ~2M rows that broadcast would
    // OOM executors rather than degrade — fail with the actionable knobs
    require(2L * k * k * parts <= 2000000L,
      s"impute1d: edge pool 2·k²·partitions = ${2L * k * k * parts} rows " +
        s"(k=$k, partitions=$parts) exceeds the ~2M-row broadcast bound — " +
        "reduce k or numPartitions (the pool grows with BOTH)")
    val pow = math.pow(10, scale)

    val kk = k * k // candidate radius: ≤k distinct x values × ≤k tied rows

    val base0 = df
      .select(col(idCol).as("_id"), xCol.cast("double").as("_x"),
        col(yCol).cast("double").as("_y"))
      .repartitionByRange(parts, col("_x"), col("_id"))
      .sortWithinPartitions("_x", "_id")
      .withColumn("_pid", spark_partition_id())
      .withColumn("_yc", floor((col("_y") * pow) + lit(0.5)).cast("bigint"))
    // tie pruning: rank observed rows within their (partition, x) group by
    // id; only the first k are selectable under the (dist, x, id) order
    val wx = Window.partitionBy("_pid", "_x").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = base0
      .withColumn("_okeep", col("_y").isNotNull &&
        sum(when(col("_y").isNotNull, 1L).otherwise(0L)).over(wx) <= k)
      .localCheckpoint() // pin the sampled range boundaries across reuses

    val wseq = Window.partitionBy("_pid").orderBy(col("_x"), col("_id"))
    val obs = base.filter(col("_okeep"))
      .withColumn("_oseq", row_number().over(wseq).cast("bigint"))
      .select("_pid", "_oseq", "_id", "_x", "_yc")
      .localCheckpoint() // reused as join target and edge pool

    // anchor = index of the last PRUNED observed row at-or-before the miss
    val wcum = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val miss = base
      .withColumn("_anchor", sum(when(col("_okeep"), 1L).otherwise(0L)).over(wcum))
      .filter(col("_y").isNull)
      .select(col("_pid"), col("_id").as("_mid"), col("_x").as("_mx"), col("_anchor"))

    val candCols = Seq(col("_mid"), col("_mx"), col("_cid"), col("_cx"), col("_cyc"))
    val dist = abs(col("_cx") - col("_mx"))

    // within-partition ±k² pruned neighbors, top-k ranked
    val within = miss
      .withColumn("_cseq", explode(sequence(col("_anchor") - (kk - 1), col("_anchor") + kk)))
      .join(obs.select(col("_pid"), col("_oseq").as("_cseq"), col("_id").as("_cid"),
        col("_x").as("_cx"), col("_yc").as("_cyc")), Seq("_pid", "_cseq"))
      .select(candCols: _*)
    val wwr = Window.partitionBy("_mid").orderBy(dist, col("_cx"), col("_cid"))
    val withinRk = within.withColumn("_wrk", row_number().over(wwr))

    // search-radius bound: the k-th best within-partition distance caps any
    // admissible cross-boundary candidate (ties kept by <=, rank decides)
    val bound = withinRk.groupBy("_mid").agg(
      max(when(col("_wrk") <= k, dist)).as("_dmax"),
      count(lit(1)).as("_wcnt"))
    val missB = miss.join(bound, Seq("_mid"), "left")

    val wdesc = Window.partitionBy("_pid").orderBy(col("_x").desc, col("_id").desc)
    val edges = obs
      .withColumn("_rdesc", row_number().over(wdesc))
      .filter(col("_oseq") <= kk || col("_rdesc") <= kk)
      .select(col("_pid").as("_epid"), col("_id").as("_cid"),
        col("_x").as("_cx"), col("_yc").as("_cyc"))
    val crossCand = missB.join(broadcast(edges),
        col("_epid") =!= col("_pid") &&
          // all-missing partition → no bound row (null _wcnt): keep all edges
          (col("_wcnt").isNull || col("_wcnt") < k || dist <= col("_dmax")))
      .select(candCols: _*)

    val wrank = Window.partitionBy("_mid").orderBy(dist, col("_cx"), col("_cid"))
    val knn = withinRk.filter(col("_wrk") <= k).select(candCols: _*)
      .unionByName(crossCand)
      .withColumn("_rk", row_number().over(wrank)).filter(col("_rk") <= k)
      .groupBy("_mid")
      .agg((floor((sum("_cyc").cast("double") / count(lit(1))) + lit(0.5)).cast("bigint")
        .cast("double") / pow).as("_knn"))

    df.join(knn, col(idCol) === col("_mid"), "left")
      .select(col(idCol), coalesce(col(yCol), col("_knn")).as(outCol))
  }
}
