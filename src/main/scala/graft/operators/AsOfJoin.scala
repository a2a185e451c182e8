package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key (SQL `ASOF LEFT JOIN`).
  *
  * Implementation is the union+window algorithm — tag both sides, union,
  * and take `last(right_payload, ignoreNulls)` over a window partitioned by
  * key and ordered by (time, tag) with right rows sorting before left rows
  * at equal timestamps (inclusive match). ONE shuffle on the join key; no
  * per-row range probe, no broadcast requirement on either side — the shape
  * that scales when both sides are large.
  */
object AsOfJoin {

  /** @param left      probe side (rows preserved, left-join semantics)
    * @param right     reference side; at most one row per (key, time) —
    *                  pre-aggregate (e.g. `max_by`) if needed
    * @param leftKey   join key column on `left`
    * @param rightKey  join key column on `right`
    * @param leftTime  ordering column on `left` (numeric/comparable)
    * @param rightTime ordering column on `right`
    * @param payload   columns of `right` to carry; emitted as `asof_<col>`
    */
  def latestPrior(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_tag"), struct(payload.map(col): _*).as("_payload"))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy("_k").orderBy("_t", "_tag")
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("_match", last("_payload", ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    payload.foldLeft(matched) { (d, c) =>
        d.withColumn(s"asof_$c", col("_match").getField(c))
      }
      .select((leftCols.map(col) ++ payload.map(c => col(s"asof_$c"))): _*)
  }

  /** Nearest-in-time variant: for each left row, the right row minimizing
    * |rightTime − leftTime| on the same key; equal-distance ties (and exact
    * time matches) resolve to the PRIOR row. Same union+window shape as
    * [[latestPrior]], with a second (mirror) window for the first following
    * row — still ONE shuffle on the join key, both sides arbitrarily large.
    * `right` must have at most one row per (key, time). Emitted columns:
    * `near_<col>`. */
  def nearest(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_tag"),
      struct(col(rightTime).as("_rt") +: payload.map(col): _*).as("_payload"))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows tag-sort before left at equal time → equal-time rows land
    // in the prior window (inclusive), never the following one
    val ord = Window.partitionBy("_k").orderBy("_t", "_tag")
    val wPrior = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
    val prior = col("_prior"); val next = col("_next")
    val matched = unioned
      .withColumn("_prior", last("_payload", ignoreNulls = true).over(wPrior))
      .withColumn("_next", first("_payload", ignoreNulls = true).over(wNext))
      .filter(col("_tag") === 1)
      .withColumn("_match",
        when(prior.isNull, next)
          .when(next.isNull, prior)
          .when(col("_t") - prior.getField("_rt") <= next.getField("_rt") - col("_t"), prior)
          .otherwise(next))
    payload.foldLeft(matched) { (d, c) =>
        d.withColumn(s"near_$c", col("_match").getField(c))
      }
      .select((leftCols.map(col) ++ payload.map(c => col(s"near_$c"))): _*)
  }
}
