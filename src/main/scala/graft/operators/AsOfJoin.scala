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
}
