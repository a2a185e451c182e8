package graft.imputer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed forward/backward fill over a global ordering — the reference's
  * `fillna(method='ffill')` / `'bfill'` hierarchical impute
  * (scikit_learn_imputer.py:157-158).
  *
  * A naive Spark translation is `last(col, ignoreNulls) OVER (ORDER BY id)`,
  * which collapses the whole table into ONE task — a non-starter at 100 TB.
  * This implementation is the scalable two-pass algorithm:
  *
  *   1. range-repartition by the order key and sort within partitions
  *      (partition p holds a contiguous, sorted key range);
  *   2. pass 1: per partition, record the last (ffill) / first (bfill)
  *      non-null value of each target column — a #partitions-row reduction
  *      collected to the driver;
  *   3. compute, for each partition, the carry-in value from preceding
  *      (ffill) / following (bfill) partitions — O(#partitions) driver work;
  *   4. pass 2: stream each partition once, filling nulls from the running
  *      last-seen value seeded with the carry-in.
  *
  * Results are identical to the single-window formulation (verified against
  * the DuckDB `IGNORE NULLS` window oracle) while every stage stays
  * embarrassingly parallel. Requires `orderCol` to be a unique key.
  */
object FfillBfill {

  /** Forward-fill `valueCols` in the global order of `orderCol`. */
  def ffill(df: DataFrame, orderCol: String, valueCols: Seq[String], numPartitions: Int = 0): DataFrame =
    fill(df, orderCol, valueCols, numPartitions, backward = false)

  /** Backward-fill `valueCols` in the global order of `orderCol`. */
  def bfill(df: DataFrame, orderCol: String, valueCols: Seq[String], numPartitions: Int = 0): DataFrame =
    fill(df, orderCol, valueCols, numPartitions, backward = true)

  /** ffill then bfill — the reference's hierarchical impute — in ONE
    * range-shuffle instead of two. Key observation: after a forward fill the
    * only remaining nulls are the leading run before a column's FIRST
    * non-null value, and bfill fills exactly those cells with that first
    * value. So pass 1 records each partition's first AND last non-null,
    * pass 2 forward-fills with the usual carry-in and falls back to the
    * global first value when no preceding value exists — identical output
    * to bfill(ffill(df)) (covered by the DuckDB IGNORE NULLS window oracle)
    * at half the shuffles. */
  def ffillThenBfill(df: DataFrame, orderCol: String, valueCols: Seq[String], numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(parts, col(orderCol).asc)
      .sortWithinPartitions(col(orderCol).asc)
    val schema = sorted.schema
    val valueIdx = valueCols.map(c => schema.fieldIndex(c)).toArray
    val rdd = sorted.rdd

    // Pass 1: (first, last) non-null per column per partition (tiny).
    val stats: Array[(Int, (Array[Any], Array[Any]))] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val first = Array.fill[Any](valueIdx.length)(null)
        val last = Array.fill[Any](valueIdx.length)(null)
        it.foreach { row =>
          var i = 0
          while (i < valueIdx.length) {
            val v = row.get(valueIdx(i))
            if (v != null) { if (first(i) == null) first(i) = v; last(i) = v }
            i += 1
          }
        }
        Iterator.single((pid, (first, last)))
      }
      .collect()
    val byPid = stats.sortBy(_._1).map(_._2)
    // ffill carry-in: last non-null from any earlier partition.
    val carry = Array.ofDim[Any](byPid.length, valueIdx.length)
    for (p <- byPid.indices; i <- valueIdx.indices)
      carry(p)(i) =
        if (p == 0) null
        else if (byPid(p - 1)._2(i) != null) byPid(p - 1)._2(i)
        else carry(p - 1)(i)
    // bfill fallback: the globally first non-null value of each column.
    val globalFirst: Array[Any] = valueIdx.indices.map { i =>
      byPid.iterator.map(_._1(i)).find(_ != null).orNull
    }.toArray
    val carryB = spark.sparkContext.broadcast((carry, globalFirst))

    // Pass 2: forward-fill; a null with no preceding value takes the global
    // first (exactly the cells bfill-after-ffill would touch).
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (carryAll, gFirst) = carryB.value
      val running = carryAll(pid).clone()
      it.map { row =>
        val arr = row.toSeq.toArray
        var i = 0
        while (i < valueIdx.length) {
          val v = arr(valueIdx(i))
          if (v != null) running(i) = v
          else arr(valueIdx(i)) = if (running(i) != null) running(i) else gFirst(i)
          i += 1
        }
        Row.fromSeq(arr.toIndexedSeq)
      }
    }
    spark.createDataFrame(filled, schema)
  }

  /** Group-scoped ffill→bfill (e.g. per user / per series): plain windows
    * partitioned by the group key — already parallel over groups, no
    * two-pass machinery needed. */
  def ffillThenBfillWithinGroups(df: DataFrame, groupCol: String, orderCol: String,
                                 valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wf = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wb = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(0, Window.unboundedFollowing)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(wf))
        .withColumn(c, first(col(c), ignoreNulls = true).over(wb))
    }
  }

  private def fill(df: DataFrame, orderCol: String, valueCols: Seq[String],
                   numPartitions: Int, backward: Boolean): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortCol = if (backward) col(orderCol).desc else col(orderCol).asc
    val sorted = df.repartitionByRange(parts, sortCol).sortWithinPartitions(sortCol)

    val schema = sorted.schema
    val valueIdx = valueCols.map(c => schema.fieldIndex(c)).toArray
    // NOT cached: both passes share the repartitionByRange lineage, so the
    // second job reuses the shuffle files (map stage skipped) — disk-backed
    // reuse without pinning executor memory across unrelated queries.
    val rdd = sorted.rdd

    // Pass 1: last non-null per column per partition (tiny: parts × cols).
    val tails: Array[(Int, Array[Any])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val last = Array.fill[Any](valueIdx.length)(null)
        it.foreach { row =>
          var i = 0
          while (i < valueIdx.length) {
            val v = row.get(valueIdx(i))
            if (v != null) last(i) = v
            i += 1
          }
        }
        Iterator.single((pid, last))
      }
      .collect()

    // Carry-in per partition: last non-null from any earlier partition.
    val byPid = tails.sortBy(_._1).map(_._2)
    val carry = Array.ofDim[Any](byPid.length, valueIdx.length)
    for (p <- byPid.indices; i <- valueIdx.indices)
      carry(p)(i) =
        if (p == 0) null
        else if (byPid(p - 1)(i) != null) byPid(p - 1)(i)
        else carry(p - 1)(i)
    val carryB = spark.sparkContext.broadcast(carry)

    // Pass 2: stream each partition, fill from the running value.
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val running = carryB.value(pid).clone()
      it.map { row =>
        val arr = row.toSeq.toArray
        var i = 0
        while (i < valueIdx.length) {
          val v = arr(valueIdx(i))
          if (v != null) running(i) = v else arr(valueIdx(i)) = running(i)
          i += 1
        }
        Row.fromSeq(arr.toIndexedSeq)
      }
    }
    spark.createDataFrame(filled, schema)
  }
}
