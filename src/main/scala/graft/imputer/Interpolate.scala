package graft.imputer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Distributed linear interpolation over a global ordering — the pandas
  * `DataFrame.interpolate(method='linear')` sibling of [[FfillBfill]]:
  * a missing `y` between observed neighbors (x0,y0) and (x1,y1) becomes
  * `y0 + (y1−y0)·(x−x0)/(x1−x0)`; leading gaps take the first observed
  * value, trailing gaps the last (pandas' limit_direction='both' edges).
  *
  * Same two-pass shape as ffill: range-partition by the order key, reduce
  * each partition's FIRST and LAST observed (x,y) pair (a #partitions-row
  * collect), compute per-partition carry-in pairs from both directions on
  * the driver, then finish each partition independently. The only global
  * exchange is the range shuffle. Pass 2 buffers one partition's rows to
  * scan them in both directions — the standard memory posture for sorted
  * range operators (size partitions via `spark.sql.files.maxPartitionBytes`
  * / `numPartitions`).
  */
object Interpolate {

  /** @param orderCol numeric, unique, non-null global order key (the x axis)
    * @param valueCol numeric column to interpolate
    * @param outCol   appended output column (double) */
  def linear1d(df: DataFrame, orderCol: String, valueCol: String, outCol: String,
               numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(parts, col(orderCol).asc)
      .sortWithinPartitions(col(orderCol).asc)
    val schema = sorted.schema
    val xIdx = schema.fieldIndex(orderCol)
    val yIdx = schema.fieldIndex(valueCol)
    // Both passes key carry-ins by PARTITION INDEX, so they must see the
    // exact same range boundaries and data: localCheckpoint pins the sampled
    // range shuffle across the two jobs (as KnnImpute does) — without it a
    // nondeterministic upstream (sample(), float aggs) could re-sample
    // different boundaries in pass 2 and silently misapply the carry-ins.
    // It also runs the caller's lineage once, not twice.
    val rdd = sorted.rdd.localCheckpoint()

    def num(v: Any): Double = v.asInstanceOf[Number].doubleValue()

    // Pass 1: first/last observed (x, y) per partition (tiny).
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
        var first: (Double, Double) = null
        var last: (Double, Double) = null
        it.foreach { row =>
          if (!row.isNullAt(yIdx)) {
            val p = (num(row.get(xIdx)), num(row.get(yIdx)))
            if (first == null) first = p
            last = p
          }
        }
        Iterator.single((pid, first, last))
      }.collect().sortBy(_._1)

    // carry-in from earlier partitions (last observed pair before p) and
    // from later ones (first observed pair after p)
    val n = stats.length
    val prior = Array.fill[(Double, Double)](n)(null)
    val next = Array.fill[(Double, Double)](n)(null)
    for (p <- 1 until n)
      prior(p) = if (stats(p - 1)._3 != null) stats(p - 1)._3 else prior(p - 1)
    for (p <- (n - 2) to 0 by -1)
      next(p) = if (stats(p + 1)._2 != null) stats(p + 1)._2 else next(p + 1)
    val bc = spark.sparkContext.broadcast((prior, next))

    // Pass 2: per-partition bidirectional scan over the buffered rows.
    val outSchema = StructType(schema.fields :+ StructField(outCol, DoubleType, true))
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (priorAll, nextAll) = bc.value
      val rows = it.toArray
      val m = rows.length
      val priors = new Array[(Double, Double)](m)
      val nexts = new Array[(Double, Double)](m)
      var run = priorAll(pid)
      var i = 0
      while (i < m) {
        if (!rows(i).isNullAt(yIdx)) run = (num(rows(i).get(xIdx)), num(rows(i).get(yIdx)))
        priors(i) = run
        i += 1
      }
      run = nextAll(pid)
      i = m - 1
      while (i >= 0) {
        if (!rows(i).isNullAt(yIdx)) run = (num(rows(i).get(xIdx)), num(rows(i).get(yIdx)))
        nexts(i) = run
        i -= 1
      }
      rows.iterator.zipWithIndex.map { case (row, j) =>
        val v: Any =
          if (!row.isNullAt(yIdx)) num(row.get(yIdx))
          else (priors(j), nexts(j)) match {
            case (null, null) => null
            case (null, (_, y1)) => y1
            case ((_, y0), null) => y0
            case ((x0, y0), (x1, y1)) =>
              y0 + (y1 - y0) * (num(row.get(xIdx)) - x0) / (x1 - x0)
          }
        Row.fromSeq(row.toSeq :+ v)
      }
    }
    spark.createDataFrame(filled, outSchema)
  }
}
