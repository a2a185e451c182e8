package graft.imputer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Distributed forward/backward fill over a global ordering — the reference's
  * `fillna(method='ffill')` / `'bfill'` hierarchical impute
  * (scikit_learn_imputer.py:157-158).
  *
  * A naive Spark translation is `last(col, ignoreNulls) OVER (ORDER BY id)`,
  * which collapses the whole table into ONE task — a non-starter at 100 TB.
  * This implementation is the scalable two-pass algorithm, expressed entirely
  * in Catalyst (no RDD row surgery — everything except the per-bucket window
  * stays inside whole-stage codegen):
  *
  *   1. ONE cheap narrow pass computes min/max of the order key; the key
  *      range is split into `16 × numPartitions` FINE uniform buckets
  *      (contiguous by construction, no sampling job needed);
  *   2. stats pass: per fine bucket, the row count and first/last non-null
  *      value of each target column via `min_by`/`max_by` — map-side partial
  *      aggregation, so the shuffle carries ≤ fineBuckets × mappers tiny
  *      rows; collected to the driver (≤ 16 × numPartitions rows);
  *   3. the driver coalesces fine buckets into `numPartitions` contiguous
  *      COARSE runs of ~equal exact row count (skew-balanced up to fine-
  *      bucket granularity) and computes each run's carry-in — the last
  *      (ffill) / first (bfill) non-null from buckets outside the run;
  *   4. fill pass: the (fine → coarse, carry…) table — tiny — is broadcast-
  *      joined on, then per column
  *      `coalesce(last(c, ignoreNulls) OVER (PARTITION BY coarse ORDER BY
  *      key ROWS UNBOUNDED PRECEDING), carry, globalFirst)` — ONE data
  *      shuffle total.
  *
  * Results are identical to the single-window formulation (verified against
  * the DuckDB `IGNORE NULLS` window oracle) while every stage stays
  * embarrassingly parallel. `orderCol` must be numeric / timestamp / date —
  * enforced loudly, because a silently-cast string key would either produce
  * lexicographic-vs-numeric ordering disagreements between the bucket
  * boundaries and the window sort (wrong carries) or cast to all-NULL and
  * return the input unfilled. Keys beyond 2^53 lose bucket precision, not
  * correctness — buckets only need to be contiguous, not exact.
  *
  * The algorithm runs THREE jobs over the input (key range, bucket stats,
  * fill). The first two are narrow agg-only passes that column-prune to
  * `orderCol` (+ `valueCols`), so for scan-backed inputs the replays are
  * cheap pruned scans and no materialization is forced on the caller. When
  * the upstream lineage is expensive (joins, imputers), pass
  * `reuseInput = true` to localCheckpoint the input once and run all three
  * passes against the materialized copy (cluster path: the caller persists
  * to reliable storage instead).
  */
object FfillBfill {

  private val FineFactor = 16

  /** Forward-fill `valueCols` in the global order of `orderCol`. */
  def ffill(df: DataFrame, orderCol: String, valueCols: Seq[String], numPartitions: Int = 0,
            reuseInput: Boolean = false): DataFrame =
    fill(df, orderCol, valueCols, numPartitions, backward = false, bfillFallback = false, reuseInput)

  /** Backward-fill `valueCols` in the global order of `orderCol`. */
  def bfill(df: DataFrame, orderCol: String, valueCols: Seq[String], numPartitions: Int = 0,
            reuseInput: Boolean = false): DataFrame =
    fill(df, orderCol, valueCols, numPartitions, backward = true, bfillFallback = false, reuseInput)

  /** ffill then bfill — the reference's hierarchical impute — in ONE data
    * shuffle instead of two. Key observation: after a forward fill the only
    * remaining nulls are the leading run before a column's FIRST non-null
    * value, and bfill fills exactly those cells with that first value. So the
    * fill is `coalesce(running last, carry-in, global first)` — identical
    * output to bfill(ffill(df)) (covered by the DuckDB IGNORE NULLS window
    * oracle) at half the shuffles. */
  def ffillThenBfill(df: DataFrame, orderCol: String, valueCols: Seq[String], numPartitions: Int = 0,
                     reuseInput: Boolean = false): DataFrame =
    fill(df, orderCol, valueCols, numPartitions, backward = false, bfillFallback = true, reuseInput)

  /** Group-scoped ffill→bfill (e.g. per user / per series): plain windows
    * partitioned by the group key — already parallel over groups, no
    * two-pass machinery needed. */
  def ffillThenBfillWithinGroups(df: DataFrame, groupCol: String, orderCol: String,
                                 valueCols: Seq[String]): DataFrame = {
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
                   numPartitions: Int, backward: Boolean, bfillFallback: Boolean,
                   reuseInput: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val schema = df.schema
    val fields = valueCols.map(c => schema(schema.fieldIndex(c)))

    // Bucket boundaries come from cast(orderCol as double) and the window
    // sorts on the raw column — those two orders only agree for genuinely
    // numeric/chronological keys. A string key would either cast to all-NULL
    // (input returned unfilled, silently) or sort lexicographically against
    // numeric buckets (wrong carries, silently). Fail loudly instead.
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    schema(schema.fieldIndex(orderCol)).dataType match {
      case _: NumericType | TimestampType | DateType => ()
      case dt => throw new IllegalArgumentException(
        s"FfillBfill: order column '$orderCol' has type ${dt.simpleString} — " +
          "the global fill order needs a numeric, timestamp, or date key " +
          "(string keys would bucket numerically but sort lexicographically). " +
          "Cast or dense_rank() the key first.")
    }

    // A NULL order key has no position in the fill order — and would
    // otherwise bucket to NULL and silently VANISH in the carry join. Fail
    // loudly, in-plan (assert_true is NULL for valid rows, so the filter
    // keeps them all; the min/max pass below already fires it).
    val guarded0 = df.filter(assert_true(col(orderCol).isNotNull,
      lit(s"FfillBfill: order column '$orderCol' contains NULLs — the fill " +
        "order is undefined; drop or impute the key first")).isNull)
    // Opt-in: materialize once instead of replaying expensive upstream
    // lineage in each of the three passes (see object scaladoc).
    val guarded = if (reuseInput) guarded0.localCheckpoint() else guarded0

    // 1. Key range (+ row count: the empty-input test) from one cheap,
    // column-pruned pass. The count — not a NULL min — keys the early
    // return, so the decision is independent of how the key casts.
    // (date has no direct numeric cast; route it through timestamp — a
    // monotonic map, which is all bucketing needs.)
    val keyD = schema(schema.fieldIndex(orderCol)).dataType match {
      case DateType => col(orderCol).cast("timestamp").cast("double")
      case _        => col(orderCol).cast("double")
    }
    val mm = guarded.agg(min(keyD).as("lo"), max(keyD).as("hi"),
      count(lit(1)).as("n")).head()
    if (mm.getLong(2) == 0L) return guarded // empty input: nothing to fill
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val fineN = math.max(1, FineFactor * parts)
    val span = hi - lo
    val fineCol: Column =
      if (span == 0d) lit(0)
      else least(lit(fineN - 1), greatest(lit(0),
        floor((keyD - lit(lo)) / lit(span) * lit(fineN)).cast("int")))

    // 2. Per-fine-bucket count + first/last non-null of each column.
    // min_by/max_by skip rows whose ordering expression is null, so
    // `when(c.isNotNull, key)` restricts them to non-null cells. Map-side
    // partials make the shuffle ≤ fineN × mappers rows regardless of size.
    val ord = col(orderCol)
    val statAggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(min_by(c, when(c.isNotNull, ord)).as(s"__first_${f.name}"),
          max_by(c, when(c.isNotNull, ord)).as(s"__last_${f.name}"))
    }
    val statRows = guarded.groupBy(fineCol.as("__fine")).agg(statAggs.head, statAggs.tail: _*).collect()
    val stats = statRows.map(r => r.getInt(0) -> r).toMap
    val fineIds = stats.keys.toSeq.sorted
    val total = statRows.iterator.map(_.getLong(1)).sum

    // 3. Coalesce fine buckets into `parts` contiguous coarse runs of ~equal
    // exact count (skew-balanced up to fine-bucket granularity), and compute
    // each run's carry-in per column. All O(fineN) driver work.
    val target = math.max(1L, total / parts)
    val coarseOf = collection.mutable.Map.empty[Int, Int]
    var run = 0; var acc = 0L
    fineIds.foreach { f =>
      if (acc >= target && run < parts - 1) { run += 1; acc = 0L }
      coarseOf(f) = run
      acc += stats(f).getLong(1)
    }
    def statOf(f: Int, prefix: String, name: String): Any = {
      val r = stats(f); r.get(r.fieldIndex(prefix + name))
    }
    val iterOrder = if (backward) fineIds.reverse else fineIds
    val edgePrefix = if (backward) "__first_" else "__last_"
    // carry per coarse run = edge value of the nearest bucket OUTSIDE the run
    // in fill direction; recorded the moment a new run starts.
    val runCarry = Array.fill[Array[Any]](parts)(null)
    val runningEdge = Array.fill[Any](fields.length)(null)
    var prevRun = -1
    iterOrder.foreach { f =>
      val r = coarseOf(f)
      if (r != prevRun) { runCarry(r) = runningEdge.clone(); prevRun = r }
      fields.indices.foreach { i =>
        val e = statOf(f, edgePrefix, fields(i).name)
        if (e != null) runningEdge(i) = e
      }
    }
    val globalFirst: Array[Any] = fields.indices.map { i =>
      fineIds.iterator.map(f => statOf(f, "__first_", fields(i).name)).find(_ != null).orNull
    }.toArray

    // 4. Broadcast-join the tiny (fine → coarse, carry…) table, then fill via
    // a running window per coarse run. One data shuffle, constant-size
    // codegen (no per-bucket literal trees).
    val mapSchema = StructType(
      StructField("__fine", IntegerType, nullable = false) +:
      StructField("__coarse", IntegerType, nullable = false) +:
      fields.map(f => StructField(s"__carry_${f.name}", f.dataType, nullable = true)))
    val mapRows = fineIds.map { f =>
      val carries = Option(runCarry(coarseOf(f))).getOrElse(Array.fill[Any](fields.length)(null))
      Row.fromSeq(f +: coarseOf(f) +: carries.toIndexedSeq)
    }
    // LocalRelation (no job) — the broadcast is built driver-side.
    val mapDf = spark.createDataFrame(java.util.Arrays.asList(mapRows: _*), mapSchema)

    val joined = guarded.withColumn("__fine", fineCol).join(broadcast(mapDf), "__fine")
    val w =
      if (backward)
        Window.partitionBy(col("__coarse")).orderBy(ord.desc)
          .rowsBetween(Window.unboundedPreceding, 0)
      else
        Window.partitionBy(col("__coarse")).orderBy(ord.asc)
          .rowsBetween(Window.unboundedPreceding, 0)
    var out = joined
    fields.zipWithIndex.foreach { case (f, i) =>
      val fallback: Seq[Column] =
        if (bfillFallback) Seq(lit(globalFirst(i)).cast(f.dataType)) else Nil
      out = out.withColumn(f.name, coalesce(
        (last(col(f.name), ignoreNulls = true).over(w) +:
          col(s"__carry_${f.name}") +: fallback): _*))
    }
    out.drop("__fine", "__coarse").drop(fields.map(f => s"__carry_${f.name}"): _*)
  }
}
