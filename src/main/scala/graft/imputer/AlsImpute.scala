package graft.imputer

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matrix-completion imputation: when missingness lives in a (row, column)
  * CROSS-classification — user × item, store × product, sensor × hour —
  * per-column models waste the matrix structure. ALS factorizes the
  * observed cells into rank-r row/column factors and fills a missing cell
  * with the dot product of its factors — the collaborative-filtering
  * imputer, and the one matrix-completion algorithm that is genuinely
  * distributed at 100 TB (factors hash-partition by id; each sweep is a
  * keyed join against the observed cells; no dense matrix ever exists).
  *
  * MLlib's ALS is the engine (like SparkImputer delegates to MLlib
  * estimators); this face adds the imputation contract: train on observed
  * cells, predict exactly the missing ones, return the completed matrix.
  */
object AlsImpute {

  /** Complete a cell frame: rows with a null `valueCol` are filled from
    * the factorization of the observed rows.
    *
    * @param cells   (rowCol int-like, colCol int-like, valueCol numeric —
    *                null = missing)
    * @return the input with `outCol` = observed value, or the ALS
    *         prediction where missing (NaN if a row/col was entirely
    *         unobserved — cold start) */
  def complete(cells: DataFrame, rowCol: String, colCol: String,
               valueCol: String, outCol: String,
               rank: Int = 8, maxIter: Int = 10, regParam: Double = 0.1,
               seed: Long = 42L): DataFrame = {
    require(rank >= 1 && maxIter >= 1, s"rank/maxIter must be >= 1")
    // MLlib ALS keys are Int. Silently casting wider ids would overflow —
    // distinct longs collide, corrupting training AND the fill join with no
    // error — so ids beyond Int range fail loudly. Non-numeric ids (strings)
    // are rejected outright: they cast to NULL, which would skip the range
    // guard below AND null out the cast("int") keys — the same silent-
    // corruption class the guard exists to prevent.
    import org.apache.spark.sql.types.{ByteType, IntegerType, NumericType, ShortType}
    Seq(rowCol, colCol).foreach { c =>
      val dt = cells.schema(cells.schema.fieldIndex(c)).dataType
      require(dt.isInstanceOf[NumericType],
        s"AlsImpute.complete: id column '$c' has type ${dt.simpleString} — " +
          "MLlib ALS keys are Int; map ids to integers first, e.g. via " +
          "dense_rank() or a dictionary join")
    }
    val intLike: Set[org.apache.spark.sql.types.DataType] = Set(ByteType, ShortType, IntegerType)
    val wide = Seq(rowCol, colCol)
      .filterNot(c => intLike(cells.schema(cells.schema.fieldIndex(c)).dataType))
    if (wide.nonEmpty) {
      val aggs = wide.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
      val mm = cells.agg(aggs.head, aggs.tail: _*).head()
      wide.zipWithIndex.foreach { case (c, i) =>
        if (!mm.isNullAt(2 * i)) {
          val (lo, hi) = (mm.getLong(2 * i), mm.getLong(2 * i + 1))
          require(lo >= Int.MinValue && hi <= Int.MaxValue,
            s"AlsImpute.complete: id column '$c' spans [$lo, $hi], outside Int " +
              "range (MLlib ALS keys are Int) — densify ids first, e.g. via " +
              "dense_rank() or a dictionary join")
        }
      }
    }
    val observed = cells.filter(col(valueCol).isNotNull)
      .select(col(rowCol).cast("int").as("_r"), col(colCol).cast("int").as("_c"),
        col(valueCol).cast("float").as("_v"))
    val als = new ALS()
      .setUserCol("_r").setItemCol("_c").setRatingCol("_v")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam).setSeed(seed)
      .setColdStartStrategy("nan") // unobserved row/col → NaN, caller's call
      .setNonnegative(false)
    val model = als.fit(observed)
    val missing = cells.filter(col(valueCol).isNull)
      .select(col(rowCol).cast("int").as("_r"), col(colCol).cast("int").as("_c"))
    val preds = model.transform(missing)
      .select(col("_r"), col("_c"), col("prediction").cast("double").as("_p"))
    cells.join(preds,
        cells(rowCol).cast("int") === preds("_r") &&
          cells(colCol).cast("int") === preds("_c"), "left")
      .select(cells.columns.map(col) :+
        coalesce(col(valueCol).cast("double"), col("_p")).as(outCol): _*)
  }
}
