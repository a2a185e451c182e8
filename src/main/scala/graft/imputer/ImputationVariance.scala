package graft.imputer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rubin-style between-imputation variance — the reference's
  * find_imputation_variance (scikit_learn_imputer.py:556): given m imputed
  * datasets, the per-variable variance of the per-dataset MEAN (continuous)
  * or of the per-dataset class-distribution ENTROPY (categorical).
  *
  * Each per-dataset statistic is one distributed aggregation; the final
  * variance is over m tiny rows.
  */
object ImputationVariance {

  def findImputationVariance(datasets: Seq[DataFrame], categorical: Seq[String]): DataFrame = {
    require(datasets.nonEmpty, "need at least one imputed dataset")
    val columns = datasets.head.columns.toSeq
    val continuous = columns.filterNot(categorical.contains)

    val perDataset: Seq[DataFrame] = datasets.map { df =>
      // index-based aliases + typed explode, not a spliced stack()
      // selectExpr — column names are caller data, never SQL text
      val contStats = continuous.zipWithIndex.map { case (c, i) =>
        avg(col(c)).as(s"_avg_$i")
      }
      val base = if (continuous.nonEmpty) {
        val one = df.agg(contStats.head, contStats.tail: _*)
        val rows = array(continuous.zipWithIndex.map { case (c, i) =>
          struct(lit(c).as("variable"), col(s"_avg_$i").as("stat"))
        }: _*)
        one.select(explode(rows).as("_r"))
          .select(col("_r.variable").as("variable"), col("_r.stat").as("stat"))
      } else df.sparkSession.emptyDataFrame.selectExpr("'' AS variable", "0.0 AS stat").limit(0)
      val cats = categorical.map { c =>
        df.groupBy(col(c)).agg(count(lit(1)).as("_c"))
          .agg((log(sum(col("_c")).cast("double"))
            - sum(col("_c").cast("double") * log(col("_c").cast("double")))
              / sum(col("_c")).cast("double")).as("stat"))
          .select(lit(c).as("variable"), col("stat"))
      }
      cats.foldLeft(base)(_ unionAll _)
    }
    perDataset.reduce(_ unionAll _)
      .groupBy("variable")
      .agg(var_samp(col("stat")).as("imputation_variance"))
  }
}
