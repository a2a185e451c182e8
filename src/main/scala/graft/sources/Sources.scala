package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source/sink helpers. The reference tool ingests CSV frames
  * (tests read test_data_territories.csv); at engine scale the same data
  * arrives as CSV/JSON landing files and leaves as partitioned parquet.
  */
object Sources {

  /** CSV with header; pass a schema to skip the inference scan (inference
    * reads the data twice — never do that at 100 TB). */
  def csv(spark: SparkSession, path: String, schema: StructType = null): DataFrame = {
    val r = spark.read.option("header", "true")
    (if (schema != null) r.schema(schema) else r.option("inferSchema", "true")).csv(path)
  }

  /** Newline-delimited JSON with explicit schema (schemaless JSON reads
    * also scan twice). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partitioned parquet sink: directory layout `partitionCols` for
    * partition pruning downstream. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** ORC read — columnar alternative ingest format; same pushdown story as
    * parquet (predicate + column pruning reach the stripe reader). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink (zlib by default; Spark's ORC writer carries min/max stripe
    * statistics used for predicate pushdown on re-read). */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Bucketed managed table: two tables bucketed+sorted on the same join
    * key co-locate their data, so equi-joins between them need NO shuffle
    * exchange — the pre-shuffle is paid once at write time. This is the
    * repeated-big-join answer at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Clustered data layout: range-repartition on the clustering columns and
    * sort within each partition before writing, so every output file holds
    * a narrow, non-overlapping key range. Parquet row-group min/max stats
    * then prune whole files for range predicates on those columns — the
    * write-once, skip-forever layout step of a 100 TB table (the practical
    * core of Z-ordering when one clustering dimension dominates).
    * `targetPartitions` controls file count/size (at scale: total bytes /
    * desired file size). */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     targetPartitions: Int, mode: String = "overwrite"): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    df.repartitionByRange(targetPartitions, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }
}
