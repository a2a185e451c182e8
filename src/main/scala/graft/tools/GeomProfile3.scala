package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timing INSIDE AnnLsh.selfPairs at one sf dir. */
object GeomProfile3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions._
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof3] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val e = graft.Tables(spark, dir, "embeddings")
    val planes = graft.similarity.AnnLsh.adaptivePlanes(e.count())
    val tables = 16
    val base = e.select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
    t("signing (fresh, no checkpoint)") {
      base.select(col("id"),
          array((0 until tables).map(tb =>
            graft.similarity.AnnLsh.signature(col("v"), 64, planes, tb)): _*).as("_sigs"))
        .select(col("id"), posexplode(col("_sigs")).as(Seq("table", "bucket")))
        .count()
    }
    val signed = base.select(col("id"),
        array((0 until tables).map(tb =>
          graft.similarity.AnnLsh.signature(col("v"), 64, planes, tb)): _*).as("_sigs"))
      .select(col("id"), posexplode(col("_sigs")).as(Seq("table", "bucket")))
      .localCheckpoint()
    signed.count()
    val a = signed.select(col("table"), col("bucket"), col("id").as("id_a"))
    val b = signed.select(col("table"), col("bucket"), col("id").as("id_b"))
    t("bucket join raw (checkpointed signed)") {
      a.join(b, Seq("table", "bucket")).filter(col("id_a") < col("id_b")).count()
    }
    val cand = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    t("+ dedup") { cand.count() }
    val withVec = cand
      .join(broadcast(base.select(col("id").as("id_a"), col("v").as("va"),
        norm(col("v")).as("_na"))), Seq("id_a"))
      .join(broadcast(base.select(col("id").as("id_b"), col("v").as("vb"),
        norm(col("v")).as("_nb"))), Seq("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("_na") * col("_nb")))
      .filter(col("cos") >= 0.35)
    t("+ verify (broadcast)") { withVec.count() }
    t("full selfPairs broadcastVectors=true") {
      graft.similarity.AnnLsh.selfPairs(e, "vec_id", "embedding", 64, 0.35,
        planes, tables, broadcastVectors = true).count()
    }
    spark.stop()
  }
}
