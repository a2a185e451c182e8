package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: bucket-occupancy skew of the LSH signatures and candidate
  * volumes of both geometry faces at one sf dir. */
object GeomProfile2 {
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

    val e = graft.Tables(spark, dir, "embeddings")
    val planes = graft.similarity.AnnLsh.adaptivePlanes(e.count())
    val base = e.select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
    val signed = base.select(col("id"),
        array((0 until 16).map(t =>
          graft.similarity.AnnLsh.signature(col("v"), 64, planes, t)): _*).as("_sigs"))
      .select(col("id"), posexplode(col("_sigs")).as(Seq("table", "bucket")))
      .localCheckpoint()
    val occ = signed.groupBy("table", "bucket").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    occ.agg(sum(col("n") * col("n")).as("sum_occ_sq"), max("n").as("max_occ"),
        count(lit(1)).as("n_buckets")).show()
    occ.orderBy(desc("n")).show(10)

    // simhash candidate volume by stage
    val docs = graft.Tables(spark, dir, "documents")
    val d = graft.dedup.SimHash.adaptiveBlocks(docs.count())
    val fp = docs.select(col("doc_id").as("id"),
        graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
      .localCheckpoint()
    val k = 7 + d
    val bitsPer = 64 / k
    val mask = (1L << bitsPer) - 1
    val combos = (0 until k).combinations(d).toSeq
    println(s"[prof2] combos=${combos.size} bitsPer=$bitsPer")
    val keyStructs = combos.zipWithIndex.map { case (blocks, ci) =>
      val key = blocks.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(col("fp"), b * bitsPer).bitwiseAND(mask), j * bitsPer)
      }.reduce(_ bitwiseOR _)
      struct(lit(ci).as("comb"), key.as("ckey"))
    }
    val keyed = fp.select("fp").distinct()
      .select(col("fp"), explode(array(keyStructs: _*)).as("_ck"))
      .select(col("fp"), col("_ck.comb").as("comb"), col("_ck.ckey").as("ckey"))
      .localCheckpoint()
    val socc = keyed.groupBy("comb", "ckey").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    socc.agg(sum(col("n") * col("n")).as("sum_occ_sq"), max("n").as("max_occ"),
      count(lit(1)).as("n_keys")).show()
    socc.orderBy(desc("n")).show(10)
    spark.stop()
  }
}
