package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up session/codegen so the first measured query isn't charged for it
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Three passes, MEDIAN per query, and a DIFFERENT deterministic query
    // order each pass: single-shot timings on a shared JVM swing ±30% from
    // codegen/classloading/GC noise, and a fixed order pins that noise to the
    // same victims every round (r5 showed 4 cheap scans "regressing" 2-4x
    // with unchanged plans). Rotating the order decorrelates a query from its
    // neighbors' GC debris; the median discards the one contended pass.
    val names = SparkEntry.queries.keys.toSeq.sorted
    def once(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    // One unmeasured warmup pass: JIT + codegen compile for every plan, so
    // measured samples reflect plan cost (what scales) rather than first-run
    // compilation (what doesn't).
    names.foreach(once)
    System.gc()
    val samples = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (pass <- 0 until 3) {
      val order = new scala.util.Random(7919 * (pass + 1)).shuffle(names)
      order.foreach { n => samples(n) = once(n) :: samples(n) }
      System.gc() // settle heap between passes so pass-local garbage isn't charged to the next pass's first queries
    }
    val results = names.map { n =>
      val s = samples(n).sorted
      n -> s(s.length / 2)
    }.toMap
    // per-query relative spread (max−min)/median across the three rotated
    // passes — the honest noise floor; a real regression must clear it
    val spread = names.map { n =>
      val s = samples(n).sorted
      n -> (if (s.last > 0) (s.last - s.head) / s(s.length / 2) else 0.0)
    }.toMap
    val spreads = spread.values.toSeq.sorted
    val medSpread = if (spreads.nonEmpty) spreads(spreads.length / 2) else 0.0
    val p90Spread = if (spreads.nonEmpty) spreads((spreads.length * 9) / 10 min (spreads.length - 1)) else 0.0
    // The harness that collects this output keeps only the last ~2000 chars,
    // so the FINAL line must stay inside that budget: print the full map
    // first (for whole-log readers), then a compact summary line holding the
    // slowest queries, trimmed to fit the tail window.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def entries(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val all = results.toSeq.sortBy(-_._2)
    println(s"""{"metric":"total_full","value":${fmt(total)},"unit":"sec","queries":${entries(all)},"spread":${entries(spread.toSeq.sortBy(-_._2))},"sf":"$sfDir"}""")
    var top = all
    def line() = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${all.size},"protocol":"median-of-3, rotated order, warmup pass","med_spread":${fmt(medSpread)},"p90_spread":${fmt(p90Spread)},"queries":${entries(top)},"sf":"$sfDir"}"""
    while (line().length > 1700 && top.nonEmpty) top = top.dropRight(5)
    println(line())
    spark.stop()
  }
}
