package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble

/** Product quantization — the billion-scale vector-compression path
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; the residual/IVF-ADC family used by every large ANN
  * system). The d-dim space splits into `m` subspaces of d/m dims; each
  * subspace learns `k` codewords by Lloyd iterations; a vector encodes as
  * m single-byte codes (d·4 bytes → m bytes, e.g. 64-dim float → 8 bytes).
  * Query scoring is ADC: the query precomputes an m×k distance table
  * (driver-side, tiny) and every encoded vector's distance is m table
  * lookups — no decode, no float vector ever shuffles.
  *
  * Scale shape:
  *   - training: each Lloyd iteration is ONE distributed pass — encode
  *     with the current centroids (literal arrays inside codegen) and
  *     aggregate per-(subspace, code) mean subvectors via the mergeable
  *     `graft_vec_avg`; centroids themselves are m·k·(d/m) doubles on the
  *     driver (a few KB), broadcast as literals.
  *   - encoding: a pure projection — argmin over k literal codewords per
  *     subspace, whole-stage codegen, zero shuffle.
  *   - search: encoded table scans once; ADC distance is a codegen'd
  *     lookup sum; top-k via the graft_topk heap aggregate.
  *
  * Determinism: centroid init takes the k lowest-`xxhash64(id)` vectors'
  * subvectors (no RNG), iterations are a fixed count, and every reduction
  * is the mergeable vec-avg — results are reproducible across
  * partitionings. */
object Pq {

  case class Model(m: Int, subDim: Int, centroids: Array[Array[Array[Double]]]) {
    require(centroids.length == m)
    def k: Int = centroids(0).length
  }

  private def slice(v: Column, s: Int, subDim: Int): Column =
    org.apache.spark.sql.functions.slice(v, s * subDim + 1, subDim)

  /** Code (0-based) of the nearest codeword for subspace `s` —
    * deterministic argmin (first index achieving the min), one
    * data-driven codegen loop over the codebook
    * ([[graft.functions.ArgminSqDistExpr]], bitwise-identical to the
    * old k-literal ||x−c||² expression tree). */
  private def encodeSub(v: Column, s: Int, model: Model): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ArgminSqDistExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          slice(v, s, model.subDim)),
        model.centroids(s)))

  /** Train a PQ codebook on (idCol, vecCol) with `iters` Lloyd passes. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
          m: Int = 8, k: Int = 16, iters: Int = 3): Model = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    // training reads base m·iters (+ seed) times — persist the projected
    // two-column frame once instead of re-executing the caller's lineage
    // on every per-subspace job
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic, diversity-preserving init: the k vectors with the
    // lowest id HASH (id order would seed with adjacent — often
    // near-duplicate — vectors and start Lloyd degenerate);
    // TakeOrderedAndProject keeps this scale-safe
    val seed = base.orderBy(xxhash64(col("id")), col("id")).limit(k).collect()
    var model = Model(m, subDim, Array.tabulate(m) { s =>
      seed.map(_.getSeq[Double](1).slice(s * subDim, (s + 1) * subDim).toArray)
    })
    (1 to iters).foreach { _ =>
      // per-subspace assign+aggregate jobs: each groupBy prunes down to
      // ONE subspace's k-codeword argmin, keeping every generated method
      // small enough for JIT (a fused all-subspace explode was measured
      // ~2× slower — m·k·3 dot products in one projection blows past
      // codegen limits). m jobs over the same cached scan, k·(d/m)
      // work each.
      val updates = (0 until m).map { s =>
        base.groupBy(encodeSub(col("v"), s, model).as("code"))
          .agg(call_function("graft_vec_avg",
            slice(col("v"), s, subDim)).as("centroid"))
          .select(lit(s).as("s"), col("code"), col("centroid"))
      }.reduce(_ unionAll _).collect()
      val next = model.centroids.map(_.clone())
      updates.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
      model = Model(m, subDim, next)
    }
    base.unpersist()
    model
  }

  /** Encode every vector as m small codes — a pure codegen projection. */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    base.select(col("id"),
      array((0 until model.m).map(s => encodeSub(col("v"), s, model)): _*).as("codes"))
  }

  /** ADC top-k: squared-L2 nearest neighbors of each query over the
    * ENCODED table (codes only — the float vectors never rescan). The
    * per-query m×k distance table is computed driver-side and inlined as
    * literals; each row's distance is m array lookups.
    *
    * Driver contract: the QUERY set collects to the driver and ships as one
    * broadcast of per-query m×k double tables — memory grows as
    * queries × m × k × 8 bytes (plus the raw query vectors while tables are
    * built). `maxQueries` bounds that collect the same way `maxLists` bounds
    * the IVF centroid map: limit(maxQueries+1) caps what can ever reach the
    * driver, one extra row proves overflow. A corpus-sized "query set" is a
    * different operator (all-pairs — use the LSH/self-join faces). */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, model: Model, k: Int,
              maxQueries: Int = 100000): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .limit(maxQueries + 1).collect()
    require(qRows.nonEmpty, "empty query set")
    require(qRows.length <= maxQueries,
      s"adcTopK: more than maxQueries=$maxQueries query vectors — the ADC " +
        "tables are driver-built and broadcast (queries × m × k doubles); " +
        "batch the query set, or raise maxQueries alongside " +
        "spark.driver.memory if the broadcast still fits")
    // one m×k lookup table per query (a few KB each), shipped as ONE
    // broadcast frame so the encoded table scans exactly once for the
    // whole query set
    val qTables: Seq[(Long, Seq[Seq[Double]])] = qRows.toSeq.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val table = Seq.tabulate(model.m) { s =>
        val sub = qv.slice(s * model.subDim, (s + 1) * model.subDim)
        model.centroids(s).toSeq.map { c =>
          var d = 0.0; var i = 0
          while (i < sub.length) { val t = sub(i) - c(i); d += t * t; i += 1 }
          d
        }
      }
      (qid, table)
    }
    val qdf = qTables.toDF("query_id", "qtable")
    val dist = (0 until model.m).map { s =>
      element_at(element_at(col("qtable"), s + 1), col("codes").getItem(s) + 1)
    }.reduce(_ + _)
    val scored = encoded.crossJoin(broadcast(qdf))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"), dist.as("dist"))
    // graft_topk keeps the LARGEST scores — negate distances for nearest
    nearestK(scored, k)
  }

  private def nearestK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(call_function("graft_topk", -col("dist"), col("neighbor_id"), lit(k)).as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")).as(Seq("_i", "_s")))
      .select(col("query_id"), col("_s.id").as("neighbor_id"),
        (col("_i") + 1).cast("bigint").as("rank"), (-col("_s.score")).as("dist"))

  /** IVF-PQ — the canonical billion-scale composition (FAISS "IVFx,PQy"
    * shape): a coarse inverted index over `listCol` prunes the search to
    * `nProbe` lists per query, and a PQ codebook trained on RESIDUALS
    * (vector − list centroid, the standard trick that concentrates the
    * quantizer's dynamic range) scores candidates by ADC lookups. The
    * corpus shuffles once per Lloyd pass and once to encode; search touches
    * only the probed lists' codes via a broadcast (query, list, table)
    * probe frame — codes are m bytes per vector and the float corpus never
    * participates in search. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, listCol: String, dim: Int,
                m: Int = 8, kCode: Int = 16, iters: Int = 2,
                nProbe: Int = 2, k: Int = 5, maxLists: Int = 200000,
                maxQueries: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val listType = corpus.schema(corpus.schema.fieldIndex(listCol)).dataType
    val c = corpus.select(col(idCol).as("id"), col(listCol).as("list"),
      toDouble(col(vecCol)).as("v"))
    // coarse centroids: one mergeable vec-avg pass. The map is driver state
    // (lists × dim doubles — ~100 MB at 200k lists × 64 dims), so the
    // collect is BOUNDED: limit(maxLists+1) caps what can ever reach the
    // driver in this job, and one extra row proves overflow without an
    // extra count job.
    val centroidRows = c.groupBy("list")
      .agg(call_function("graft_vec_avg", col("v")).as("cv"))
      .limit(maxLists + 1).collect()
    require(centroidRows.length <= maxLists,
      s"ivfPqTopK: more than maxLists=$maxLists coarse lists in '$listCol' — " +
        "the per-list centroid map is driver-resident; coarsen the list key " +
        "or raise maxLists alongside spark.driver.memory")
    val centroidMap = centroidRows.map(r => r.get(0) -> r.getSeq[Double](1).toArray).toMap
    // list keys join back as their ORIGINAL type (int, long, string, …) —
    // the key is opaque to the algorithm, so nothing may assume Int
    val centDf = spark.createDataFrame(
      java.util.Arrays.asList(centroidMap.toSeq.map { case (l, cv) =>
        org.apache.spark.sql.Row(l, cv.toSeq) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("list", listType),
        org.apache.spark.sql.types.StructField("cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    // residual frame (v − centroid) via one broadcast join, materialized
    // ONCE — Lloyd passes, encode, and the list re-join would otherwise
    // each re-execute the corpus scan + centroid join lineage
    val residuals = c.join(broadcast(centDf), Seq("list"))
      .select(col("id"), col("list"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv"))
      .localCheckpoint()
    val model = fit(residuals, "id", "rv", dim, m, kCode, iters)
    val encoded = encode(residuals, "id", "rv", model)
      .join(residuals.select("id", "list"), Seq("id"))
    // probes: per query, the nProbe nearest list centroids (driver math —
    // queries are the small side by contract) + the ADC table of the
    // query's RESIDUAL against that list. Driver memory grows as
    // queries × nProbe × m × kCode doubles — bounded like maxLists above:
    // limit(maxQueries+1) caps the collect, one extra row proves overflow.
    val qRows = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .limit(maxQueries + 1).collect()
    require(qRows.nonEmpty, "empty query set")
    require(qRows.length <= maxQueries,
      s"ivfPqTopK: more than maxQueries=$maxQueries query vectors — the " +
        "probe tables are driver-built and broadcast (queries × nProbe × " +
        "m × kCode doubles); batch the query set, or raise maxQueries " +
        "alongside spark.driver.memory if the broadcast still fits")
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    // deterministic distance tie-break for ANY key type: numeric order for
    // numbers (unchanged vs the old Int-only path), lexicographic otherwise
    def tieKey(l: Any): (Double, String) = l match {
      case n: Number => (n.doubleValue(), String.valueOf(l))
      case _ => (0.0, String.valueOf(l))
    }
    val probeRows = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      centroidMap.toSeq
        .sortBy { case (l, cv) => (l2(qv, cv), tieKey(l)) }
        .take(nProbe)
        .map { case (l, cv) =>
          val qr = qv.indices.map(i => qv(i) - cv(i)).toArray
          val table = Seq.tabulate(model.m) { s =>
            val sub = qr.slice(s * model.subDim, (s + 1) * model.subDim)
            model.centroids(s).toSeq.map(cw => l2(sub, cw))
          }
          org.apache.spark.sql.Row(qid, l, table)
        }
    }
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("list", listType),
        org.apache.spark.sql.types.StructField("qtable",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType))))))
    val dist = (0 until model.m).map { s =>
      element_at(element_at(col("qtable"), s + 1), col("codes").getItem(s) + 1)
    }.reduce(_ + _)
    val scored = encoded.join(broadcast(probes), Seq("list"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"), dist.as("dist"))
    nearestK(scored, k)
  }
}
