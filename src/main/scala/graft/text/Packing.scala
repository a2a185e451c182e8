package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing for training-data pipelines: concatenate the
  * corpus in a deterministic global order (the id) and chunk the token
  * stream into fixed-budget windows. Each document gets its global token
  * offset, the window (pack) its first token lands in, and how many windows
  * it spans — the bookkeeping a loader needs to emit fixed-length training
  * sequences from variable-length documents.
  *
  * The global running sum is NOT a single-task window (`ORDER BY id` with no
  * partition collapses to one task — a non-starter at 100 TB). Two-pass
  * prefix-offset algorithm, same shape as [[graft.imputer.FfillBfill]]:
  * range-partition by the order key, reduce per-partition token sums (a
  * #partitions-row collect), broadcast the prefix offsets back, and let a
  * per-partition window — parallel over partitions — finish the cumsum.
  */
object Packing {

  /** @param tokensCol token count expression (e.g. `size(split(text, " "))`);
    *                  NULL counts (e.g. from NULL text) pack as 0 tokens
    * @param budget    tokens per context window */
  def packWindows(df: DataFrame, idCol: String, tokensCol: Column, budget: Int,
                  numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // localCheckpoint pins the sampled range boundaries so the stats job and
    // the final job see identical partition ids
    val base = df.select(col(idCol), coalesce(tokensCol.cast("bigint"), lit(0L)).as("n_tokens"))
      .repartitionByRange(parts, col(idCol).asc)
      .sortWithinPartitions(col(idCol).asc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // per-partition totals → prefix offsets (tiny: #partitions rows)
    val sums = base.groupBy("_pid").agg(sum("n_tokens").as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offMap: Map[Int, Long] = {
      var acc = 0L
      sums.map { case (pid, s) => val o = pid -> acc; acc += s; o }.toMap
    }
    val w = Window.partitionBy("_pid").orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offCol =
      if (offMap.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offMap), col("_pid")), lit(0L))
    base
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offCol)
      .withColumn("pack_id", expr(s"tok_start div $budget"))
      .withColumn("n_packs",
        expr(s"(tok_start + greatest(n_tokens - 1, 0L)) div $budget") - col("pack_id") + 1)
      .select(col(idCol), col("n_tokens"), col("tok_start"), col("pack_id"), col("n_packs"))
  }

  /** Budget-greedy document chunking under an ARBITRARY per-token cost —
    * the tokenizer-honest sibling of [[TextAnalysis.chunk]]: where `chunk`
    * slices a fixed NUMBER of whitespace tokens, this packs consecutive
    * whitespace tokens into chunks whose summed cost stays ≤ `budget`
    * (greedy first-fit; a single token costlier than the whole budget gets
    * its own over-budget chunk rather than being dropped). Pass
    * `t => call_function("graft_bpe_count", t)` to budget chunks in TRUE
    * BPE tokens — the context-window accounting a training pipeline
    * actually runs — or any other cost expression.
    *
    * Shape: the greedy scan is a per-row `aggregate` fold over the token
    * array (sequential by nature, but row-local — no shuffle, no state);
    * chunk rows then reassemble through one (doc, chunk) hash aggregate
    * whose collect_list is bounded by the document's own token count and
    * made deterministic by the array_sort on position. */
  def chunkBudgeted(df: DataFrame, idCol: String, textCol: String, budget: Int,
                    cost: Column => Column): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = df.select(col(idCol), split(col(textCol), " ").as("_t"))
      .withColumn("_cs", transform(col("_t"), t => cost(t).cast("int")))
    // greedy fold: carry (current chunk id, its filled cost, per-token ids)
    val zero = struct(lit(0).as("id"), lit(0).as("acc"),
      array().cast("array<int>").as("ids"))
    val folded = aggregate(col("_cs"), zero, (st, c) => {
      val over = st.getField("acc") + c > lit(budget) && st.getField("acc") > lit(0)
      val nid = when(over, st.getField("id") + 1).otherwise(st.getField("id"))
      struct(nid.cast("int").as("id"),
        when(over, c).otherwise(st.getField("acc") + c).cast("int").as("acc"),
        concat(st.getField("ids"), array(nid.cast("int"))).as("ids"))
    })
    val withIds = base.withColumn("_ids", folded.getField("ids"))
    // row-local (pos, tok, cid, cost) structs; empty docs emit no chunks
    val rows = when(size(col("_t")) > 0,
      transform(sequence(lit(0), size(col("_t")) - 1), i => struct(
        i.as("pos"),
        element_at(col("_t"), i + 1).as("tok"),
        element_at(col("_ids"), i + 1).as("cid"),
        element_at(col("_cs"), i + 1).as("cost"))))
      .otherwise(array().cast("array<struct<pos:int,tok:string,cid:int,cost:int>>"))
    withIds.select(col(idCol), explode(rows).as("_r"))
      .groupBy(col(idCol), col("_r.cid").cast("bigint").as("chunk_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("_r.pos").as("p"), col("_r.tok").as("tk")))),
          x => x.getField("tk"))).as("chunk_text"),
        sum(col("_r.cost")).as("n_chunk_cost"))
  }
}
