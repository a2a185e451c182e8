package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming faces of the batch operators: the same logical
  * transforms applied to a streaming DataFrame (`readStream` source), with
  * watermarks bounding state.
  *
  * The batch equivalents in [[graft.analytics.Analytics]] are the oracle-
  * checked faces; these are verified with MemoryStream specs.
  */
object Streams {

  /** Streaming exact dedup on a content hash with bounded state: duplicates
    * arriving within the watermark horizon are dropped. */
  def dedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
            watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Streaming tumbling-window count/sum per event type. Late data beyond
    * the watermark is dropped; state is evicted as the watermark advances. */
  def windowedAgg(events: DataFrame, tsCol: String, typeCol: String,
                  valueCol: String, windowLen: String = "1 hour",
                  watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("sum_value"))
}
