package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the streaming twin of the
  * batch attribution probe (`q_attribution`'s impression→conversion
  * credit): every purchase is matched to the impressions that preceded
  * it within the attribution window, continuously, as both streams
  * arrive.
  *
  * This is deliberately Spark's BUILT-IN watermarked stream-stream
  * join, not custom `flatMapGroupsWithState` bookkeeping: an equality
  * key plus a both-sided event-time range is exactly the shape
  * Structured Streaming's symmetric hash join handles, and the two
  * watermarks give it the state eviction proof — an impression's state
  * is droppable once the purchase-side watermark passes
  * `imp_ts + window`, a purchase's once the impression-side watermark
  * passes its `buy_ts`. State is therefore bounded by
  * (arrival rate × (watermark delay + window)), independent of stream
  * lifetime — the property that lets this run for months on a
  * 100 TB/day event feed. Custom state code would re-implement all of
  * that, worse.
  *
  * Rows later than `watermarkDelay` are dropped by the engine (the
  * documented lateness contract, same as
  * [[ContinuousAggregate]]); in-order data reproduces the batch
  * operator's output exactly — the spec pins both.
  */
object StreamingJoin {

  /** Purchases attributed to same-user impressions at most `windowS`
    * seconds earlier (inclusive of ties, exclusive of the window's far
    * edge — `imp_ts ≤ buy_ts < imp_ts + windowS`). Works identically on
    * batch inputs (`withWatermark` is a no-op there), which is what the
    * batch-parity spec leans on.
    *
    * Inputs need (`user_id`, `ts`); output one row per qualifying
    * (impression, purchase) pair with the attribution latency. */
  def attributedPurchases(impressions: DataFrame, purchases: DataFrame,
      windowS: Long, watermarkDelay: String = "10 minutes"): DataFrame = {
    val i = impressions
      .select(col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("buy_user"), col("ts").as("buy_ts"))
      .withWatermark("buy_ts", watermarkDelay)
    i.join(p,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("imp_ts") &&
          col("buy_ts") < col("imp_ts") + expr(s"INTERVAL $windowS SECOND"))
      .select(col("user_id"), col("imp_ts"), col("buy_ts"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("imp_ts")))
          .as("latency_s"))
  }

  /** [[attributedPurchases]] with LEFT OUTER semantics: impressions
    * that never converted inside the window are emitted too, with NULL
    * `buy_ts`/`latency_s` — the non-converter feed a funnel analysis
    * needs, produced by the engine itself at the exact moment the
    * impression becomes unmatchable.
    *
    * This is the part plain joins cannot do on unbounded streams: "no
    * purchase arrived" is only decidable once the purchase-side
    * watermark has passed `imp_ts + windowS`, so the NULL row is
    * emitted BY the state-eviction machinery, as late as the watermark
    * and no later. On batch inputs it degrades to an ordinary left
    * outer interval join — the parity the spec pins. */
  def attributionWithTimeout(impressions: DataFrame, purchases: DataFrame,
      windowS: Long, watermarkDelay: String = "10 minutes"): DataFrame = {
    val i = impressions
      .select(col("user_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("buy_user"), col("ts").as("buy_ts"))
      .withWatermark("buy_ts", watermarkDelay)
    i.join(p,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("imp_ts") &&
          col("buy_ts") < col("imp_ts") + expr(s"INTERVAL $windowS SECOND"),
        "left_outer")
      .select(col("user_id"), col("imp_ts"), col("buy_ts"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("imp_ts")))
          .as("latency_s"))
  }
}
