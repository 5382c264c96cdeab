package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.operators.TextOps

/** Streaming training-data ingest: the cleanse/dedup/account pipeline a
  * pretraining corpus runs continuously, composed from the SAME column
  * expressions as the batch text operators (TextOps) so the batch oracle
  * checks the streaming semantics for free.
  *
  * Stages per micro-batch of (doc_id, text, lang, ingest_ts):
  * 1. quality scoring (TextOps.qualityScore) and low-quality rejection —
  *    stateless projection + filter;
  * 2. exact near-dup rejection on the bag-of-words fingerprint with
  *    BOUNDED state: `dropDuplicatesWithinWatermark` keeps fingerprint
  *    state only inside the watermark horizon — the streaming twin of
  *    DedupOps.dedupExact;
  * 3. foreachBatch append of survivors, executor-parallel (same sink
  *    pattern as WeatherStreamJob).
  *
  * At scale: stages 1-2 are map-side except the dedup's hash exchange on
  * the fingerprint; state size is bounded by (unique fingerprints per
  * watermark window), not corpus history.
  */
object DocStreamJob {

  /** Bag-of-words fingerprint (identical to TextOps.textFingerprint's
    * key): md5 over the sorted distinct token set.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(TextOps.tokens(text))))
      .cast("binary"))

  /** Stage 1+2 projection: score, filter, fingerprint. */
  def cleanse(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val t = TextOps.tokens(col("text"))
    docs
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("stop_ratio",
        size(filter(t, x => x === lit("a") || x === lit("the")))
          / col("n_tokens").cast("double"))
      .withColumn("avg_len",
        length(regexp_replace(col("text"), " ", "")) / col("n_tokens").cast("double"))
      .withColumn("quality",
        TextOps.qualityScore(col("n_tokens"), col("stop_ratio"), col("avg_len")))
      .filter(col("quality") >= minQuality)
      .withColumn("fingerprint", fingerprint(col("text")))
      .select(col("doc_id"), col("lang"), col("ingest_ts"),
        col("n_tokens"), col("quality"), col("fingerprint"))
  }

  /** Stage 2: streaming exact dedup with bounded state — a fingerprint
    * seen within the watermark horizon is dropped, state for expired
    * horizons is evicted.
    */
  def deduped(docs: DataFrame, minQuality: Double = 0.5,
      delayThreshold: String = "1 hour"): DataFrame =
    cleanse(docs, minQuality)
      .withWatermark("ingest_ts", delayThreshold)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Full pipeline: cleanse -> dedup -> executor-parallel append. */
  def start(docs: DataFrame, checkpointDir: String,
      minQuality: Double = 0.5,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sinkWriter: (DataFrame, Long) => Unit): StreamingQuery =
    deduped(docs, minQuality).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) => sinkWriter(batch, id) }
      .start()
}
