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

  /** Stage 1+2 projection: score, filter, fingerprint — the scoring
    * columns are TextOps.withQuality, the same expressions the batch
    * oracle checks.
    */
  def cleanse(docs: DataFrame, minQuality: Double = 0.5): DataFrame =
    TextOps.withQuality(docs)
      .filter(col("quality") >= minQuality)
      .withColumn("fingerprint", fingerprint(col("text")))
      .select(col("doc_id"), col("lang"), col("ingest_ts"),
        col("n_tokens"), col("quality"), col("fingerprint"))

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

  /** Arriving media record: opaque container bytes + event time. */
  case class MediaIngest(media_id: Long, payload: Array[Byte],
      ingest_ts: java.sql.Timestamp)
  case class MediaHashed(media_id: Long, ahash: Long,
      ingest_ts: java.sql.Timestamp)

  /** Perceptual fingerprinting of an arriving media stream: the REAL
    * PPM decode + [[graft.operators.MultimodalOps.Ppm.ahash]] runs
    * per-partition (codec init once per partition, the multimodal batch
    * shape); malformed containers are dropped here — a quarantine
    * pipeline calls `Ppm.ahash` directly and routes the Left.
    */
  def hashedMedia(media: org.apache.spark.sql.Dataset[MediaIngest]):
      org.apache.spark.sql.Dataset[MediaHashed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        graft.operators.MultimodalOps.Ppm
          .ahash(m.payload, graft.operators.MultimodalOps.AhashCells)
          .toOption.map(h => MediaHashed(m.media_id, h, m.ingest_ts))
      }
    }
  }

  /** Streaming media dedup — the streaming twin of
    * `multimodal_image_dedup`: perceptually identical rasters (same
    * aHash — byte-identical OR brightness-shifted re-encodes) collapse
    * to the first arrival within the watermark horizon, with state
    * bounded exactly like the text path's fingerprint dedup.
    */
  def dedupedMedia(media: org.apache.spark.sql.Dataset[MediaIngest],
      delayThreshold: String = "1 hour"): DataFrame =
    hashedMedia(media).toDF()
      .withWatermark("ingest_ts", delayThreshold)
      .dropDuplicatesWithinWatermark("ahash")

  /** Streaming NEAR-dup screening against the static staged corpus
    * index: every micro-batch of arriving (doc_id, text) documents runs
    * the full batch verification ([[graft.operators.DedupOps
    * .dedupIncremental]] — df-capped postings join + exact Jaccard) and
    * hands matches to `sinkWriter` as (new_id, corpus_id, jaccard).
    * This is the stream-static pattern at the micro-batch boundary: the
    * corpus side never recomputes, the arriving side is tiny, and the
    * verification is the exact-semantics batch operator — not an
    * approximation bolted onto streaming state.
    */
  def startIncrementalDedup(docs: DataFrame, corpusDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sinkWriter: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sinkWriter(
          graft.operators.DedupOps.dedupIncremental(
            batch.sparkSession, corpusDir, batch), id)
      }
      .start()

  /** Streaming EXACT-SUBSTRING screening against the static staged span
    * index — the span-level sibling of [[startIncrementalDedup]]: each
    * micro-batch of (doc_id, text) documents is window-hashed (cost
    * scales with the batch) and joined against the df-capped corpus span
    * postings ([[graft.operators.DedupOps.substrScreen]]); documents
    * sharing >= MinSharedSpans distinct spans with a corpus document
    * reach `sinkWriter` as (new_id, corpus_id, n_shared_spans) — copied
    * passages caught at ingest, before they enter the corpus.
    */
  def startSubstrScreen(docs: DataFrame, corpusDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sinkWriter: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sinkWriter(
          graft.operators.DedupOps.substrScreen(
            batch.sparkSession, corpusDir, batch), id)
      }
      .start()

  /** Streaming SEMANTIC screening of arriving embeddings against the
    * static staged cell index — the embedding-space twin of
    * [[startIncrementalDedup]]: each micro-batch of (vec_id, embedding)
    * rows is cell-assigned (broadcast codebook, cost scales with the
    * batch) and compared only within its cells
    * ([[graft.operators.SimilarityOps.semanticScreen]]); matches at or
    * above `threshold` reach `sinkWriter` as (new_id, corpus_id, cos).
    */
  def startSemanticScreen(vecs: DataFrame, corpusDir: String,
      checkpointDir: String, threshold: Double,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sinkWriter: (DataFrame, Long) => Unit): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sinkWriter(
          graft.operators.SimilarityOps.semanticScreenAgainstCorpus(
            batch.sparkSession, corpusDir, batch, threshold), id)
      }
      .start()
}
