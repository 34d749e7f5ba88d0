package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `documents` table shape — the
  * unbounded twin of [[graft.operators.DedupOps]]/[[graft.operators.TextOps]]
  * for continuous corpus ingestion.
  *
  * Scale notes: exact dedup keys its state by the 16-byte content hash
  * only (never the document payload), and
  * `dropDuplicatesWithinWatermark` expires that state once the watermark
  * passes — bounded state on an unbounded stream, the only shape that
  * survives a firehose of training documents. Quality filtering is
  * stateless and stays inside WholeStageCodegen.
  */
object DocStream {

  /** Streaming exact dedup: drops payload-identical documents arriving
    * within the watermark horizon of each other. State = one content
    * hash per distinct doc seen inside the horizon; late duplicates
    * beyond the horizon are a deliberate recall/state tradeoff (tune
    * `watermark` to the re-post window that matters). */
  def dedupExact(
      docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stateless quality gate: same formula as the batch `text_quality`
    * score, applied per document as it streams in. */
  def qualityFilter(docs: DataFrame, textCol: String, minScore: Double): DataFrame = {
    val t = size(split(col(textCol), " "))
    val lenScore = least(t.cast("double") / 100.0, lit(1.0))
    val avgWordLen = (length(col(textCol)) - t + 1).cast("double") / t
    val wordLenScore = greatest(lit(0.0), lit(1.0) - abs(avgWordLen - 5.0) / 5.0)
    docs.withColumn("quality", round(lenScore * 0.5 + wordLenScore * 0.5, 4))
      .filter(col("quality") >= minScore)
  }
}
