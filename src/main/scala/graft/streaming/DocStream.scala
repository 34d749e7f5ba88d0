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
    * within the watermark horizon of each other. State = one 16-byte
    * binary content hash per distinct doc seen inside the horizon
    * (`unhex(md5)` — full 128-bit collision resistance at half the
    * bytes of the hex string); late duplicates beyond the horizon are a
    * deliberate recall/state tradeoff (tune `watermark` to the re-post
    * window that matters).
    *
    * Null policy: null-text documents PASS THROUGH untouched. Without
    * the guard, `md5(NULL)` is NULL and every null-text doc within the
    * horizon would collapse into a single survivor — nulls are not
    * duplicates of each other, so they bypass dedup state entirely
    * (filter them upstream if they should be rejected instead). */
  def dedupExact(
      docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours"): DataFrame = {
    val withTs = docs.withWatermark(tsCol, watermark)
    val deduped = withTs
      .filter(col(textCol).isNotNull)
      .withColumn("content_hash", unhex(md5(col(textCol))))
      .dropDuplicatesWithinWatermark("content_hash")
    val nulls = withTs
      .filter(col(textCol).isNull)
      .withColumn("content_hash", lit(null).cast("binary"))
    deduped.unionByName(nulls)
  }

  /** Stateless quality gate: literally the batch `text_quality` formula
    * ([[graft.operators.TextOps.qualityScore]] — one shared definition,
    * so a gate value means the same thing in both engines), applied per
    * document as it streams in. */
  def qualityFilter(docs: DataFrame, textCol: String, minScore: Double): DataFrame =
    docs.withColumn("quality",
        round(graft.operators.TextOps.qualityScore(col(textCol)), 4))
      .filter(col("quality") >= minScore)
}
