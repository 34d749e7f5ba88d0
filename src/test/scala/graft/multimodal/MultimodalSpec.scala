package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "hello world payload", "en", "src0", 19L),
      (2L, "another fake binary blob here", "en", "src1", 29L),
      (3L, "", "de", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("fromDocuments produces the media schema with typed metadata") {
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "meta"))
    val r = m.filter(col("media_id") === 1).head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") == 19L)
    assert(meta.getAs[Int]("width") == 20) // 19 % 64 + 1
  }

  test("extractFeatures appends a normalized float vector per row, deterministic") {
    val m = Multimodal.fromDocuments(docs)
    val f1 = Multimodal.extractFeatures(m, dim = 8).select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(m, dim = 8).select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2) // deterministic stub
    assert(f1(1L).length == 8)
    assert(math.abs(f1(1L).sum - 1.0f) < 1e-5) // L1-normalized histogram
    assert(f1(3L).sum == 0.0f) // empty payload → zero vector
  }

  test("resize truncates payloads to w*h bytes; metadata-only query avoids payloads") {
    val m = Multimodal.fromDocuments(docs)
    val resized = Multimodal.resizeAll(m, 2, 3)
    val sizes = resized.select(col("media_id"), length(col("payload")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sizes(1L) == 6 && sizes(2L) == 6 && sizes(3L) == 0)
    // metadata query prunes the payload column out of the scan
    val metaOnly = m.select(col("media_id"), col("meta.n_bytes"))
    val plan = metaOnly.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }

  test("sampleFrames explodes payloads into frame rows") {
    val m = Multimodal.fromDocuments(docs)
    val frames = Multimodal.sampleFrames(m, 4)
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_no", "frame"))
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 4)
    assert(!byId.contains(3L)) // empty payload → no frames
  }
}
