package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, and batched decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The Spark side — schema, partition-wise batching, operator signatures,
  * column pruning — is real and tested. The codec innards are STUBS
  * (`StubCodec`): no image/audio libraries exist in this container, so
  * decode is a deterministic fake derived from the payload bytes. Swapping
  * `StubCodec` for a real JNI/Java codec changes no plan shape: the
  * mapPartitions batching, the broadcast-free row flow, and the schema
  * contract all stay as-is.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver collect);
  * decode runs per-partition with one codec instance per partition, the
  * JVM analogue of `mapInPandas` batch shape; metadata-only queries never
  * touch payload bytes because metadata is a separate (prunable) column.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Wrap any table with an id + text-ish column into media rows (the
    * testdata has no real binaries; documents.text stands in as payload). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image/fake").as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) + 1).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Deterministic fake codec — the clearly-marked stub boundary. */
  object StubCodec {
    /** "Decode" a payload into a fixed-size feature vector: byte histogram
      * folded to `dim` buckets, L1-normalized. Deterministic, cheap, and
      * shaped exactly like a real embedding extractor's output. */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          acc(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1f
          i += 1
        }
        val total = payload.length.toFloat.max(1f)
        var j = 0
        while (j < dim) { acc(j) /= total; j += 1 }
      }
      acc
    }

    /** "Resize": fake re-encode keeping the first w*h bytes. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (payload == null) null
      else java.util.Arrays.copyOf(payload, math.min(payload.length, w * h))

    /** "Frame-sample": split payload into `n` equal chunks (fake frames). */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      require(n > 0, s"frame count must be positive, got $n")
      if (payload == null || payload.isEmpty) Seq.empty
      else {
        val step = math.max(1, payload.length / n)
        (0 until math.min(n, payload.length)).map { i =>
          val start = i * step
          java.util.Arrays.copyOfRange(payload, start,
            math.min(start + step, payload.length))
        }
      }
    }
  }

  /** Batched feature extraction: one codec pass per partition, appending
    * `features array<float>`. mapPartitions (not a per-row UDF) so a real
    * codec can amortize model/handle setup across the batch — the same
    * reason PySpark uses mapInPandas here. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // one codec instance per partition (stub has no state; a real one would)
      rows.map { r =>
        val f = StubCodec.features(r.getAs[Array[Byte]](payloadIdx), dim)
        Row.fromSeq(r.toSeq :+ f.toSeq)
      }
    }(enc)
  }

  /** Batched resize honoring each row's target metadata. */
  def resizeAll(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(media.schema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq.updated(payloadIdx,
          StubCodec.resize(r.getAs[Array[Byte]](payloadIdx), w, h)))
      }
    }(enc)
  }

  /** Explode each payload into fake frames: (media_id, frame_no, frame). */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        StubCodec.sampleFrames(r.getAs[Array[Byte]](payloadIdx), n)
          .zipWithIndex.map { case (f, i) => Row(r.getLong(idIdx), i, f) }
      }
    }(enc)
  }
}
