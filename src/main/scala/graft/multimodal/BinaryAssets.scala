package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY payloads + typed metadata, with decode / feature-extract /
  * resize / frame-sample as partition-batched operators.
  *
  * The Spark-side plumbing is real — schemas, Dataset[T] encoders,
  * mapPartitions batch shape (one decoder instance per partition, streamed
  * iterator, no per-row setup), partition sizing guidance — while the
  * codec itself is a STUB: this container has no image/audio libraries, so
  * `FakeCodec` decodes a deterministic synthetic header instead. Swapping
  * in a real codec changes only the marked lines.
  *
  * Scale notes: payloads ride in the row, so (1) project payload-free
  * columns before any shuffle — metadata joins must never move bytes;
  * (2) size partitions by byte budget (maxPartitionBytes / repartition on
  * ingest), not row count; (3) feature extraction is shuffle-free: scan →
  * mapPartitions → columnar write.
  */
object BinaryAssets {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  case class AssetMeta(asset_id: Long, kind: String, width: Int, height: Int,
                       duration_ms: Long, format: String, n_bytes: Int)
  case class AssetFeatures(asset_id: Long, kind: String, embedding: Array[Float])

  /** =============== STUB CODEC — deterministic fake =================
    * A real implementation would call an image/audio decoder here. The
    * fake reads our synthetic 16-byte header and derives pixels/samples
    * from a seeded hash so every metric downstream is reproducible.
    */
  object FakeCodec {
    def decodeMeta(a: Asset): AssetMeta = {
      val b = java.nio.ByteBuffer.wrap(a.payload.take(16))
      AssetMeta(a.asset_id, a.kind, b.getInt(0), b.getInt(4), b.getLong(8),
        a.kind match { case "image" => "fake/png"; case "audio" => "fake/wav"; case _ => "fake/mp4" },
        a.payload.length)
    }

    /** Fake "pixel decode + pooled embedding": bytes → 8 pooled buckets. */
    def extractFeatures(a: Asset, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val body = a.payload.drop(16)
      var i = 0
      while (i < body.length) {
        out(i % dim) += (body(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, body.length / dim)
      out.map(_ / n)
    }
  }
  // ================= end stub codec ================================

  /** Deterministic synthetic asset table (payload = header + seeded bytes).
    * Stands in for `spark.read.format("binaryFile")` ingest.
    */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val rnd = new scala.util.Random(id)
      val body = Array.fill[Byte](64 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val header = java.nio.ByteBuffer.allocate(16)
        .putInt(0, 64 + (id % 4).toInt * 64)  // width
        .putInt(4, 64 + (id % 3).toInt * 64)  // height
        .putLong(8, 1000L + id * 10)          // duration_ms
        .array()
      Asset(id, kind, header ++ body)
    }
  }

  /** Decode metadata: partition-batched, payload dropped from the output
    * so downstream joins/aggregations never shuffle bytes.
    */
  def decodeMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // one codec per partition would be initialized HERE (real codecs
      // have per-process setup cost); the fake needs none
      it.map(FakeCodec.decodeMeta)
    }
  }

  /** Feature extraction: scan → mapPartitions → Array[Float] embedding
    * column, the same shape the embeddings table uses.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 8): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => AssetFeatures(a.asset_id, a.kind, FakeCodec.extractFeatures(a, dim)))
    }
  }

  /** "Resize" (stub): rewrite the header dims, keep payload opaque —
    * demonstrates payload-in/payload-out transforms.
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val p = a.payload.clone()
      val bb = java.nio.ByteBuffer.wrap(p)
      bb.putInt(0, w); bb.putInt(4, h)
      a.copy(payload = p)
    })
  }

  /** Frame sampling (stub): every video asset → ceil(duration/stride)
    * frame rows — the generator-shaped op (one row in, many out).
    */
  def sampleFrames(assets: Dataset[Asset], strideMs: Long): DataFrame = {
    val meta = decodeMeta(assets).toDF()
    meta.filter(col("kind") === "video")
      .withColumn("frame_idx",
        // integer division: Column./ is float division and sequence would
        // round its bound, over-sampling exact multiples of the stride
        explode(sequence(lit(0L), expr(s"(duration_ms - 1) div $strideMs"))))
      .withColumn("frame_ts_ms", col("frame_idx") * strideMs)
      .select(col("asset_id"), col("frame_idx"), col("frame_ts_ms"))
  }

  /** Mean embedding per kind — metadata-only aggregate over extracted
    * features (payloads long gone by this stage).
    */
  def featureStats(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .select(col("kind"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("kind"), col("dim"))
      .agg(round(avg(col("v")), 6).as("mean_v"))
      .orderBy(col("kind"), col("dim"))
}
