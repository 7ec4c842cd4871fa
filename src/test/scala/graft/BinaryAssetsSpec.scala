package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}

import graft.multimodal.BinaryAssets
import graft.multimodal.BinaryAssets._

class BinaryAssetsSpec extends SparkTestBase {

  private lazy val assets = syntheticAssets(spark, 99)

  test("asset payloads are opaque binary with parseable synthetic header") {
    val schema = assets.toDF().schema
    assert(schema("payload").dataType === BinaryType)
    val meta = decodeMeta(assets).collect()
    assert(meta.length === 99)
    assert(meta.forall(m => m.width >= 64 && m.height >= 64 && m.n_bytes >= 80))
    assert(meta.map(_.kind).toSet === Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = extractFeatures(assets).orderBy("asset_id").collect()
    val f2 = extractFeatures(assets.repartition(7)).orderBy("asset_id").collect()
    assert(f1.length === 99)
    assert(f1.forall(_.embedding.length === 8))
    // partitioning must not change results
    assert(f1.zip(f2).forall { case (a, b) =>
      a.asset_id === b.asset_id && a.embedding.sameElements(b.embedding) })
    val schema = extractFeatures(assets).toDF().schema
    assert(schema("embedding").dataType === ArrayType(FloatType, containsNull = false))
  }

  test("resize rewrites only the header dims") {
    val resized = resize(assets, 640, 480)
    val meta = decodeMeta(resized).collect()
    assert(meta.forall(m => m.width === 640 && m.height === 480))
    // payload body untouched: features unchanged beyond header
    val f0 = extractFeatures(assets).orderBy("asset_id").collect()
    val f1 = extractFeatures(resized).orderBy("asset_id").collect()
    assert(f0.zip(f1).forall { case (a, b) => a.embedding.sameElements(b.embedding) })
  }

  test("frame sampling explodes videos by duration/stride") {
    val frames = sampleFrames(assets, strideMs = 500)
    val perAsset = frames.groupBy("asset_id").count()
    val joined = decodeMeta(assets).toDF().filter(col("kind") === "video")
      .join(perAsset, "asset_id")
      .withColumn("expected", ceil(col("duration_ms").cast("double") / 500).cast("long"))
    assert(joined.filter(col("count") =!= col("expected")).count() === 0)
    assert(frames.count() > 0)
  }

  test("feature stats aggregate never carries the payload column") {
    val stats = featureStats(extractFeatures(assets))
    assert(!stats.columns.contains("payload"))
    assert(stats.count() === 3 * 8) // kinds x dims
  }
}
