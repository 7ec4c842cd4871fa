package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY payloads + typed metadata, with decode / feature-extract /
  * resize / frame-sample as partition-batched operators.
  *
  * The Spark-side plumbing is real — schemas, Dataset[T] encoders,
  * mapPartitions batch shape (one decoder instance per partition, streamed
  * iterator, no per-row setup), partition sizing guidance. The codec is
  * TWO-TIER: `kind == "image"` payloads are REAL PNGs, generated with and
  * decoded by the JDK's own `javax.imageio` ([[PngCodec]]) — an actual
  * container format through the actual decoder, including the
  * corrupt-payload skip-and-log path a 100 TB crawl needs (a torn blob
  * must cost one log line, not a job). `kind == "audio"` payloads are
  * REAL WAVs, generated with and decoded by the JDK's own
  * `javax.sound.sampled` ([[WavCodec]]) — sample rate, channel count and
  * frame length come from the actual RIFF header, with the same
  * corrupt-payload skip-and-log policy. `kind == "video"` payloads are
  * REAL RIFF/AVI containers parsed by a hand-rolled bounds-checked
  * chunk walker ([[AviCodec]] — the JDK ships no AVI reader; a
  * metadata crawl pass parses headers, it does not open a decoder).
  * FRAME decode stays out of scope on the declared boundary (no video
  * codec in this container): header metadata real, pixel data
  * synthetic, feature pooling ([[FakeCodec]]) deterministic.
  *
  * Scale notes: payloads ride in the row, so (1) project payload-free
  * columns before any shuffle — metadata joins must never move bytes;
  * (2) size partitions by byte budget (maxPartitionBytes / repartition on
  * ingest), not row count; (3) feature extraction is shuffle-free: scan →
  * mapPartitions → columnar write; (4) decode failures are per-row data,
  * not per-task errors — skip, count, continue.
  */
object BinaryAssets {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  case class AssetMeta(asset_id: Long, kind: String, width: Int, height: Int,
                       duration_ms: Long, format: String, n_bytes: Int)
  case class AssetFeatures(asset_id: Long, kind: String, embedding: Array[Float])

  /** =============== REAL CODEC — JDK PNG via javax.imageio ==========
    * The image tier is NOT a stub: payloads are real PNG containers and
    * decode goes through `ImageIO`. All entry points are total — a
    * corrupt/truncated payload yields None (the caller skips and logs),
    * never an exception, so one bad blob in a 10^10-row crawl costs a
    * counter bump, not a task retry storm.
    */
  object PngCodec {
    // ImageIO defaults to a FILE-backed stream cache: every read/write
    // spills through a temp file, so a 32-thread decode sweep serializes
    // on tmpfs churn (measured: t45 scaled 17x for 10x assets at sf1.0;
    // memory-cached it is linear). Payloads here are in-memory byte
    // arrays — cache to heap, never to disk.
    javax.imageio.ImageIO.setUseCache(false)

    private def readPng(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Real decode: dimensions from the decoded image, not from any
      * header arithmetic. Images have no duration; format is the real
      * media type.
      */
    def decodeMeta(a: Asset): Option[AssetMeta] =
      readPng(a.payload).map(img =>
        AssetMeta(a.asset_id, a.kind, img.getWidth, img.getHeight, 0L,
          "image/png", a.payload.length))

    /** Real resize: decode → bilinear-scaled redraw → re-encode. None on
      * a corrupt source (caller passes the asset through untouched).
      */
    def resize(a: Asset, w: Int, h: Int): Option[Asset] =
      readPng(a.payload).map { img =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        a.copy(payload = bos.toByteArray)
      }

    /** Deterministic synthetic PNG at the contract dims — real container
      * bytes from the real encoder, pixels a cheap id-seeded pattern.
      */
    def synthesize(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val pix = Array.tabulate(w * h)(i =>
        ((i % w) * 31 + (i / w) * 17 + id.toInt * 7) & 0xFFFFFF)
      img.setRGB(0, 0, w, h, pix, 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }
  // ================= end real codec ================================

  /** =============== REAL CODEC — JDK WAV via javax.sound.sampled =====
    * The audio tier is NOT a stub either: payloads are real RIFF/WAVE
    * containers (PCM) and decode goes through `AudioSystem`'s header
    * reader — a pure header parse (frame length, frame rate, channels),
    * no sample decode, which is exactly the metadata pass a 100 TB
    * crawl runs. Total like the PNG tier: a corrupt/truncated payload
    * yields None, the caller skips and logs.
    *
    * Duration contract: the generator writes [[SampleRateHz]] = 1000 Hz
    * mono 8-bit PCM, so frameLength ≡ duration in milliseconds exactly —
    * the decoded duration is INTEGER-recoverable on both engines (the
    * DuckDB oracle replays it from the generator arithmetic; a wrong
    * header parse hash-mismatches).
    */
  object WavCodec {
    val SampleRateHz = 1000f

    private def readHeader(payload: Array[Byte]): Option[javax.sound.sampled.AudioFileFormat] =
      try Option(javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Real decode: duration from the RIFF header's frame length / frame
      * rate. Audio has no dimensions; format is the real media type.
      */
    def decodeMeta(a: Asset): Option[AssetMeta] =
      readHeader(a.payload).flatMap { aff =>
        val fmt = aff.getFormat
        val frames = aff.getFrameLength
        if (frames < 0 || fmt.getFrameRate <= 0) None
        else Some(AssetMeta(a.asset_id, a.kind, 0, 0,
          math.round(frames * 1000.0 / fmt.getFrameRate),
          "audio/wav", a.payload.length))
      }

    /** Deterministic synthetic WAV — real container bytes from the real
      * writer, samples a cheap id-seeded pattern, `durationMs` frames at
      * the 1 kHz contract rate.
      */
    def synthesize(id: Long, durationMs: Long): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(SampleRateHz, 8, 1, false, false)
      val samples = Array.tabulate(durationMs.toInt)(i => ((i * 31 + id * 7) & 0xFF).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }
  // ================= end real codec ================================

  /** =============== REAL CONTAINER — RIFF/AVI, hand-rolled ==========
    * The video tier's METADATA pass is now a real container parse: the
    * generator writes spec-conformant RIFF/AVI files (`avih` main
    * header + a `vids` stream with a BITMAPINFOHEADER + a `movi` list
    * carrying a seeded `00db` frame chunk) and decode walks the actual
    * chunk structure — no fixed offsets, every read bounds-checked, any
    * malformed byte yields None (skip-and-log, same policy as the PNG
    * and WAV tiers). The JDK ships no AVI reader, so the walker is
    * hand-rolled, which is exactly what a metadata-only crawl pass does
    * in production (opening a full video decoder to read width/height/
    * duration is the expensive wrong tool). FRAME decode remains out of
    * scope (no codec in this container) — the honest boundary: header
    * metadata real, pixel data synthetic.
    *
    * Duration contract mirrors the WAV tier's 1 kHz trick:
    * dwMicroSecPerFrame = 1000 (a 1000 fps stream), so dwTotalFrames ≡
    * duration in milliseconds exactly — integer-recoverable on both
    * engines, a wrong offset or endianness hash-mismatches the oracle.
    */
  object AviCodec {
    private val LE = java.nio.ByteOrder.LITTLE_ENDIAN
    val MicroSecPerFrame = 1000

    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** Deterministic synthetic AVI — real chunk structure, one seeded
      * frame chunk as the movi body.
      */
    def synthesize(id: Long, w: Int, h: Int, durationMs: Long): Array[Byte] = {
      val rnd = new scala.util.Random(id)
      val frame = Array.fill[Byte](64 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val framePad = frame.length & 1 // RIFF chunks are word-aligned
      val moviContent = 4 + 8 + frame.length + framePad
      val hdrlContent = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val riffSize = 4 + (8 + hdrlContent) + (8 + moviContent)
      val bb = java.nio.ByteBuffer.allocate(8 + riffSize).order(LE)
      bb.put(fourcc("RIFF")).putInt(riffSize).put(fourcc("AVI "))
      bb.put(fourcc("LIST")).putInt(hdrlContent).put(fourcc("hdrl"))
      bb.put(fourcc("avih")).putInt(56)
        .putInt(MicroSecPerFrame)     // dwMicroSecPerFrame: the 1000 fps contract
        .putInt(0).putInt(0).putInt(0)
        .putInt(durationMs.toInt)     // dwTotalFrames ≡ duration_ms
        .putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h)          // dwWidth, dwHeight
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.put(fourcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(fourcc("strl"))
      bb.put(fourcc("strh")).putInt(56)
        .put(fourcc("vids")).put(fourcc("DIB "))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(1000)       // dwScale/dwRate: 1000 fps again
        .putInt(0).putInt(durationMs.toInt)
        .putInt(0).putInt(0).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      bb.put(fourcc("strf")).putInt(40)
        .putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24).putInt(0).putInt(w * h * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.put(fourcc("LIST")).putInt(moviContent).put(fourcc("movi"))
      bb.put(fourcc("00db")).putInt(frame.length).put(frame)
      if (framePad == 1) bb.put(0.toByte)
      bb.array()
    }

    private def cc(p: Array[Byte], off: Int): String =
      if (off + 4 > p.length) "" else new String(p, off, 4, "US-ASCII")

    private def u32(p: Array[Byte], off: Int): Long =
      if (off + 4 > p.length) -1L
      else java.nio.ByteBuffer.wrap(p, off, 4).order(LE).getInt.toLong & 0xFFFFFFFFL

    /** Payload offset of the `avih` chunk body, found by WALKING the
      * chunk tree (RIFF → hdrl LIST → avih) — None on any malformed
      * structure.
      */
    private def avihOffset(p: Array[Byte]): Option[Int] = {
      if (cc(p, 0) != "RIFF" || cc(p, 8) != "AVI ") return None
      val end = math.min(p.length.toLong, 8 + u32(p, 4))
      var off = 12L
      while (off + 12 <= end) {
        val size = u32(p, off.toInt + 4)
        if (size < 0) return None
        if (cc(p, off.toInt) == "LIST" && cc(p, off.toInt + 8) == "hdrl") {
          var in = off + 12
          val listEnd = math.min(end, off + 8 + size)
          while (in + 8 <= listEnd) {
            val innerSize = u32(p, in.toInt + 4)
            if (innerSize < 0) return None
            if (cc(p, in.toInt) == "avih")
              return if (in + 8 + 56 <= listEnd) Some(in.toInt + 8) else None
            in += 8 + innerSize + (innerSize & 1)
          }
          return None
        }
        off += 8 + size + (size & 1)
      }
      None
    }

    /** Real decode: width/height/duration from the walked avih header.
      * duration_ms = dwTotalFrames × dwMicroSecPerFrame / 1000.
      */
    def decodeMeta(a: Asset): Option[AssetMeta] =
      avihOffset(a.payload).flatMap { at =>
        val p = a.payload
        val uspf = u32(p, at)
        val frames = u32(p, at + 16)
        val w = u32(p, at + 32)
        val h = u32(p, at + 36)
        if (uspf <= 0 || frames < 0 || w <= 0 || h <= 0) None
        else Some(AssetMeta(a.asset_id, a.kind, w.toInt, h.toInt,
          frames * uspf / 1000, "video/avi", p.length))
      }

    /** Header-level "resize": patch dwWidth/dwHeight in the walked avih;
      * the strf BITMAPINFOHEADER is patched too when it sits at the
      * generator's layout (fourcc-verified before writing — a foreign
      * AVI just keeps its strf). Container stays valid; frame bytes
      * untouched.
      */
    def withDims(a: Asset, w: Int, h: Int): Option[Asset] =
      avihOffset(a.payload).map { at =>
        val p = a.payload.clone()
        val bb = java.nio.ByteBuffer.wrap(p).order(LE)
        bb.putInt(at + 32, w).putInt(at + 36, h)
        // strf follows strh inside the strl LIST that follows avih:
        // avih body (56) + LIST header (12) + strh chunk (8+56) + 'strf' + size
        val strfAt = at + 56 + 12 + 64 + 8
        if (strfAt + 40 <= p.length && cc(p, strfAt - 8) == "strf") {
          bb.putInt(strfAt + 4, w).putInt(strfAt + 8, h)
        }
        a.copy(payload = p)
      }

    /** The movi list's bytes (frame chunks) — the "pixel data" slice
      * feature pooling reads, so header patches (withDims) cannot move a
      * downstream feature.
      */
    def frameBytes(p: Array[Byte]): Array[Byte] = {
      if (cc(p, 0) != "RIFF" || cc(p, 8) != "AVI ") return Array.emptyByteArray
      val end = math.min(p.length.toLong, 8 + u32(p, 4))
      var off = 12L
      while (off + 12 <= end) {
        val size = u32(p, off.toInt + 4)
        if (size < 0) return Array.emptyByteArray
        if (cc(p, off.toInt) == "LIST" && cc(p, off.toInt + 8) == "movi") {
          val from = off.toInt + 12
          val to = math.min(end, off + 8 + size).toInt
          return if (from <= to) p.slice(from, to) else Array.emptyByteArray
        }
        off += 8 + size + (size & 1)
      }
      Array.emptyByteArray
    }
  }
  // ================= end real container =============================

  /** =============== POOLING (deterministic, all tiers) ==============
    * Byte-pooled embeddings — the stand-in for a learned feature
    * extractor (none ships with the JDK; the swap-in point). Video
    * pools its movi FRAME bytes (via the real chunk walk) so container-
    * header edits never move a feature; other kinds pool the payload
    * past a fixed prefix.
    */
  object FakeCodec {
    /** "Pixel decode + pooled embedding": bytes → `dim` pooled buckets. */
    def extractFeatures(a: Asset, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val body =
        if (a.kind == "video") AviCodec.frameBytes(a.payload)
        else a.payload.drop(16)
      var i = 0
      while (i < body.length) {
        out(i % dim) += (body(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, body.length / dim)
      out.map(_ / n)
    }
  }
  // ================= end pooling ===================================

  /** Deterministic synthetic asset table. Stands in for
    * `spark.read.format("binaryFile")` ingest. Image payloads are REAL
    * PNGs at the contract dims (width = 64 + (id%4)·64, height =
    * 64 + (id%3)·64 — encoded into the container, recovered by the real
    * decoder); audio payloads are REAL WAVs carrying the contract
    * duration (1000 + (id mod 500)·10 ms at the 1 kHz rate — in the RIFF header,
    * recovered by the real decoder); video payloads are REAL RIFF/AVI
    * containers carrying the contract dims + duration (1000 + (id mod 500)·10
    * frames at 1000 fps — in the avih header, recovered by the real
    * chunk walker) around a seeded frame chunk.
    */
  /** The duration contract, CAPPED: 1000 + (id mod 500)·10 ms. The cap
    * is a scale bug fix found by the round-11 sf1.0 verify: an uncapped
    * `1000 + id·10` makes the WAV payload (1 byte/ms) grow linearly
    * with asset_id, and at 60k assets the vectorized parquet reader
    * must reserve batch-rows × ~600 KB contiguous — OOM on read. Real
    * corpora have bounded blob sizes; the synthetic contract now does
    * too (≤ ~6 KB audio). Real 100 TB blob scans with genuinely large
    * payloads drop `spark.sql.parquet.columnarReaderBatchSize` instead.
    */
  def contractDurationMs(id: Long): Long = 1000L + (id % 500) * 10

  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val w = 64 + (id % 4).toInt * 64
      val h = 64 + (id % 3).toInt * 64
      (id % 3) match {
        case 0 => Asset(id, "image", PngCodec.synthesize(id, w, h))
        case 1 => Asset(id, "audio", WavCodec.synthesize(id, contractDurationMs(id)))
        case _ => Asset(id, "video", AviCodec.synthesize(id, w, h, contractDurationMs(id)))
      }
    }
  }

  /** Decode metadata: partition-batched, payload dropped from the output
    * so downstream joins/aggregations never shuffle bytes. Image rows go
    * through the REAL PNG decoder, audio rows through the REAL WAV
    * header reader; a corrupt payload on either real tier is SKIPPED
    * with one stderr line (per row, data-plane policy — a torn blob must
    * never kill the job), spec-pinned in BinaryAssetsSpec.
    */
  def decodeMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // one codec per partition would be initialized HERE (real codecs
      // have per-process setup cost); ImageIO/AudioSystem/fake need none
      def skipLogged(a: Asset, decoded: Option[AssetMeta]): Option[AssetMeta] = decoded match {
        case some @ Some(_) => some
        case None =>
          System.err.println(s"[assets] skipping corrupt ${a.kind} payload asset_id=${a.asset_id}")
          None
      }
      it.flatMap { a =>
        a.kind match {
          case "image" => skipLogged(a, PngCodec.decodeMeta(a))
          case "audio" => skipLogged(a, WavCodec.decodeMeta(a))
          case _       => skipLogged(a, AviCodec.decodeMeta(a))
        }
      }
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

  /** Resize — payload-in/payload-out transform. Images: REAL decode →
    * bilinear rescale → re-encode through ImageIO (a corrupt source
    * passes through untouched, logged). Audio: pass-through — a spatial
    * resize is meaningless for a waveform, and patching bytes into a
    * real RIFF container would corrupt it. Video (stub): rewrite the
    * header dims, payload body opaque.
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      a.kind match {
        case "image" => PngCodec.resize(a, w, h).getOrElse {
          System.err.println(s"[assets] resize: corrupt image payload asset_id=${a.asset_id}, passing through")
          a
        }
        case "audio" => a
        case _ => AviCodec.withDims(a, w, h).getOrElse {
          System.err.println(s"[assets] resize: corrupt video payload asset_id=${a.asset_id}, passing through")
          a
        }
      }
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

  // ---------------------------------------------------------------- t44
  /** The PERSISTED asset table — [[syntheticAssets]] materialized to
    * parquet in the corpus's index warehouse, stamped like every fitted
    * artifact (one row per document in the corpus, so the table scales
    * with the testdata contract and regenerated testdata re-materializes
    * it). This is what stands in for the raw `binaryFile` ingest at the
    * verification layer: the t44 query READS BINARY PAYLOADS FROM
    * PARQUET and decodes them through the partition-batched codec path,
    * while the DuckDB oracle reads the SAME parquet — payload sizes via
    * `octet_length`, header fields via the generator's arithmetic — so a
    * broken decode (wrong offsets, wrong endianness, payload truncation
    * in the write path) hash-mismatches.
    */
  val TableName = "binary_assets"

  val AssetSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("asset_id", LongType),
      StructField("kind", StringType),
      StructField("payload", BinaryType),
      StructField("corpus_stamp", StringType)))
  }

  /** Frame-sampling stride of the registered t44 query (and its oracle). */
  val StrideMs = 250L

  def ensureAssets(spark: SparkSession, dir: String): Unit = {
    import graft.queries.{IvfModel, StampedTable}
    val wh = IvfModel.warehouseFor(spark, dir)
    // v2: image payloads became real PNGs; v3: audio payloads became
    // real WAVs; v4: video payloads became real RIFF/AVI containers;
    // v5: the duration contract gained its scale cap — existing
    // warehouses must re-materialize, not serve older blobs to the
    // real decoders / capped oracle
    val stamp = s"assets-v5\n$dir\n" +
      graft.core.Tables.contentStamp(spark, s"$dir/documents.parquet")
    StampedTable.ensure(wh, TableName, AssetSchema, stamp) {
      // one count at materialization time only (stamped thereafter)
      val n = graft.core.Tables.documents(spark, dir).count().toInt
      syntheticAssets(spark, n).toDF()
    }
  }

  /** DECODED-METADATA CACHE — the serving-path answer to "asset decode
    * is CPU-linear": the codec pass over the whole asset table runs
    * ONCE, at build time, into a stamped payload-free parquet
    * (re-materialized when the asset generation changes); a serving
    * query reads seven narrow columns instead of re-decoding binary
    * blobs. t44/t45 stay REAL-decode queries on purpose — they are the
    * driver's proof the codec path works — while anything that serves
    * metadata repeatedly (dashboards, joins against asset dims) reads
    * this table. AssetMetaCacheSpec-pinned: cache == live decode
    * row-for-row, and a refreshed asset generation invalidates it.
    */
  val MetaTableName = "binary_asset_meta"

  val MetaSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("asset_id", LongType),
      StructField("kind", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType),
      StructField("n_bytes", IntegerType),
      StructField("corpus_stamp", StringType)))
  }

  def ensureAssetMeta(spark: SparkSession, dir: String): Unit = {
    import graft.queries.{IvfModel, StampedTable}
    ensureAssets(spark, dir)
    val wh = IvfModel.warehouseFor(spark, dir)
    val stamp = s"asset-meta-v1\n$dir\n" +
      graft.core.Tables.contentStamp(spark, s"$dir/documents.parquet")
    StampedTable.ensure(wh, MetaTableName, MetaSchema, stamp) {
      decodeMeta(assets(spark, dir)).toDF()
    }
  }

  /** The cached decoded metadata (payload-free). Caller runs
    * [[ensureAssetMeta]] first.
    */
  def assetMeta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.queries.IvfModel.warehouseFor(spark, dir)
      .read(MetaTableName, MetaSchema)
      .select(col("asset_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), col("format"), col("n_bytes"))
  }

  /** The persisted assets as the typed Dataset the operators take. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.queries.IvfModel.warehouseFor(spark, dir)
      .read(TableName, AssetSchema)
      .select(col("asset_id"), col("kind"), col("payload"))
      .as[Asset]
  }

  /** Registered, oracle-checked frame sampling: decode every video
    * asset's header THROUGH THE BINARY CODEC PATH (mapPartitions over
    * the payload column) and expand it to sampled frame rows. The
    * payload byte count rides along so the oracle cross-checks the
    * binary write/read round-trip, not just the arithmetic.
    */
  def t44FrameSample(s: SparkSession, dir: String): DataFrame = {
    ensureAssets(s, dir)
    // kind filter BELOW the decode: it reaches the parquet scan as a
    // pushed predicate, so a video-only query never pays the real
    // image/audio codec cost of the other two slices (those decodes are
    // t45's job). Decode cost is per-row CPU — pruning the rows is the
    // only lever.
    decodeMeta(assets(s, dir).filter(col("kind") === "video")).toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0L), expr(s"(duration_ms - 1) div $StrideMs"))))
      .select(col("asset_id"), col("width"), col("height"), col("n_bytes"),
        col("frame_idx"), (col("frame_idx") * StrideMs).as("frame_ts_ms"))
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  /** t44's companion over ALL kinds: the full decoded-metadata frame —
    * every asset through the codec path (t44 exercises only the video
    * slice), so a decode regression on image/audio headers or the
    * kind→format mapping is driver-caught too.
    */
  def t45AssetMeta(s: SparkSession, dir: String): DataFrame = {
    ensureAssets(s, dir)
    decodeMeta(assets(s, dir)).toDF()
      .select(col("asset_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), col("format"), col("n_bytes"))
      .orderBy(col("asset_id"))
  }

  /** t45's oracle: width/height/duration via the GENERATOR's contract
    * arithmetic — for images that is exactly what the real encoder wrote
    * into the PNG container, and for audio what the real WAV writer put
    * in the RIFF header (1000 + (id mod 500)·10 frames at the 1 kHz contract
    * rate = the duration in ms), so the Spark side's REAL `ImageIO` /
    * `AudioSystem` decodes must recover them (an offset/endianness/
    * frame-rate bug hash-mismatches); n_bytes from the blob itself
    * cross-checks the binary round-trip. Video goes the same way: dims
    * + duration sit in the real avih header [[AviCodec]] walks. Images
    * have no duration, audio no dimensions; all three tiers carry the
    * real media type.
    */
  def t45SqlFor(dir: String): String =
    s"""SELECT asset_id, kind,
       |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (asset_id % 4) * 64 END AS INT) AS width,
       |  CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + (asset_id % 3) * 64 END AS INT) AS height,
       |  CASE WHEN kind = 'image' THEN 0 ELSE 1000 + (asset_id % 500) * 10 END AS duration_ms,
       |  CASE kind WHEN 'image' THEN 'image/png' WHEN 'audio' THEN 'audio/wav'
       |       ELSE 'video/avi' END AS format,
       |  CAST(octet_length(payload) AS INT) AS n_bytes
       |FROM read_parquet('${graft.queries.IvfModel.oraclePathFor(dir, TableName)}/*.parquet')
       |ORDER BY asset_id""".stripMargin

  /** DuckDB replay over the SAME persisted parquet: payload length from
    * the blob itself, header fields from the generator's arithmetic
    * (width = 64 + (id % 4)·64, height = 64 + (id % 3)·64, duration_ms =
    * 1000 + (id mod 500)·10 — the contract [[syntheticAssets]] writes into the
    * AVI's avih header and [[AviCodec.decodeMeta]] must walk back out),
    * frames = one row per stride start inside the duration.
    */
  def t44SqlFor(dir: String): String =
    s"""WITH a AS (
       |  SELECT asset_id, kind, CAST(octet_length(payload) AS INT) AS n_bytes
       |  FROM read_parquet('${graft.queries.IvfModel.oraclePathFor(dir, TableName)}/*.parquet')),
       |v AS (
       |  SELECT asset_id, n_bytes,
       |    CAST(64 + (asset_id % 4) * 64 AS INT) AS width,
       |    CAST(64 + (asset_id % 3) * 64 AS INT) AS height,
       |    1000 + (asset_id % 500) * 10 AS duration_ms
       |  FROM a WHERE kind = 'video'),
       |f AS (
       |  SELECT asset_id, width, height, n_bytes,
       |    unnest(range(0, ((duration_ms - 1) // $StrideMs) + 1)) AS frame_idx
       |  FROM v)
       |SELECT asset_id, width, height, n_bytes, frame_idx,
       |  frame_idx * $StrideMs AS frame_ts_ms
       |FROM f ORDER BY asset_id, frame_idx""".stripMargin
}
