package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

import graft.queries.QualityOps

/** documents-schema record for the streaming test's MemoryStream encoder. */
case class QDoc(doc_id: Long, text: String, lang: String, source: String, n_chars: Int)
object QDoc {
  def apply(id: Long, text: String): QDoc = QDoc(id, text, "en", "unit", text.length)
}

class QualityOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length($"text"))

  // ------------------------------------------------------------- t20
  test("t20 quality flags: clean prose kept; bullets, symbols, dup lines dropped") {
    val prose = (1 to 30).map(i => s"word$i").mkString(" ")
    val bullets = (1 to 12).map(i => s"- item$i of the list").mkString("\n")
    val symbols = "@#$% ^&*( )!~ @#$% ^&*( )!~ @#$% ^&*( )!~ @#$% ^&*( )!~"
    val dupLines = (("unique line one" +: Seq.fill(9)("the same line twice")) :+
      "unique line two").mkString("\n")
    val out = QualityOps.qualityFlagsOf(docs(
      1L -> prose, 2L -> bullets, 3L -> symbols, 4L -> dupLines))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out(1L) === true)
    assert(out(2L) === false) // every line is a bullet
    assert(out(3L) === false) // symbol ratio ≈ 0.7
    assert(out(4L) === false) // 9/11 duplicate lines
  }

  test("t20 signals: exact ratios on a crafted doc") {
    val text = "alpha beta\nalpha beta\n- bullet here and more words padd"
    val r = QualityOps.qualityFlagsOf(docs(1L -> text)).collect().head
    assert(r.getAs[Int]("n_lines") === 3)
    // 1 bullet line of 3; 1 duplicated line of 3 — halfUp to 4 dp
    assert(r.getAs[Double]("bullet_ratio") === 0.3333)
    assert(r.getAs[Double]("dup_line_frac") === 0.3333)
  }

  // ------------------------------------------------------------- t21
  test("t21 PII scan counts and verified redaction") {
    val pii = "contact bob.smith+x@corp.example.com or +52 55 1234 5678 " +
      "from 10.0.0.17 today"
    val clean = "no personal data in this sentence at all"
    val out = QualityOps.piiScanOf(docs(1L -> pii, 2L -> clean)).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Int]("n_emails") === 1)
    assert(byId(1L).getAs[Int]("n_ips") === 1)
    assert(byId(1L).getAs[Int]("n_phones") === 1)
    assert(byId(1L).getAs[Boolean]("has_pii"))
    assert(!byId(2L).getAs[Boolean]("has_pii"))
    // redaction verified by content: re-scanning the redacted text finds
    // nothing, and its hash differs from the original's
    val redacted = pii
      .replaceAll(QualityOps.EmailPat, "<EMAIL>")
      .replaceAll(QualityOps.Ipv4Pat, "<IP>")
      .replaceAll(QualityOps.PhonePat, "<PHONE>")
    val rescan = QualityOps.piiScanOf(docs(1L -> redacted)).collect().head
    assert(!rescan.getAs[Boolean]("has_pii"))
    assert(byId(1L).getAs[String]("redacted_hash") !==
      java.security.MessageDigest.getInstance("MD5").digest(pii.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    // an unredacted clean doc's hash IS the original md5
    assert(byId(2L).getAs[String]("redacted_hash") ===
      java.security.MessageDigest.getInstance("MD5").digest(clean.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  // ------------------------------------------------------------- t22
  test("t22 contamination: planted 13-gram overlap is found, clean docs are not") {
    val leaked = (1 to 20).map(i => s"tok$i").mkString(" ") // 20 shared tokens
    val probeDoc = s"benchmark question preamble $leaked and trailing words"
    val contaminated = s"training page happens to contain $leaked inside prose"
    val clean = (100 to 140).map(i => s"other$i").mkString(" ")
    // ProbeMod = 17: doc 0 and 17 are probe-side; 1, 2 corpus-side
    val out = QualityOps.contaminationOf(docs(
      0L -> probeDoc, 1L -> contaminated, 2L -> clean))
      .as[(Long, Long, Long)].collect()
    assert(out.map(t => (t._1, t._2)).toSet === Set((0L, 1L)))
    // 20 shared tokens → 20 − 13 + 1 = 8 shared distinct 13-grams
    assert(out.head._3 === 8L)
  }

  test("t22 production shape: contamination against an external probe table") {
    val leaked = (1 to 14).map(i => s"eval$i").mkString(" ")
    val corpus = docs(100L -> s"web page quoting $leaked verbatim",
      101L -> "unrelated training text with plenty of words here")
    val probe = docs(7L -> s"benchmark item: $leaked")
    val out = QualityOps.contaminationAgainst(corpus, probe)
      .as[(Long, Long, Long)].collect()
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((7L, 100L)))
    assert(out.head._3 === 2L) // 14 shared tokens → 2 shared 13-grams
  }

  test("t22 plan: probe side broadcasts (no corpus-side shuffle for the join)") {
    val plan = QualityOps.contaminationOf(docs(
      0L -> "a b c d e f g h i j k l m n o p", 1L -> "q r s t u v w x y z a2 b2 c2"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"contamination join should broadcast the probe side:\n$plan")
  }

  // ------------------------------------------------------------- t23
  test("t23 stratified sample: per-stratum quota and re-run determinism") {
    val rows = (1L to 40L).map(i => i -> s"text $i about topic ${i % 7}")
    val base = docs(rows: _*)
      .withColumn("lang", when($"doc_id" % 2 === 0, "en").otherwise("es"))
    val s1 = QualityOps.stratifiedSampleOf(base)
      .select("doc_id").as[Long].collect().toSet
    // ceil(0.1 * 20) = 2 docs per stratum
    assert(s1.size === 4)
    val s2 = QualityOps.stratifiedSampleOf(base.repartition(7))
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2) // partitioning-independent membership
  }

  test("t23 scale path: hash-threshold sample hits frac per stratum, stable under growth") {
    def corpus(n: Long) = docs((1L to n).map(i => i -> s"text $i"): _*)
      .withColumn("lang", when($"doc_id" % 2 === 0, "en").otherwise("es"))
    val s1 = QualityOps.stratifiedSampleApproxOf(corpus(2000))
      .select("doc_id").as[Long].collect().toSet
    // binomial around 10% per stratum (1000 docs each)
    val fracEn = s1.count(_ % 2 == 0) / 1000.0
    val fracEs = s1.count(_ % 2 == 1) / 1000.0
    assert(fracEn > 0.06 && fracEn < 0.14, s"en stratum sampled at $fracEn")
    assert(fracEs > 0.06 && fracEs < 0.14, s"es stratum sampled at $fracEs")
    // growing the corpus never changes an existing doc's membership —
    // the property the per-stratum-quota (and any rand()) variant loses
    val s2 = QualityOps.stratifiedSampleApproxOf(corpus(3000))
      .select("doc_id").as[Long].collect().toSet
    assert(s2.filter(_ <= 2000L) === s1)
  }

  // ------------------------------------------------------------- t24
  test("t24 source mix: fractions sum to 1, weights flatten the mix") {
    val rows = (1L to 30L).map(i => i -> s"doc number $i")
    val base = docs(rows: _*)
      .withColumn("source",
        when($"doc_id" <= 15, "web").when($"doc_id" <= 25, "books").otherwise("code"))
    val out = QualityOps.sourceMixOf(base)
      .select("source", "n_docs", "actual_frac", "uniform_weight")
      .as[(String, Long, Double, Double)].collect()
    assert(out.map(_._3).sum === 1.0 +- 1e-4)
    // n_docs · weight is the same for every source: the flattened mix
    val flattened = out.map(t => t._2 * t._4)
    assert(flattened.max === flattened.min +- 1e-3)
  }

  test("t20 signals run unchanged on a structured stream (stream == batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val data = Seq(
      QDoc(1L, (1 to 30).map(i => s"word$i").mkString(" ")),
      QDoc(2L, "- a\n- b\n- c"),
      QDoc(3L, "@#$% ^&*( )!~ @#$% ^&*( )!~"))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[QDoc]
    stream.addData(data: _*)
    val q = QualityOps.qualitySignalsOf(stream.toDF())
      .writeStream.format("memory").queryName("q20_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("q20_stream").orderBy("doc_id").collect().toSeq
    val batch = QualityOps.qualityFlagsOf(
      data.toDF()).collect().toSeq
    assert(streamed === batch)
  }

  // ------------------------------------------------------------- t26
  test("t26 split leakage: cross-split 13-gram overlap found; within-train ignored") {
    val leaked = (1 to 15).map(i => s"tok$i").mkString(" ")
    // md5-bucket assignment: ids 1,2 → train; 11 → val (computed from the
    // same md5(doc_id) % 100 both engines use)
    val out = QualityOps.splitLeakageOf(docs(
      1L -> s"train page with $leaked inside",
      2L -> s"another train page with $leaked copy", // train↔train: not leakage
      11L -> s"val question contains $leaked too"))
      .select("eval_doc", "eval_split", "train_doc", "n_shared_ngrams")
      .as[(Long, String, Long, Long)].collect().toSet
    // 15 shared tokens → 3 shared 13-grams per (train, eval) pair
    assert(out === Set((11L, "val", 1L, 3L), (11L, "val", 2L, 3L)))
  }

  test("t28 decontaminated split: leaked train docs quarantined, eval untouched") {
    val leaked = (1 to 15).map(i => s"tok$i").mkString(" ")
    val out = QualityOps.decontaminatedSplitOf(docs(
      1L -> s"train page with $leaked inside",      // train, leaks into 11 → quarantined
      2L -> "clean train page about something else entirely with words",
      11L -> s"val question contains $leaked too")) // val: never quarantined
      .select("doc_id", "split", "final_split")
      .as[(Long, String, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) === ("train", "quarantined"))
    assert(out(2L) === ("train", "train"))
    assert(out(11L) === ("val", "val"))
  }

  // ------------------------------------------------------------- t27
  test("t27 int8 quantization: scale, reconstruction error bound, zero-vector guard") {
    val embs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.125f), "a"),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = QualityOps.embedQuantizeOf(embs)
      .select("vec_id", "scale8", "mse").as[(Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(out(1L)._2 === 1.0 / 127 +- 1e-8)
    // every element's quantization error is ≤ scale/2 → mse ≤ (scale/2)²
    val halfStep = (1.0 / 127) / 2
    assert(out(1L)._3 > 0.0)
    assert(out(1L)._3 <= halfStep * halfStep + 1e-12)
    assert(out(2L)._2 === 0.0) // zero vector: no scale, no loss
    assert(out(2L)._3 === 0.0)
  }

  test("t29 sequence packing: bins fill to capacity, offsets contiguous per shard") {
    // 5 docs of 1000 tokens in one lang: capacity 2048 → bins 0,0,1,1,2
    val text1k = (1 to 1000).map(i => s"w$i").mkString(" ")
    val out = QualityOps.sequencePackingOf(docs((1L to 5L).map(_ -> text1k): _*))
      .select("doc_id", "bin", "bin_offset").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // bin/offset are where the document STARTS; doc 3 starts at offset
    // 2000 of bin 0 and spills into bin 1 (the chunker splits it there)
    assert(out(1L) === (0L, 0L))
    assert(out(2L) === (0L, 1000L))
    assert(out(3L) === (0L, 2000L))
    assert(out(4L) === (1L, 952L))
    assert(out(5L) === (1L, 1952L))
    // shard isolation: adding an 'es' doc changes nothing for 'en'
    val mixed = docs((1L to 5L).map(_ -> text1k) :+ (6L -> text1k): _*)
      .withColumn("lang", when($"doc_id" === 6L, "es").otherwise("en"))
    val again = QualityOps.sequencePackingOf(mixed)
      .filter($"lang" === "en")
      .select("doc_id", "bin", "bin_offset").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(again === out)
  }

  // ------------------------------------------------------------- t25
  test("t25 repetition: looping text scores high, varied text scores zero") {
    val loop = Seq.fill(10)("spam ham eggs").mkString(" ") // 30 toks, 3 distinct trigrams
    val varied = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = QualityOps.repetitionOf(docs(1L -> loop, 2L -> varied))
      .select("doc_id", "n_trigrams", "n_distinct_tri", "rep_ratio")
      .as[(Long, Int, Int, Double)].collect().map(t => t._1 -> t).toMap
    assert(out(1L)._2 === 28)
    assert(out(1L)._3 === 3)
    assert(out(1L)._4 === (1.0 - 3.0 / 28) +- 1e-4)
    assert(out(2L)._4 === 0.0)
  }

  // ------------------------------------------------------------- t30
  test("t30 corpus shuffle: exact cover, contiguous positions, partitioning-invariant") {
    val corpus = docs((1L to 100L).map(id => id -> s"doc $id body"): _*)
    val out = QualityOps.corpusShuffleOf(corpus)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect()
    // every doc lands in exactly one shard
    assert(out.map(_._1).sorted.toSeq === (1L to 100L))
    // positions are contiguous 1..n within each shard (a total order)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length)) }
    // more than one shard actually used on 100 docs
    assert(out.map(_._2).distinct.length > 1)
    // the order is a pure function of doc_id: physical partitioning is irrelevant
    val again = QualityOps.corpusShuffleOf(corpus.repartition(7))
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("t30 shard is decorrelated from the t17 split hash") {
    // split uses md5(doc_id) offset 1; shard uses md5('shard:'||doc_id).
    // If shard were derived from the split hash, every doc in one split
    // bucket would share a shard residue (8 divides 10000). Check train
    // docs spread across ALL shards.
    val corpus = docs((1L to 200L).map(id => id -> s"doc $id"): _*)
    val shards = QualityOps.corpusShuffleOf(corpus)
    val split = graft.queries.TextOps.trainSplitOf(corpus)
    val trainShards = shards.join(split, "doc_id")
      .filter($"split" === "train")
      .select("shard").as[Long].collect().distinct
    assert(trainShards.length === QualityOps.NumShards)
  }

  // ------------------------------------------------------------- t31
  test("t31 top ngrams: frequencies exact, ties alphabetical, per-lang isolation") {
    val looping = "a b c a b c a b c" // "a b c"×3, "b c a"×2, "c a b"×2
    val corpus = docs(1L -> looping, 2L -> "x y z w")
      .withColumn("lang", when($"doc_id" === 2L, "es").otherwise("en"))
    val out = QualityOps.topNgramsOf(corpus)
      .select("lang", "trigram", "n", "rk").as[(String, String, Long, Int)].collect()
    val en = out.filter(_._1 == "en").sortBy(_._4)
    assert(en.toSeq === Seq(
      ("en", "a b c", 3L, 1), ("en", "b c a", 2L, 2), ("en", "c a b", 2L, 3)))
    val es = out.filter(_._1 == "es").sortBy(_._4)
    assert(es.toSeq === Seq(("es", "x y z", 1L, 1), ("es", "y z w", 1L, 2)))
  }

  // ------------------------------------------------------------- t32
  test("t32 flatten mix: smallest source kept whole, larger sources thresholded") {
    val corpus = docs((1L to 110L).map(id => id -> s"doc $id"): _*)
      .withColumn("source", when($"doc_id" <= 100L, "big").otherwise("small"))
    val out = QualityOps.flattenMixOf(corpus)
      .select("source", "n_docs", "keep_ppm", "n_kept")
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // the smallest source's threshold is exactly 10^6 → every doc passes
    assert(out("small") === ("small", 10L, 1000000L, 10L))
    // the big source is downsampled toward 10 docs (hash-binomial around 10%)
    assert(out("big")._3 === 100000L)
    assert(out("big")._4 > 0L && out("big")._4 < 100L)
    // membership is a pure hash: physical partitioning changes nothing
    val again = QualityOps.flattenMixOf(corpus.repartition(7))
      .select("source", "n_docs", "keep_ppm", "n_kept")
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(again === out)
  }

  // ------------------------------------------------------------- t39
  test("t39 temperature mix: smallest source whole, rates interpolate between flat and natural") {
    val corpus = docs((1L to 110L).map(id => id -> s"doc $id"): _*)
      .withColumn("source", when($"doc_id" <= 100L, "big").otherwise("small"))
    val out = QualityOps.temperatureMixOf(corpus)
      .select("source", "n_docs", "keep_rate", "n_kept")
      .as[(String, Long, Double, Long)].collect().map(t => t._1 -> t).toMap
    // the smallest source's rate is exactly 1.0 and u < 1.0 always holds
    // (u ∈ [0, 1)): kept whole, deterministically — not just in expectation
    assert(out("small") === ("small", 10L, 1.0, 10L))
    // τ = 1/2 sits BETWEEN flat (10%) and natural (100%): sqrt(10/100)
    assert(out("big")._3 === 0.316228) // halfUp(sqrt(0.1), 6)
    assert(out("big")._4 > 10L && out("big")._4 < 100L)
    // membership is a pure hash: physical partitioning changes nothing
    val again = QualityOps.temperatureMixOf(corpus.repartition(7))
      .select("source", "n_docs", "keep_rate", "n_kept")
      .as[(String, Long, Double, Long)].collect().map(t => t._1 -> t).toMap
    assert(again === out)
  }

  // ------------------------------------------------------------- t33
  test("t33 token rarity: ubiquitous tokens score zero, rare tokens raise the mean") {
    val corpus = docs(
      1L -> "common",
      2L -> "common common rare", // duplicate 'common' counts once (distinct)
      3L -> "common",
      4L -> "common")
    val out = QualityOps.tokenIdfOf(corpus)
      .select("doc_id", "n_distinct", "rarity_sum_micro", "rarity")
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    // df(common)=4 of N=4 → N/df−1 = 0; a doc of only 'common' has rarity 0
    assert(out(1L) === (1L, 1L, 0L, 0.0))
    // df(rare)=1 → N/df−1 = 3 → 3_000_000 micro; averaged over 2 tokens
    assert(out(2L)._3 === 3000000L)
    assert(out(2L)._4 === 1.5)
  }

  test("t33 rarity vocab persists once, refits on corpus-stamp change, matches fresh compute") {
    val wh = QualityOps.ensureRarityVocab(spark, sf())
    val v1 = wh.read(QualityOps.RarityVocabTable, QualityOps.RarityVocabSchema).collect()
    assert(v1.nonEmpty)
    assert(v1.map(_.getString(2)).distinct.length === 1) // one corpus stamp
    // poison the stamp via a warehouse rewrite: ensure must detect the
    // mismatch and refit a fresh generation with the true stamp
    val poisoned = v1.map(r => (r.getString(0), r.getLong(1), "stale-stamp")).toSeq
      .toDF("token", "rarity_micro", "corpus_stamp")
    wh.rewrite(QualityOps.RarityVocabTable, poisoned)
    // stands in for another process's rewrite: reset this JVM's memo so
    // ensure re-reads the (poisoned) stamp
    graft.queries.IvfModel.resetEnsureMemo()
    QualityOps.ensureRarityVocab(spark, sf())
    val v2 = wh.read(QualityOps.RarityVocabTable, QualityOps.RarityVocabSchema).collect()
    assert(v2.map(_.getString(2)).head !== "stale-stamp")
    val fresh = QualityOps.rarityVocabOf(graft.core.Tables.documents(spark, sf()))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(v2.map(r => (r.getString(0), r.getLong(1))).toSet === fresh)
  }

  test("t33 through the persisted vocab equals the self-contained two-scan form") {
    val viaVocab = QualityOps.t33TokenIdf(spark, sf())
      .collect().map(_.toSeq).toSeq
    val twoScan = QualityOps.tokenIdfOf(graft.core.Tables.documents(spark, sf()))
      .collect().map(_.toSeq).toSeq
    assert(viaVocab === twoScan)
  }
}
