package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleData

/** The scale-up generator's two contracts, pinned after the factor-1000
  * corpus broke the first one in practice (SCALE.md round 14):
  *
  *  1. NO EXACT REPLICAS within the factors the decade batteries use —
  *     copies beyond the substitution/isometry family's cycle are exact
  *     content duplicates under new ids, and every dedup bucket then
  *     self-joins quadratically over the duplicate groups (measured:
  *     the t37 seed filled the disk at factor 1000 when the text cycle
  *     was 100).
  *  2. WITHIN-COPY STRUCTURE EXACTLY PRESERVED — text substitution is a
  *     bijection on the letter alphabet (shingle equality isomorphic),
  *     the embedding transform is an isometry (norms and pairwise inner
  *     products bit-meaningfully equal), so per-copy workloads see the
  *     original corpus's geometry, not a distorted one.
  */
class ScaleDataSpec extends SparkTestBase {

  test("text substitution is a bijection on a-t with cycle >= 1000, identity below 100") {
    val alpha20 = "abcdefghijklmnopqrst"
    // permutation property at every level, not just the sampled ones
    for (i <- Seq(0, 1, 9, 10, 99, 100, 137, 599, 600, 999)) {
      val t = ScaleData.rotAlpha(i)
      assert(t.length == 20 && t.sorted == alpha20, s"copy $i not a bijection: $t")
    }
    // the old cycle-100 failure: copy i and i+100 were EQUAL pre-fix
    assert(ScaleData.rotAlpha(0) != ScaleData.rotAlpha(100))
    assert(ScaleData.rotAlpha(37) != ScaleData.rotAlpha(137))
    // full distinctness across the factor-1000 range the battery uses
    val all = (0 until 1000).map(ScaleData.rotAlpha)
    assert(all.distinct.size == 1000, "text family has a cycle < 1000")
  }

  test("embedding transform is an exact isometry with cycle >= 1000 at dim=64") {
    import spark.implicits._
    val dim = 64
    val rng = new scala.util.Random(7)
    val vecs = Seq.tabulate(3)(i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_spec_").toString
    vecs.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")

    def dots(rows: Seq[Array[Float]]): Seq[Double] =
      for (a <- rows; b <- rows)
        yield a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

    val baseDots = dots(vecs.map(_._2))
    // pre-fix cycle was 2*dim = 128: copy 128 duplicated copy 0's
    // vectors exactly. Sample the three levels and the old collision.
    val copies = Seq(0, 1, 64, 128, 129, 640, 999)
    val scaled = ScaleData.scaleTable(spark, "embeddings", dir, 1000)
      .filter(floor(col("vec_id") / ScaleData.Stride).isin(copies.map(_.toLong): _*))
      .select((col("vec_id") / ScaleData.Stride).cast("long").as("copy"),
        col("vec_id") % ScaleData.Stride, col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    for (c <- copies.map(_.toLong)) {
      val d = dots(scaled(c))
      baseDots.zip(d).foreach { case (b, x) =>
        assert(math.abs(b - x) < 1e-5, s"copy $c distorted geometry: $b vs $x")
      }
    }
    // no exact replicas across the factor-1000 range: copy 0 vs the old
    // cycle point 128 (and a level-3 point) must differ elementwise
    assert(scaled(0L).head.toSeq != scaled(128L).head.toSeq,
      "embedding family still cycles at 128")
    assert(scaled(0L).head.toSeq != scaled(640L).head.toSeq)
    // identity below the third level's engagement (copy 1 = rotation
    // only, unchanged from the recorded generator): rotation by 1
    val v0 = vecs.head._2
    val expected = (v0.drop(1) ++ v0.take(1)).toSeq
    assert(scaled(1L).head.toSeq == expected, "level-1 rotation changed")
  }

  test("tiny dims: level 3 skips explicitly at dim < 4; dim % 4 tail preserved, no nulls") {
    import spark.implicits._
    // dim = 2: q = dim/4 = 0 — pre-guard, floor(pos/0) was NULL in
    // non-ANSI Spark and silently nulled level-3 copies' embeddings;
    // the guard makes level 3 an explicit identity (degraded cycle 2·dim
    // is a stated property for sub-4 dims, not a division artifact)
    for (dim <- Seq(2, 6)) {
      val rng = new scala.util.Random(11)
      val vecs = Seq.tabulate(2)(i => (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
      val dir = java.nio.file.Files.createTempDirectory(s"graft_scale_dim${dim}_").toString
      vecs.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
      // one copy per isometry level incl. a level-3-engaged one (i >= 2·dim)
      val copies = Seq(0L, 1L, (2 * dim).toLong, (4 * dim + 1).toLong)
      val scaled = ScaleData.scaleTable(spark, "embeddings", dir, 5 * dim)
        .filter(floor(col("vec_id") / ScaleData.Stride).isin(copies: _*) &&
          col("vec_id") % ScaleData.Stride === 0)
        .select((col("vec_id") / ScaleData.Stride).cast("long").as("copy"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      assert(scaled.length == copies.length)
      assert(scaled.forall(r => r._2 != null && !r._2.exists(_.isNaN) && r._2.length == dim),
        s"dim=$dim produced null/NaN/truncated embeddings at a level-3 copy")
      // isometry at every sampled copy of base vector 0: norm preserved
      val baseNorm = math.sqrt(vecs.head._2.map(x => x.toDouble * x).sum)
      for ((c, v) <- scaled) {
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        assert(math.abs(n - baseNorm) < 1e-4, s"dim=$dim copy $c broke the isometry: $n vs $baseNorm")
      }
    }
  }
}
