package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3) with raw ScalaCheck
  * generators sampled over fixed seeds (the scalatest-scalacheck bridge is
  * not in the offline cache). Small generated frames — the properties, not
  * the volume, are the point.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  import graft.core.Ranking

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("rank-with-ties: positions start at 1, gaps equal tie counts, nulls unranked") {
    val gen: Gen[List[Option[Double]]] =
      Gen.listOfN(12, Gen.option(Gen.chooseNum(0, 10).map(_.toDouble)))
    samples(gen, 15).filter(_.nonEmpty).foreach { xs =>
      val df = xs.zipWithIndex.map { case (s, i) => (s"r$i", s) }.toDF("name", "score")
      val got = Ranking.rankWithNullsUnranked(df, "score")
        .select("score", "posicion").collect()
        .map(r => (Option(r.getAs[java.lang.Double]("score")).map(_.toDouble),
                   Option(r.getAs[java.lang.Integer]("posicion")).map(_.toInt)))
      // null measure <=> null position
      assert(got.forall { case (s, p) => s.isDefined == p.isDefined })
      val ranked = got.flatMap { case (s, p) => s.zip(p) }
      if (ranked.nonEmpty) {
        val byScore = ranked.groupBy(_._1)
        // equal scores share a single position
        assert(byScore.values.forall(_.map(_._2).distinct.length == 1))
        // competition rank: descending scores get positions 1, 1+|ties|, ...
        var expected = 1
        byScore.toSeq.sortBy(-_._1).foreach { case (_, group) =>
          assert(group.head._2 === expected)
          expected += group.length
        }
      }
    }
  }

  test("pivot preserves the long-format aggregate cell-by-cell") {
    val gen: Gen[List[(Int, String, Double)]] = Gen.listOfN(30,
      for {
        g <- Gen.chooseNum(1, 4)
        p <- Gen.oneOf("P1", "P2", "P3")
        v <- Gen.chooseNum(0, 100).map(_.toDouble)
      } yield (g, p, v))
    samples(gen, 8).filter(_.nonEmpty).foreach { xs =>
      val df = xs.toDF("g", "p", "v")
      val longMap = df.groupBy("g", "p").agg(round(avg("v"), 2).as("m"))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
      df.groupBy("g").pivot("p", Seq("P1", "P2", "P3")).agg(round(avg("v"), 2))
        .collect().foreach { r =>
          val g = r.getInt(0)
          Seq("P1", "P2", "P3").foreach { p =>
            val cell = Option(r.getAs[java.lang.Double](p)).map(_.toDouble)
            assert(cell === longMap.get((g, p)), s"cell ($g, $p)")
          }
        }
    }
  }

  test("train split assignment is stable under corpus growth") {
    import graft.queries.TextOps
    // every doc keeps its split when the corpus around it changes — the
    // property a random split loses and the reason the bucket is a pure
    // per-row hash
    val full = TextOps.t17TrainSplit(spark, sf()).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val half = TextOps.t17TrainSplit(spark, sf())
      .filter(col("doc_id") % 2 === 0).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.nonEmpty)
    half.foreach { case (id, s) => assert(full(id) === s) }
    // and the 90/5/5 ranges are all inhabited at corpus size
    assert(full.values.toSet === Set("train", "val", "test"))
  }

  test("salted join equals plain join on random skewed frames") {
    import graft.functions.Skew
    val gen: Gen[List[(String, Int)]] = Gen.listOfN(60,
      for {
        // 2/3 of rows land on the hot key — the regime salting exists for
        k <- Gen.frequency(2 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b", "c", "d"))
        v <- Gen.chooseNum(0, 1000)
      } yield (k, v))
    samples(gen, 8).foreach { xs =>
      val big = xs.toDF("key", "v")
      val small = Seq(("hot", 1), ("a", 2), ("b", 3), ("z", 9)).toDF("key", "label")
      val plain = big.join(small, "key")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
      val salted = Skew.saltedJoin(big, small, "key", salts = 5, saltSource = col("v"))
        .select("key", "v", "label")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
      assert(salted === plain) // multiset equality — duplicates included
    }
  }

  test("label propagation with path halving equals union-find on random graphs") {
    import graft.queries.TextOps
    // random graphs of up to 40 nodes incl. long chains (the deep-diameter
    // regime path halving exists for) — the distributed clustering must
    // produce exactly the connected components a driver-side union-find
    // computes, with the min id as label and singletons absent
    val gen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 40)
      chainLen <- Gen.chooseNum(0, 20) // a guaranteed deep path component
      extra <- Gen.listOfN(25, for {
        a <- Gen.chooseNum(0L, n.toLong - 1)
        b <- Gen.chooseNum(0L, n.toLong - 1)
      } yield (a, b))
    } yield {
      val chain = (100L until (100L + chainLen)).map(i => (i, i + 1)).toList
      (extra.filter { case (a, b) => a != b } ++ chain)
    }
    samples(gen, 6).filter(_.nonEmpty).foreach { edgesIn =>
      val nodeIds = edgesIn.flatMap { case (a, b) => Seq(a, b) }.distinct
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map(nodeIds.map(i => i -> i): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edgesIn.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expected = nodeIds.groupBy(find).values
        .filter(_.size > 1)
        .flatMap { comp => val m = comp.min; comp.map(id => id -> (m, comp.size.toLong)) }
        .toMap

      val pairs = edgesIn.toDF("doc_a", "doc_b")
      val nodes = nodeIds.toDF("doc_id")
      def run() = TextOps.dedupClustersOf(nodes, pairs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("cluster"), r.getAs[Long]("cluster_size"))).toMap
      // BOTH execution paths must match the oracle: the default bounded
      // local union-find AND the distributed propagation loop (forced)
      assert(run() === expected)
      sys.props("graft.cc.localMaxEdges") = "-1"
      try assert(run() === expected, "distributed loop diverged")
      finally sys.props -= "graft.cc.localMaxEdges"
    }
  }

  test("incremental clustering equals a full recluster on random graphs and batch splits") {
    import graft.queries.TextOps
    // random graphs; a random id cutoff decides which nodes arrive in the
    // increment, and every other old-old edge is "discovered late" (lands
    // in the increment's pair set) — the contracted-component maintenance
    // must agree with a full recluster of the union on ALL of it
    val gen: Gen[(Long, List[(Long, Long)], Long)] = for {
      n <- Gen.chooseNum(4, 28)
      edges <- Gen.listOfN(22, for {
        a <- Gen.chooseNum(0L, n.toLong - 1)
        b <- Gen.chooseNum(0L, n.toLong - 1)
      } yield (a, b))
      cut <- Gen.chooseNum(1, n - 1)
    } yield (n.toLong, edges.filter { case (a, b) => a != b }, cut.toLong)
    def pairsDf(ps: Seq[(Long, Long)]) =
      if (ps.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      else ps.toDF("doc_a", "doc_b")
    samples(gen, 5).foreach { case (n, edges, cut) =>
      val oldIds = (0L until cut)
      val newIds = (cut until n)
      val (oldOld, touching) = edges.partition { case (a, b) => a < cut && b < cut }
      val (late, priorPairs) = oldOld.zipWithIndex.partition(_._2 % 2 == 1)
      val incPairs = touching ++ late.map(_._1)
      val prior = TextOps.clusterAssignmentOf(oldIds.toDF("doc_id"), pairsDf(priorPairs.map(_._1)))
      val inc = TextOps.dedupClustersIncrement(prior, newIds.toDF("doc_id"), pairsDf(incPairs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = TextOps.clusterAssignmentOf((0L until n).toDF("doc_id"), pairsDf(edges))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc === full, s"n=$n cut=$cut edges=$edges")
    }
  }

  test("index-probed increment pairs == full-restricted on random corpora, splits and caps") {
    import graft.queries.{BandIndex, TextOps}
    // documents drawn from a tiny vocabulary so shingles genuinely
    // collide (shared band keys, est_jaccard spread across the
    // threshold), a random cutoff splits settled corpus vs batch, and a
    // small random cap exercises the UNION-count skew guard: the probe
    // must equal a full recluster's capped pairs restricted to the
    // batch's neighborhood on every draw
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val gen: Gen[(List[String], Int, Int)] = for {
      n <- Gen.chooseNum(5, 14)
      docs <- Gen.listOfN(n, Gen.chooseNum(3, 7).flatMap(Gen.listOfN(_, word).map(_.mkString(" "))))
      cut <- Gen.chooseNum(1, n - 1)
      cap <- Gen.chooseNum(2, 8)
    } yield (docs, cut, cap)
    samples(gen, 6).foreach { case (texts, cut, cap) =>
      val all = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val idx = all.filter(col("doc_id") < cut)
      val bat = all.filter(col("doc_id") >= cut)
      def pset(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_a", "doc_b", "est_jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val inc = pset(BandIndex.incrementPairsOf(
        BandIndex.bandedOf(idx), BandIndex.bandedOf(bat), maxBucket = cap))
      val full = pset(TextOps.minhashPairsOf(all, maxBucket = cap))
        .filter { case (a, b, _) => a >= cut || b >= cut }
      assert(inc === full, s"cut=$cut cap=$cap texts=$texts")
      // replay-exactness on the same draw: probing an index that already
      // absorbed the batch (crash after append, batch redelivered) must
      // reproduce the first run bit-for-bit, cap decisions included
      val replay = pset(BandIndex.incrementPairsOf(
        BandIndex.bandedOf(all), BandIndex.bandedOf(bat), maxBucket = cap))
      assert(replay === inc, s"replay diverged: cut=$cut cap=$cap texts=$texts")
    }
  }

  test("emb bucket cap: capped pairs are a subset; drops explained exactly by oversized endpoints") {
    import graft.functions.{VectorOps => V}
    import graft.queries.{Lsh, TextOps}
    // vectors drawn from a small base pool so sign-code buckets genuinely
    // collide and a cap of 2 bites; the guard must (a) never invent pairs,
    // (b) emit no pair touching an oversized bucket, (c) drop ONLY pairs
    // with at least one oversized endpoint
    val vecGen: Gen[List[Float]] =
      Gen.listOfN(Lsh.Dim, Gen.chooseNum(-100, 100).map(_ / 100.0f))
    val gen: Gen[List[List[Float]]] = for {
      bases <- Gen.listOfN(4, vecGen)
      picks <- Gen.listOfN(12, Gen.chooseNum(0, 3))
    } yield picks.map(bases(_))
    samples(gen, 5).foreach { vs =>
      val cap = 2
      val emb = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val buckets = emb.select(col("vec_id"),
        Lsh.bucketOf(V.toDouble(col("embedding"))).as("bucket"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sizes = buckets.values.groupBy(identity).view.mapValues(_.size).toMap
      def pset(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val capped = pset(TextOps.t15CosineNearDupOf(emb, maxBucket = cap))
      val uncapped = pset(TextOps.t15CosineNearDupOf(emb))
      assert(capped.subsetOf(uncapped))
      capped.foreach { case (a, b) =>
        assert(sizes(buckets(a)) <= cap && sizes(buckets(b)) <= cap,
          s"pair ($a,$b) survived with an oversized-bucket endpoint") }
      (uncapped -- capped).foreach { case (a, b) =>
        assert(sizes(buckets(a)) > cap || sizes(buckets(b)) > cap,
          s"pair ($a,$b) was dropped though both endpoints are in-cap") }
    }
  }

  test("masksWithin(r, b) is exactly the codes of popcount <= r, for any dial") {
    import graft.queries.Lsh
    for (bits <- Seq(4, 6, 8, 11); radius <- 0 to math.min(bits, 4)) {
      val expected = (0L until (1L << bits))
        .filter(c => java.lang.Long.bitCount(c) <= radius).toSet
      assert(Lsh.masksWithin(radius, bits).toSet === expected, s"($bits, $radius)")
    }
  }

  test("identical token streams always produce identical minhash signatures") {
    import graft.functions.{TextFunctions => TF}
    val gen: Gen[List[String]] = Gen.listOfN(12, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
    samples(gen, 10).filter(_.length >= 3).foreach { ws =>
      val text = ws.mkString(" ")
      val sigs = Seq((1L, text), (2L, text)).toDF("id", "text")
        .select(col("id"),
          TF.minhashSignature(TF.shingles(TF.tokens(col("text")), 3), 16).as("sig"))
        .collect().map(_.getSeq[Long](1))
      assert(sigs(0) === sigs(1))
    }
  }
}
