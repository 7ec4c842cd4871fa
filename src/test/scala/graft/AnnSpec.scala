package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** LSH ANN vs the brute-force baseline: cosines must agree exactly for
  * shared pairs; recall is reported and sanity-bounded.
  */
class AnnSpec extends SparkTestBase {

  test("t12 LSH neighbors report the same cosine as brute force") {
    val brute = TextOps.t10AnnBruteForce(spark, sf())
      .select(col("query_id"), col("vec_id"), col("cosine").as("bf_cosine"))
    val lsh = TextOps.t12AnnLsh(spark, sf())
      .select(col("query_id"), col("vec_id"), col("cosine"))
    val joined = lsh.join(brute, Seq("query_id", "vec_id"))
    // any LSH pair that IS in the brute-force top-5 must carry the exact
    // same cosine (same fold, same rounding)
    assert(joined.filter(col("cosine") =!= col("bf_cosine")).count() === 0)
  }

  test("t12 output shape: <=5 ranked neighbors per query, descending") {
    val lsh = TextOps.t12AnnLsh(spark, sf()).collect()
    val byQuery = lsh.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.values.forall(_.length <= 5))
    byQuery.values.foreach { rows =>
      val cosines = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cosine"))
      assert(cosines.sameElements(cosines.sortBy(-_)))
    }
  }

  test("t12 recall vs brute force is nonzero (reported)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(TextOps.t10AnnBruteForce(spark, sf()))
    val lsh = pairs(TextOps.t12AnnLsh(spark, sf()))
    val recall = if (bf.isEmpty) 0.0 else (bf intersect lsh).size.toDouble / bf.size
    info(f"LSH recall@5 vs brute force: $recall%.2f (6 bits, hamming-1 multi-probe)")
    assert(recall > 0.0 && recall <= 1.0)
  }

  test("t14 IVF: deterministic, correct cosines, recall reported") {
    val ivf1 = TextOps.t14AnnIvf(spark, sf())
      .select("query_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ivf2 = TextOps.t14AnnIvf(spark, sf())
      .select("query_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ivf1 === ivf2) // seeded KMeans -> reproducible index

    val brute = TextOps.t10AnnBruteForce(spark, sf())
      .select(col("query_id"), col("vec_id"), col("cosine").as("bf"))
    val joined = TextOps.t14AnnIvf(spark, sf())
      .join(brute, Seq("query_id", "vec_id"))
    assert(joined.filter(col("cosine") =!= col("bf")).count() === 0)

    val bf = brute.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf1.map(t => (t._1, t._2))).size.toDouble / bf.size
    info(f"IVF recall@5 vs brute force: $recall%.2f (k=16, nProbe=2)")
    assert(recall > 0.0 && recall <= 1.0)
  }
}
