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
    info(f"LSH recall@5 vs brute force: $recall%.2f (bucket-probe only, 6 bits)")
    assert(recall > 0.0 && recall <= 1.0)
  }
}
