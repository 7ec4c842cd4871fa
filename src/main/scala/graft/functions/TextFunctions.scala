package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenization,
  * shingling, quality metrics, fingerprints. Pure Column expressions
  * (higher-order functions + xxhash64) — deterministic across runs and
  * cluster sizes, no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenizer (lowercased, empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** k-token shingles (lowercased), distinct. Empty array when the doc has
    * fewer than k tokens.
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens that appear in the stopword list. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Ratio of non [a-z0-9 space] characters to total length (punctuation
    * density — a standard quality-score feature).
    */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0)
      .otherwise(length(regexp_replace(lower(text), "[a-z0-9 ]", "")).cast("double") / len)
  }

  /** Order-sensitive rolling polynomial fingerprint of the token sequence,
    * mod 1e9+7. Tokens are pre-reduced mod p so the fold never overflows
    * Long (ANSI mode would raise on overflow).
    */
  def rollingFingerprint(toks: Column): Column = {
    val p = lit(1000000007L)
    aggregate(toks, lit(0L), (acc, t) => (acc * 31L + pmod(xxhash64(t), p)) % p)
  }

  /** MinHash signature: `num` independent permutations approximated by
    * seeded xxhash64; each signature slot is the min hash over the shingle
    * set. Standard MinHash estimator: P(sig_i equal) = Jaccard.
    */
  def minhashSignature(shingleCol: Column, num: Int): Column =
    array((0 until num).map(seed =>
      array_min(transform(shingleCol, sh => xxhash64(lit(seed), sh)))): _*)

  /** LSH band keys over a signature: `bands` hashes, each over `rowsPerBand`
    * consecutive signature slots. Docs sharing any band key are candidate
    * near-duplicates.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws("_",
        transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string"))))
    }: _*)

  /** Estimated Jaccard similarity from two equal-length MinHash signatures:
    * fraction of agreeing slots.
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact Jaccard over two shingle-set columns. */
  def exactJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni   = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** 63-bit SimHash over the token multiset (bit 62..0). For each bit
    * position, tokens vote +1/-1 by their xxhash64 bit; the sign becomes
    * the SimHash bit. 63 bits so the accumulating fold never overflows
    * Long under ANSI mode.
    */
  def simhash63(toksColName: String): Column =
    // Nested higher-order lambdas need the SQL form: the inner aggregate
    // references the outer lambda variable b (the bit index).
    expr(
      s"""aggregate(sequence(62, 0, -1), 0L,
         |  (acc, b) -> acc * 2L + CASE WHEN
         |    aggregate($toksColName, 0L,
         |      (s, tk) -> s + CASE WHEN (shiftright(xxhash64(tk), b) & 1) = 1
         |                      THEN 1L ELSE -1L END) > 0
         |    THEN 1L ELSE 0L END)""".stripMargin)
}
