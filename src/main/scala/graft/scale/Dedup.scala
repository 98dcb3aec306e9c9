package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators (the LLM-training-data
  * tier of BASELINE.json's north star): exact, n-gram Jaccard, and
  * MinHash+LSH near-dup detection.
  *
  * Scale design:
  *  - exact dedup = one hash shuffle on a 128-bit digest (never on the
  *    full text);
  *  - exact Jaccard is the quadratic baseline — candidate generation via
  *    shingle inverted index (explode + self-join) with per-doc shingle
  *    dedup to bound hot keys;
  *  - MinHash+LSH is the linear-ish scale path: 64 permutations via
  *    seeded xxhash64, banded 16×4, candidates from band-bucket join
  *    only, then exact verification on the candidate set. At 100 TB the
  *    band join shuffles only (band, bucket, doc_id) tuples — a tiny
  *    fraction of corpus bytes.
  */
object Dedup {

  /** Word n-gram shingle array (distinct), null-safe. */
  def shingles(text: Column, n: Int): Column = {
    val w = split(trim(text), "\\s+")
    val raw = transform(sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*))
    when(text.isNull || size(w) < n, array().cast("array<string>"))
      .otherwise(array_distinct(raw))
  }

  /** Exact dedup: group on digest, keep canonical min key.
    * Returns (key_col_name kept as `canonical_doc_id`, n_copies).
    */
  def exactDupGroups(docs: DataFrame, textCol: String, keyCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(keyCol)).as("canonical_doc_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("canonical_doc_id"), col("n_copies"))

  /** Exact n-gram Jaccard pairs ≥ threshold via shingle inverted index.
    * O(candidate pairs); run on bounded corpora or post-LSH candidates.
    */
  def jaccardPairs(docs: DataFrame, textCol: String, keyCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs
      .select(col(keyCol).as("doc_id"), explode(shingles(col(textCol), n)).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c").cast("double") / (col("s1.n_sh") + col("s2.n_sh") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  val MinHashPerms = 64
  val LshBands = 16
  val LshRows = 4 // 16 × 4 = 64; LSH threshold ≈ (1/16)^(1/4) ≈ 0.5

  /** MinHash signature: array of MinHashPerms minima of seeded xxhash64
    * over the shingle set. One wide aggregate — map-side partial min.
    */
  def minhashSignature(docsShingled: DataFrame): DataFrame = {
    val mins = (0 until MinHashPerms).map(j =>
      min(xxhash64(lit(j), col("s"))).as(s"h$j"))
    docsShingled.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until MinHashPerms).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** Candidate pairs from LSH banding: equal band-hash in any band. */
  def lshCandidates(signatures: DataFrame): DataFrame = {
    val bands = explode(transform(sequence(lit(0), lit(LshBands - 1)),
      b => struct(b.as("band"),
        xxhash64((0 until LshRows).map(r =>
          element_at(col("sig"), b * LshRows + r + 1)): _*).as("bucket"))))
    val banded = signatures.select(col("doc_id"), bands.as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: shingle → sign → band → candidates →
    * exact-verify Jaccard on candidates only.
    */
  def minhashDupPairs(docs: DataFrame, textCol: String, keyCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(keyCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
    val exploded = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val cands = lshCandidates(minhashSignature(exploded))
    // verify candidates with exact Jaccard over the shingle arrays
    cands
      .join(sh.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
