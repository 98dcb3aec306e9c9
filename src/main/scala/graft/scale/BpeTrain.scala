package graft.scale

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the merge
  * loop itself, not just one pair count.
  *
  * 100 TB shape: the corpus is reduced ONCE to word types with
  * frequencies (the only corpus-wide shuffle — the standard BPE trick:
  * pair statistics are a weighted sum over the type table, never the
  * token stream). Every merge iteration then runs on the vocab-bounded
  * type table: one map-side pair expansion + one bounded aggregate to
  * find the argmax pair, and one map-side fold to apply the merge. The
  * driver holds only the learned merge table (m rows) — the same
  * driver-held-model pattern as the k-means/PQ codebooks.
  *
  * Merge application is the standard greedy left-to-right fold: a
  * symbol merges with its left neighbor exactly when the pair matches,
  * and the freshly merged symbol immediately becomes the left context
  * for the next element ("aaa" + merge(a,a) → ["aa","a"]). The fold is
  * a strict HOF over one word's symbols (words are short — bounded per
  * row), mirrored operation-for-operation by the oracle's list_reduce.
  */
object BpeTrain {

  /** Corpus → (word, freq, s) where s is the character-symbol array. */
  def wordTypes(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("s",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Freq-weighted adjacent-pair counts over the current symbolization.
    * Pair key = "a b" (symbols never contain whitespace, so the space
    * separator is unambiguous).
    */
  def pairCounts(wf: DataFrame): DataFrame = {
    val s = col("s")
    val pairs = when(size(s) >= 2,
      zip_with(slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    wf.select(col("freq"), explode(pairs).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))
  }

  /** One greedy merge pass over the symbol arrays (map-side fold). */
  def applyMerge(wf: DataFrame, a: String, b: String): DataFrame =
    wf.withColumn("s",
      F.aggregate(col("s"), array().cast("array<string>"), (acc, x) =>
        when(size(acc) > 0 &&
          element_at(acc, size(acc)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x)))))

  /** Train `m` merges AND return the final word-type symbolization —
    * the inference half: tokenizing a corpus never re-runs the fold per
    * token occurrence, it tokenizes each word TYPE once and joins the
    * per-type token count back to the word stream (vocab-sized build
    * side). Returns (merge table rows, final (word, freq, s) relation).
    */
  def trainWithVocab(docs: DataFrame, m: Int): (Seq[(Int, String, Long)], DataFrame) = {
    var wf = wordTypes(docs).persist()
    wf.count()
    var layers = List(wf)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (step <- 1 to m) {
      val top = pairCounts(wf)
        .orderBy(col("n").desc, col("pair").asc).limit(1).collect()
      if (top.nonEmpty) {
        val (pair, n) = (top(0).getString(0), top(0).getLong(1))
        merges += ((step, pair, n))
        val Array(a, b) = pair.split(" ", 2)
        wf = applyMerge(wf, a, b).persist()
        wf.count()
        layers = wf :: layers
      }
    }
    layers.tail.foreach(_.unpersist(blocking = false))
    (merges.toSeq, wf)
  }

  /** Learn `m` merges; returns the merge table (step, pair, n) — the
    * artifact a tokenizer ships.
    */
  def train(docs: DataFrame, m: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, wf) = trainWithVocab(docs, m)
    wf.unpersist(blocking = false)
    merges.toDF("step", "pair", "n")
  }

  /** Tokenize the corpus with the learned merges: per-source token
    * accounting after `m` BPE merges. The join's build side is the
    * word-TYPE vocabulary (word → token count), so tokenizing 100 TB is
    * one scan of the word stream against a vocab-sized relation — the
    * fold never runs per occurrence.
    */
  def tokenizeStats(docs: DataFrame, m: Int): DataFrame = {
    val (_, wf) = trainWithVocab(docs, m)
    val perType = wf.select(col("word"), size(col("s")).cast("long").as("n_syms"))
    val words = docs
      .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val out = words.join(perType, "word")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_tokens"),
        sum(length(col("word"))).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        graft.Num.r(col("n_tokens").cast("double") / col("n_words"), 6).as("tokens_per_word"),
        graft.Num.r(col("n_chars").cast("double") / col("n_tokens"), 6).as("chars_per_token"))
    out
  }
}
