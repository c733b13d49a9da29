package graft.operators

import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib text featurization (SURVEY.md §7 phase 7: Tokenizer +
  * HashingTF/IDF): the vectorized-text path feeding downstream ML or
  * similarity, all distributed transforms.
  */
object TextMl {

  /** Regex tokenization — the "BPE-ish regex" token counter's sibling:
    * words, numbers, or single non-space symbols.
    */
  def tokenize(docs: DataFrame, inputCol: String = "text"): DataFrame =
    new RegexTokenizer()
      .setInputCol(inputCol).setOutputCol("tokens")
      .setPattern("""\w+|[^\w\s]""").setGaps(false)
      .transform(docs)

  /** TF-IDF vectors over hashed token space (fixed numFeatures → stable
    * dimensionality at any corpus size; no vocabulary broadcast needed,
    * which is what makes this the 100 TB-safe default vs CountVectorizer).
    */
  def tfidf(spark: SparkSession, docs: DataFrame, numFeatures: Int = 1 << 12): DataFrame = {
    val toks = tokenize(docs)
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(numFeatures).transform(toks)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    idf.transform(tf)
  }
}
