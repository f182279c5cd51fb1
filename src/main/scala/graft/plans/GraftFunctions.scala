package graft.plans

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's native expressions. After
  * `GraftFunctions.register(spark)`, `SELECT cosine_similarity(a, b)`
  * works in spark.sql. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      exprs => SimHash64(exprs(0), nfc = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => NfcNormalize(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1), winkler = true),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_similarity",
      exprs => JaroWinkler(exprs(0), exprs(1), winkler = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_lcs",
      exprs => TokenLcs(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "squared_l2",
      exprs => SquaredL2(exprs(0), exprs(1)),
      "built-in")
    // parity with the GraftExtensions injection route: the per-session
    // registry must expose the SAME surface (same builders, same
    // literal-parameter analysis errors)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash",
      exprs => exprs match {
        case Seq(t)       => MinHashSignature(t, 3, 32, nfc = false)
        case Seq(t, k, n) => MinHashSignature(t,
          GraftExtensions.literalInt(k, "minhash", "shingleSize"),
          GraftExtensions.literalInt(n, "minhash", "numHashes"),
          nfc = false)
        case _ => throw new IllegalArgumentException(
          "minhash(text[, shingleSize, numHashes])")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash_set",
      exprs => exprs match {
        case Seq(t)    => ShingleHashSet(t, 3, nfc = false)
        case Seq(t, k) => ShingleHashSet(t,
          GraftExtensions.literalInt(k, "shingle_hash_set", "shingleSize"),
          nfc = false)
        case _ => throw new IllegalArgumentException(
          "shingle_hash_set(text[, shingleSize])")
      },
      "built-in")
  }
}
