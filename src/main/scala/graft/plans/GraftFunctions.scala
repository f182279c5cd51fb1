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
  }
}
