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
  }
}
