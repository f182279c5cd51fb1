package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 batch: bounded string-similarity linkage and the entity
  * registry — the candidate-generation and persistence halves that turn
  * the ER family from functional into 100 TB-shaped. */
object ExtQueries4 {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- bounded Jaro-Winkler similarity join ------------------------------
    // All customer-name pairs at jw >= 0.97 WITHOUT the n² cartesian:
    // char-multiset prefix filter + length band (no false negatives by
    // the Jaro bound), exact codegen JW gate on candidates only. The
    // oracle is the all-pairs shape — the equivalence IS the test.
    "q274_jw_join" -> ((s, d) =>
      graft.operators.JwJoin.jaroWinklerSelfJoin(
          t(s, d, "customer"), "c_custkey", "c_name", threshold = 0.9699)
        .filter(round(col("jw"), 4) >= 0.97)
        .select(col("id_a"), col("id_b"), round(col("jw"), 6).as("jw"))
        .orderBy(col("id_a"), col("id_b"))),
  )

  def oracleSql: Map[String, String] = Map(
    // all-pairs reference: DuckDB's jaro_winkler_similarity is the same
    // classic definition (verified bit-exact on this corpus for q191);
    // both engines gate on the rounded-4 grid and render rounded-6
    "q274_jw_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
         FROM customer a, customer b
         WHERE a.c_custkey < b.c_custkey
           AND round(jaro_winkler_similarity(a.c_name, b.c_name), 4) >= 0.97
         ORDER BY id_a, id_b""",
  )
}
