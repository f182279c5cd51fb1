package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split (on by default in GraftSession) handles most
  * skew at runtime by splitting oversized shuffle partitions; explicit
  * salting remains the tool when one join KEY is so hot that even a
  * single key's rows exceed an executor (AQE splits partitions, not
  * keys). Mechanics: the large side gets a random-but-deterministic salt
  * in [0, buckets); the small side is replicated across all salt values;
  * the join key becomes (key, salt). Row multiplication is buckets × the
  * small side only.
  */
object SkewJoin {

  /** Inner salted equi-join of `large` with `small` on `key`.
    * Deterministic salt: pmod(xxhash64 of the large side's whole row id
    * expression `saltSource`, buckets) — reproducible, no rand(). */
  def saltedInner(large: DataFrame, small: DataFrame, key: String,
                  saltSource: Column, buckets: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until buckets).map(lit(_)): _*)))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
