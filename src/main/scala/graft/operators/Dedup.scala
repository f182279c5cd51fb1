package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference deduplicates with pandas `drop_duplicates` in two forms:
  * on a key subset keeping the FIRST row in file order (load.py:13), and
  * full-row distinct (load.py:33,59). Spark's `dropDuplicates` picks an
  * arbitrary row per key across partitions, so the engine's spec is the
  * deterministic window form: `row_number() over (partition by key order by
  * tiebreak) = 1`. This is a single hash shuffle on the key — at 100 TB the
  * shuffle is unavoidable for exact dedup; partial aggregation doesn't
  * apply to row_number, so for very hot keys prefer [[exactByContent]]
  * (hash first, dedup on the fixed-width hash).
  */
object Dedup {

  /** Deterministic keep-first: of all rows sharing `keys`, keep the row
    * that sorts first under `tiebreak`. (Reference load.py:13 semantics
    * with file order replaced by an explicit total order.) */
  def keepFirst(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Full-row distinct (reference load.py:33,59). Plain `distinct` is
    * already deterministic — every surviving row is identical. */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** Exact content dedup for document-scale data: hash the content column
    * (sha2-256 — collision-safe at any realistic corpus size), keep the row
    * with the smallest `idCol` per hash. Shuffles fixed-width hashes, not
    * documents, once the optimizer prunes columns.
    * Adds `content_hash`; drops duplicate rows. */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val hashed = df.withColumn("content_hash", sha2(col(contentCol), 256))
    keepFirst(hashed, Seq("content_hash"), Seq(col(idCol)))
  }

  /** Per-row MinHash signature over token shingles.
    *
    * Pipeline (all narrow, no shuffle — each row computes independently):
    * tokens → k-shingles → for each of `numHashes` seeded hash functions,
    * the min hash over the row's shingles. Seeded family:
    * `h_i(x) = xxhash64(i, x)` (xxhash64 is a 64-bit codegen'd builtin).
    *
    * Returns df with `minhash: array<bigint>` of length `numHashes`.
    */
  def minHashSignature(df: DataFrame, textCol: String, shingleSize: Int = 3,
                       numHashes: Int = 32): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    // shingles: concat_ws of each k-token window; empty-safe via greatest(0, n-k+1)
    val shingles = expr(
      s"transform(sequence(1, greatest(size(split(lower(trim($textCol)), '\\\\s+')) - ${shingleSize - 1}, 1)), " +
      s"i -> concat_ws(' ', slice(split(lower(trim($textCol)), '\\\\s+'), i, $shingleSize)))")
    val sig = expr(
      s"transform(sequence(0, ${numHashes - 1}), " +
      s"seed -> array_min(transform(__graft_shingles, sh -> xxhash64(seed, sh))))")
    df.withColumn("__graft_shingles", shingles)
      .withColumn("minhash", sig)
      .drop("__graft_shingles")
  }

  /** LSH banding over MinHash signatures → candidate near-duplicate pairs.
    *
    * Signature of length b*r is split into `bands` bands of `rowsPerBand`;
    * rows sharing any band hash become a candidate pair. The band explode is
    * narrow; the only shuffle is the groupBy on (band, bandHash) — the
    * classic LSH join, linear in corpus size instead of O(n^2) pairwise.
    *
    * Returns distinct candidate pairs (id_a < id_b).
    */
  def minHashCandidatePairs(withSig: DataFrame, idCol: String,
                            bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands * rowsPerBand <= 1024, "band layout too large")
    val banded = withSig
      .select(col(idCol).as("__id"), col("minhash"))
      .withColumn("band", explode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
        s"b -> named_struct('band_id', b, 'band_hash', xxhash64(concat_ws(',', slice(minhash, b * $rowsPerBand + 1, $rowsPerBand)))))")))
      .select(col("__id"), col("band.band_id"), col("band.band_hash"))
    val grouped = banded
      .groupBy("band_id", "band_hash")
      .agg(collect_list("__id").as("ids"))
      .filter(size(col("ids")) > 1)
    // pairs within a bucket; sort_array makes (a,b) canonical with a < b
    grouped
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ids) - 1), " +
        "i -> transform(slice(ids, i + 1, size(ids) - i), " +
        "j -> named_struct('id_a', least(ids[i-1], j), 'id_b', greatest(ids[i-1], j)))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for a candidate-pair frame — the
    * verification step after LSH. `pairs` has (id_a, id_b); `docs` has
    * (idCol, textCol). Two broadcast-able joins against the shingle sets.
    * Jaccard = |A ∩ B| / |A ∪ B| over distinct k-shingles. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
                    shingleSize: Int = 3): DataFrame = {
    val sets = docs.select(
      col(idCol).as("__jid"),
      expr(s"array_distinct(transform(sequence(1, greatest(size(split(lower(trim($textCol)), '\\\\s+')) - ${shingleSize - 1}, 1)), " +
           s"i -> concat_ws(' ', slice(split(lower(trim($textCol)), '\\\\s+'), i, $shingleSize))))").as("__jset"))
    pairs
      .join(sets.withColumnRenamed("__jid", "id_a").withColumnRenamed("__jset", "set_a"), "id_a")
      .join(sets.withColumnRenamed("__jid", "id_b").withColumnRenamed("__jset", "set_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
        size(array_union(col("set_a"), col("set_b"))).cast("double"))
      .drop("set_a", "set_b")
  }

  /** SimHash: 64-bit fingerprint where bit i is the sign of the sum over
    * tokens of (token-hash bit i ? +1 : -1). Near-duplicates differ in few
    * bits (small Hamming distance). Entirely narrow per-row compute. */
  def simHash(df: DataFrame, textCol: String): DataFrame = {
    // token hashes once per row, then fold the 64 bit positions over them
    val sim = expr(
      s"""aggregate(
            sequence(0, 63),
            0L,
            (acc, bit) -> acc + shiftleft(
              CASE WHEN aggregate(
                __graft_th,
                0L,
                (s, h) -> s + CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1L ELSE -1L END
              ) > 0 THEN 1L ELSE 0L END, bit))""")
    df.withColumn("__graft_th",
        expr(s"transform(split(lower(trim($textCol)), '\\\\s+'), t -> xxhash64(t))"))
      .withColumn("simhash", sim)
      .drop("__graft_th")
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
