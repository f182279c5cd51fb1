package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** The ONE whitespace tokenizer shared by every native dedup expression
  * ([[MinHashSignature]], [[SimHash64]], [[ShingleHashSet]]), defined to be
  * bit-reproducible by pure Spark builtins:
  *
  *   `filter(split(lower(text), '\\s+'), x -> x <> '')`
  *
  * i.e. lowercase, split on runs of whitespace, drop empty tokens. Dropping
  * empties (rather than trimming first) makes the two sides agree on edge
  * whitespace: Java `String.trim` strips all chars <= U+0020 while Spark
  * `trim` strips only ' ', and Spark `split` keeps leading/trailing empty
  * strings — the round-2 divergence (ADVICE r2) where text with a leading
  * tab produced an extra empty token on the builtin path only.
  * A token-less text (empty or all-whitespace) yields an empty array on
  * both paths.
  */
object Tokens {
  def whitespace(text: UTF8String): Array[String] = {
    val raw = text.toString.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var empties = 0
    var i = 0
    while (i < raw.length) { if (raw(i).isEmpty) empties += 1; i += 1 }
    if (empties == 0) raw
    else {
      val out = new Array[String](raw.length - empties)
      var j = 0
      i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) { out(j) = raw(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** The builtin-SQL twin of [[whitespace]] for agg-form cross-checks. */
  def whitespaceSql(textCol: String): String =
    s"filter(split(lower($textCol), '\\\\s+'), x -> x <> '')"
}
