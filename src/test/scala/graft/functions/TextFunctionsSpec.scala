package graft.functions

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts and ratios") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val out = df.select(
      TextFunctions.tokenCount($"text"),
      TextFunctions.distinctTokenCount($"text"),
      TextFunctions.avgTokenLength($"text"),
      TextFunctions.typeTokenRatio($"text"))
      .as[(Int, Int, Double, Double)].collect().head
    assert(out._1 == 6)
    assert(out._2 == 5) // "the" twice
    assert(math.abs(out._3 - 17.0 / 6) < 1e-12)
    assert(math.abs(out._4 - 5.0 / 6) < 1e-12)
  }

  test("stopword and punctuation ratios") {
    val df = Seq((1L, "the cat, the dog!")).toDF("id", "text")
    val out = df.select(
      TextFunctions.stopwordRatio($"text", Seq("the")),
      TextFunctions.punctRatio($"text"))
      .as[(Double, Double)].collect().head
    assert(math.abs(out._1 - 0.5) < 1e-12) // but "cat," is a token with punct
    assert(out._2 > 0.0 && out._2 < 0.2)
  }

  test("vocabFingerprint is word-order insensitive, rollingFingerprint is not") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma alpha beta"), (3L, "alpha beta delta"))
      .toDF("id", "text")
    val vf = df.select($"id", TextFunctions.vocabFingerprint($"text").as("f"))
      .as[(Long, String)].collect().toMap
    assert(vf(1L) == vf(2L))
    assert(vf(1L) != vf(3L))
    val rf = df.select($"id", TextFunctions.rollingFingerprint($"text").as("f"))
      .as[(Long, Long)].collect().toMap
    assert(rf(1L) != rf(2L))
  }

  test("langIdHeuristic identifies obvious samples") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el gato de la casa y los perros del pueblo"),
      (3L, "der hund und die katze von dem haus mit den"))
      .toDF("id", "text")
    val out = df.select($"id", TextFunctions.langIdHeuristic($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  test("ratios null-propagate on empty/whitespace-only text (no ANSI divide error)") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val out = df.select($"id",
      TextFunctions.typeTokenRatio($"text").as("ttr"),
      TextFunctions.avgTokenLength($"text").as("atl"),
      TextFunctions.stopwordRatio($"text", Seq("the")).as("swr"))
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
    assert(out.forall { case (_, a, b, c) => a.isEmpty && b.isEmpty && c.isEmpty })
  }

  test("subwordTokens splits punctuation from words") {
    val df = Seq((1L, "hello, world")).toDF("id", "text")
    val out = df.select(TextFunctions.subwordTokens($"text"))
      .as[Seq[String]].collect().head
    assert(out == Seq("hello", ",", "world"))
  }

  test("redactPii masks emails, phones and IPs; clean text passes through") {
    val df = Seq(
      (1L, "mail a.user+tag@sub.example.org now"),
      (2L, "call +1-555-0042 or +55-123-9999 today"),
      (3L, "host 192.168.0.1 responded"),
      (4L, "mixed bob@x.io at 10.0.0.7 dial +1-555-1234"),
      (5L, "nothing sensitive here at all"))
      .toDF("id", "text")
    val out = df.select($"id", TextFunctions.redactPii($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail <EMAIL> now")
    assert(out(2L) == "call <PHONE> or <PHONE> today")
    assert(out(3L) == "host <IP> responded")
    assert(out(4L) == "mixed <EMAIL> at <IP> dial <PHONE>")
    assert(out(5L) == "nothing sensitive here at all")
  }

  test("stripMarkup: tags out, entities decoded once, whitespace collapsed") {
    val df = Seq(
      (1L, "<html><body><h1>Title</h1><p>hello  world</p></body></html>"),
      (2L, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y"),
      // &amp;lt; must decode to the literal text "&lt;", never to "<"
      (3L, "escaped &amp;lt;b&amp;gt; stays text"),
      (4L, "no markup at all"),
      (5L, "<br/><p class=\"x\">spaced</p>\n\t<div> out </div>"),
      (6L, "")).toDF("id", "text")
    val out = df.select($"id", TextFunctions.stripMarkup($"text").as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "Title hello world")
    assert(out(2L) == "a & b <tag> \"q\" 's' x y")
    assert(out(3L) == "escaped &lt;b&gt; stays text")
    assert(out(4L) == "no markup at all")
    assert(out(5L) == "spaced out")
    assert(out(6L) == "")
  }

  test("charEntropy: repeated-char junk near 0, uniform alphabet = ln k, empty = 0") {
    val docs = Seq(
      (1L, "aaaaaaaa"),          // one symbol → exactly 0
      (2L, "abcd"),              // uniform over 4 → ln 4
      (3L, "aabb"),              // uniform over 2 → ln 2
      (4L, ""),                  // empty → 0 by contract
      (5L, "the quick brown fox"))
      .toDF("doc_id", "text")
    val out = docs.select($"doc_id", TextFunctions.charEntropy($"text").as("e"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - math.log(4)) < 1e-8, s"${out(2L)}")
    assert(math.abs(out(3L) - math.log(2)) < 1e-8, s"${out(3L)}")
    assert(out(4L) == 0.0)
    // prose sits between junk and uniform-noise bounds
    assert(out(5L) > 2.0 && out(5L) < math.log(19), s"${out(5L)}")
  }

  test("occurrenceOffsets: positions, edges, non-overlap, regex literals, null") {
    val df = Seq(
      (1L, Some("xxabyyabzz")),  // interior matches
      (2L, Some("abxxab")),      // start + end
      (3L, Some("ab")),          // whole string
      (4L, Some("zzz")),         // no match
      (5L, Some("")),            // empty text
      (6L, None: Option[String]) // null text
    ).toDF("id", "text")
    val out = df.select($"id",
      TextFunctions.occurrenceOffsets($"text", "ab").as("offs"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(out(1L).get == Seq(2L, 6L), s"${out(1L)}")
    assert(out(2L).get == Seq(0L, 4L), s"${out(2L)}")
    assert(out(3L).get == Seq(0L), s"${out(3L)}")
    assert(out(4L).get == Seq.empty, s"${out(4L)}")
    assert(out(5L).get == Seq.empty, s"${out(5L)}")
    assert(out(6L).isEmpty, "null text -> null")

    // non-overlapping left-to-right: "aaaa" / "aa" -> [0, 2], not [0,1,2]
    val aa = Seq(Tuple1("aaaa")).toDF("text")
      .select(TextFunctions.occurrenceOffsets($"text", "aa"))
      .as[Seq[Long]].collect().head
    assert(aa == Seq(0L, 2L), s"$aa")

    // needle with regex metacharacters is matched literally
    val dot = Seq(Tuple1("a.b..b")).toDF("text")
      .select(TextFunctions.occurrenceOffsets($"text", ".b"))
      .as[Seq[Long]].collect().head
    assert(dot == Seq(1L, 4L), s"$dot")

    intercept[IllegalArgumentException](
      TextFunctions.occurrenceOffsets($"text", ""))
  }
}
