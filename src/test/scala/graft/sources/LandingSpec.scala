package graft.sources

import java.nio.charset.Charset
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class LandingSpec extends SparkSpec {
  import spark.implicits._

  private val latin1 = Charset.forName("ISO-8859-1")

  /** Fixture ZIP with the reference's member layout: per-state CSVs plus
    * optionally the consolidated national file, `;`-separated latin-1. */
  private def fixtureZip(withConsolidated: Boolean): java.nio.file.Path = {
    val zip = Files.createTempFile("landing", ".zip")
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zip.toFile))
    def member(name: String, rows: Seq[String]): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write((("SG_PARTIDO;NM_CANDIDATO" +: rows).mkString("\n") + "\n")
        .getBytes(latin1))
      zos.closeEntry()
    }
    member("votacao_2024_SP.csv", Seq("ABC;JOÃO", "DEF;MARIA"))
    member("votacao_2024_RJ.csv", Seq("GHI;JOSÉ"))
    if (withConsolidated)
      member("nested/votacao_2024_BRASIL.csv",
        Seq("ABC;JOÃO", "DEF;MARIA", "GHI;JOSÉ"))
    member("leiame.txt", Seq("não é csv"))
    zos.close()
    zip
  }

  private def fileFetch(src: java.nio.file.Path): java.io.OutputStream => Unit =
    out => Files.copy(src, out)

  test("cachedFetch downloads once, reuses the cache, re-fetches on force") {
    val cache = Files.createTempDirectory("cache").toString
    var fetches = 0
    def counted(out: java.io.OutputStream): Unit = { fetches += 1; out.write(Array[Byte](1, 2, 3)) }
    val p1 = Landing.cachedFetch(cache, "d_2024.zip")(counted)
    val p2 = Landing.cachedFetch(cache, "d_2024.zip")(counted)
    assert(p1 == p2 && fetches == 1, "second call must be a cache hit")
    Landing.cachedFetch(cache, "d_2024.zip", force = true)(counted)
    assert(fetches == 2, "force must re-fetch (extract.py:19)")
    assert(Files.readAllBytes(p1).toSeq == Seq[Byte](1, 2, 3))
  }

  test("cachedFetch leaves no cache entry when the transport dies mid-stream") {
    val cache = Files.createTempDirectory("cache").toString
    intercept[RuntimeException] {
      Landing.cachedFetch(cache, "dead.zip") { out =>
        out.write(1); throw new RuntimeException("connection reset")
      }
    }
    assert(!Files.exists(java.nio.file.Paths.get(cache, "dead.zip")),
      "a truncated download must not look like a cache hit")
    val recovered = Landing.cachedFetch(cache, "dead.zip")(_.write(7))
    assert(Files.readAllBytes(recovered).toSeq == Seq[Byte](7))
  }

  test("cachedFetchRetrying: fresh temp file per attempt, backoff, last failure propagates") {
    val cache = Files.createTempDirectory("cache").toString
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    // two connection resets, then success — and the success must NOT
    // carry bytes from the dead attempts
    val p = Landing.cachedFetchRetrying(cache, "flaky.zip", attempts = 3,
      backoffMs = 10, sleep = sleeps.append(_)) { out =>
      calls += 1
      out.write(99) // partial write before the failure
      if (calls < 3) throw new java.io.IOException("connection reset")
      out.write(Array[Byte](1, 2, 3))
    }
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L), "linear backoff between attempts")
    assert(Files.readAllBytes(p).toSeq == Seq[Byte](99, 1, 2, 3),
      "the surviving attempt starts from byte 0 — no bytes from dead attempts")
    // exhausted attempts -> the last failure propagates, no cache entry
    intercept[java.io.IOException] {
      Landing.cachedFetchRetrying(cache, "dead.zip", attempts = 2,
        backoffMs = 1, sleep = _ => ()) { _ => throw new java.io.IOException("down") }
    }
    assert(!Files.exists(java.nio.file.Paths.get(cache, "dead.zip")))
  }

  test("cachedFetchRetrying retries transient failures only") {
    val cache = Files.createTempDirectory("cache").toString
    // a caller bug is NOT retried — it propagates on the first throw
    var calls = 0
    intercept[IllegalArgumentException] {
      Landing.cachedFetchRetrying(cache, "bug.zip", attempts = 3,
        backoffMs = 1, sleep = _ => ()) { _ =>
        calls += 1; throw new IllegalArgumentException("caller bug")
      }
    }
    assert(calls == 1, "non-IOException must not burn retry attempts")
    // interruption is never swallowed, and the interrupt status survives
    intercept[InterruptedException] {
      Landing.cachedFetchRetrying(cache, "int.zip", attempts = 3,
        backoffMs = 1, sleep = _ => ()) { _ => throw new InterruptedException() }
    }
    assert(Thread.interrupted(), "interrupt flag must be restored (and clear it)")
    // a custom retryable predicate widens the transient set
    var httpCalls = 0
    val got = Landing.cachedFetchRetrying(cache, "http.zip", attempts = 2,
      backoffMs = 1, sleep = _ => (),
      retryable = _.getMessage == "503") { out =>
      httpCalls += 1
      if (httpCalls == 1) throw new RuntimeException("503")
      out.write(5)
    }
    assert(httpCalls == 2 && Files.readAllBytes(got).toSeq == Seq[Byte](5))
  }

  test("expandZipCsvs prefers the consolidated member, else lands all CSVs") {
    val withC = fixtureZip(withConsolidated = true)
    val d1 = Files.createTempDirectory("land1").toString
    val only = Landing.expandZipCsvs(withC, d1, Some("votacao_2024_BRASIL.csv"))
    assert(only.map(_.getFileName.toString) == Seq("votacao_2024_BRASIL.csv"),
      "consolidated file present -> only it lands (extract.py:44), flattened from its dir")
    val withoutC = fixtureZip(withConsolidated = false)
    val d2 = Files.createTempDirectory("land2").toString
    val all = Landing.expandZipCsvs(withoutC, d2, Some("votacao_2024_BRASIL.csv"))
    assert(all.map(_.getFileName.toString) ==
      Seq("votacao_2024_RJ.csv", "votacao_2024_SP.csv"),
      "no consolidated file -> every CSV lands, non-CSV members skipped")
    intercept[java.io.FileNotFoundException] {
      val empty = Files.createTempFile("e", ".zip")
      val z = new ZipOutputStream(new java.io.FileOutputStream(empty.toFile))
      z.putNextEntry(new ZipEntry("x.txt")); z.write(1); z.closeEntry(); z.close()
      Landing.expandZipCsvs(empty, Files.createTempDirectory("land3").toString, None)
    }
  }

  test("landed dir feeds the distributed TSE CSV reader end-to-end") {
    val zip = fixtureZip(withConsolidated = false)
    val cache = Files.createTempDirectory("cache").toString
    val land = Files.createTempDirectory("land").toString
    val dir = Landing.landTseZip(cache, land, "votacao", 2024)(fileFetch(zip))
    // per-state members union at the source: one scan, three rows, latin-1
    // accents intact, ';' separation applied
    val df = Tables.tseCsv(spark, dir + "/*.csv")
    assert(df.count() == 3)
    val names = df.select("NM_CANDIDATO").as[String].collect().toSet
    assert(names == Set("JOÃO", "MARIA", "JOSÉ"))
  }
}
