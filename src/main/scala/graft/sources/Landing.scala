package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Landing layer: the reference's ingestion surface (extract.py:11-49) as a
  * named, testable seam — download-with-cache (+ force flag) and
  * ZIP-of-CSV expansion.
  *
  * Spark-first shape: the reference streams each ZIP member through pandas
  * on one machine and concatenates in memory (extract.py:46-48). Here the
  * ZIP is expanded to a landing DIRECTORY and reading is a multi-file
  * `spark.read.csv` over it ([[Tables.tseCsv]]) — the union across members
  * happens at the source level, distributed, with no driver-side
  * materialization. The transport is an injected callback (this
  * environment is zero-egress; production supplies an HTTP client, tests
  * supply a file copy), so cache/force/expansion logic is exercised
  * without any network.
  */
object Landing {

  /** Download-if-absent into `cacheDir/name` (extract.py:19: skip when the
    * cached file exists unless `force`). `fetch` writes the remote bytes
    * to the supplied stream; it runs only on cache miss or force. The
    * write goes through a temp file + atomic move so a fetch that dies
    * mid-stream never leaves a truncated file to be mistaken for a cache
    * hit. Returns the cached path. */
  def cachedFetch(cacheDir: String, name: String, force: Boolean = false)
                 (fetch: OutputStream => Unit): Path = {
    val dir = Paths.get(cacheDir)
    Files.createDirectories(dir)
    val dst = dir.resolve(name)
    if (force || !Files.exists(dst)) {
      val tmp = dir.resolve(name + ".part")
      val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
      try { fetch(out); out.flush() } finally out.close()
      Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
    dst
  }

  /** Expand a ZIP's `.csv` members into `destDir` for a distributed scan.
    * Mirrors the reference's member selection (extract.py:43-44): when
    * `preferConsolidated` names a member that exists (the `_BRASIL.csv`
    * national roll-up), only that member lands; otherwise every CSV does.
    * Nested entry paths are flattened to their file name (members of TSE
    * archives are flat; flattening also forecloses zip-slip traversal).
    * Returns the extracted file paths, sorted for determinism. */
  def expandZipCsvs(zipFile: Path, destDir: String,
                    preferConsolidated: Option[String] = None): Seq[Path] = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    val zf = new java.util.zip.ZipFile(zipFile.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val members = zf.entries().asScala.filter(e => !e.isDirectory)
        .filter(_.getName.toLowerCase(java.util.Locale.ROOT).endsWith(".csv")).toVector
      if (members.isEmpty)
        throw new java.io.FileNotFoundException(
          s"no CSV member in $zipFile (reference raises the same, extract.py:41)")
      val chosen = preferConsolidated
        .flatMap(c => members.find(m => fileName(m.getName) == c))
        .map(Vector(_)).getOrElse(members)
      chosen.map { m =>
        val out = dest.resolve(fileName(m.getName))
        val in = zf.getInputStream(m)
        try Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING) finally in.close()
        out
      }.sortBy(_.toString)
    } finally zf.close()
  }

  private def fileName(entry: String): String = {
    val n = entry.replace('\\', '/')
    n.substring(n.lastIndexOf('/') + 1)
  }

  /** [[cachedFetch]] with bounded retries + linear backoff: production
    * HTTP flakes (connection resets, 5xx) where the reference's one-shot
    * fetch (extract.py:23) simply dies. The retry wraps the WHOLE
    * cachedFetch attempt — each try gets a fresh temp file, never a
    * half-written stream to append to — and the temp+atomic-move protocol
    * guarantees a failed attempt leaves no truncated cache entry, so
    * restarting from byte 0 is always safe. The last failure propagates
    * after `attempts` tries. `sleep` is injectable for tests.
    *
    * Only TRANSIENT failures retry: by default `java.io.IOException` (the
    * transport's failure type); pass `retryable` to widen (e.g. an HTTP
    * client's 5xx exception type). Everything else — caller bugs like
    * `IllegalArgumentException` from the fetch closure — propagates on the
    * first throw instead of being masked behind backoff sleeps, and
    * `InterruptedException` is always rethrown with the thread's interrupt
    * status restored (a retry loop must never swallow cancellation). */
  def cachedFetchRetrying(cacheDir: String, name: String, force: Boolean = false,
                          attempts: Int = 3, backoffMs: Long = 1000,
                          sleep: Long => Unit = Thread.sleep,
                          retryable: Throwable => Boolean = _.isInstanceOf[java.io.IOException])
                         (fetch: OutputStream => Unit): Path = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var tryNo = 0
    var out: Option[Path] = None
    while (out.isEmpty) {
      tryNo += 1
      try out = Some(cachedFetch(cacheDir, name, force)(fetch))
      catch {
        case ie: InterruptedException =>
          Thread.currentThread().interrupt(); throw ie
        case e: Exception if retryable(e) && tryNo < attempts =>
          sleep(backoffMs * tryNo)
      }
    }
    out.get
  }

  /** The reference's end-to-end landing contract (extract.py:11-49):
    * fetch-with-cache `prefix_year.zip`, expand (preferring the
    * consolidated `prefix_year_BRASIL.csv`), return the landing dir to
    * hand to [[Tables.tseCsv]]. */
  def landTseZip(cacheDir: String, landDir: String, filePrefix: String, year: Int,
                 force: Boolean = false)(fetch: OutputStream => Unit): String = {
    val zip = cachedFetch(cacheDir, s"${filePrefix}_$year.zip", force)(fetch)
    expandZipCsvs(zip, landDir, Some(s"${filePrefix}_${year}_BRASIL.csv"))
    landDir
  }
}
