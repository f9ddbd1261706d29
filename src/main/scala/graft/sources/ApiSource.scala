package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Paged API extract with a raw-file cache, mirroring the reference's
  * primary raw-data source (reference tasks/base.py:450-558
  * `extract_via_api`: iterator-keyed requests with paging, raw text
  * kept per request; utils/cache.py `check_extract_cache` +
  * tasks/base.py:286-303 `is_cached`: skip re-download when the raw
  * file already exists on the filesystem).
  *
  * Design for scale: the FETCH loop is inherently sequential
  * driver-side work (rate-limited HTTP, the reference even sleeps
  * `request_interval` between calls) and its volume is tiny — pages of
  * API JSON. What must be distributed is the PARSE+TRANSFORM over the
  * accumulated raw payloads, so the fetch only ever appends raw files
  * to the cache directory and the DataFrame is produced by ONE
  * `spark.read` over the whole directory with an explicit schema —
  * every downstream transform starts distributed, and re-runs are
  * free (cache hit = no fetch, same files, same frame).
  *
  * The fetcher abstracts the transport (HTTP in production, any
  * file/function-backed fake in tests): `(iterator, page) =>
  * Some(payload)` until the source is exhausted, `None` past the last
  * page — the paging contract of the reference's `page_count` loop
  * without trusting a count field.
  */
object ApiSource {

  type Fetcher = (String, Int) => Option[String]

  /** Per-source subdirectory of the raw cache. Name-spacing by
    * DIRECTORY (not a filename prefix) is what lets several api
    * sources share one rawDir without cross-contamination: each
    * source's read scans only its own directory, and invalidation can
    * delete exactly one directory (a `foo-` filename prefix would also
    * match a sibling source named `foo-bar`). */
  def sourceDir(rawDir: String, source: String): java.nio.file.Path =
    Paths.get(rawDir, source)

  /** Cache file for one (source, iterator, page) request — finer-
    * grained than the reference's one-file-per-source but the same
    * rule: an existing raw file is never re-fetched. */
  def cachePath(rawDir: String, source: String, iterator: String, page: Int): java.nio.file.Path =
    sourceDir(rawDir, source).resolve(s"${if (iterator.isEmpty) "all" else iterator}-p$page.jsonl")

  /** Fetch every (iterator, page) payload not already cached, then
    * read the whole raw directory as one distributed jsonl scan.
    *
    * @param iterators iterator values to page through (the reference's
    *                  `config["iterator"]` country list); `Seq("")`
    *                  for a plain paged source
    * @param maxPages  hard bound on runaway sources
    * @return (frame over ALL cached raw files, number of fetches that
    *         actually hit the fetcher — 0 on a full cache hit)
    */
  def extract(
      spark: SparkSession,
      source: String,
      schema: StructType,
      fetcher: Fetcher,
      rawDir: String,
      iterators: Seq[String] = Seq(""),
      maxPages: Int = 10000): (DataFrame, Int) = {
    Files.createDirectories(sourceDir(rawDir, source))
    var fetches = 0
    iterators.foreach { it =>
      var page = 1
      var exhausted = false
      while (!exhausted && page <= maxPages) {
        val path = cachePath(rawDir, source, it, page)
        if (Files.exists(path)) {
          page += 1 // cache hit: reference is_cached -> skip download
        } else {
          fetcher(it, page) match {
            case Some(payload) =>
              fetches += 1
              Files.write(path, payload.getBytes(StandardCharsets.UTF_8))
              page += 1
            case None =>
              exhausted = true
          }
        }
      }
    }
    // scope the scan to THIS source's cache directory — a shared
    // rawDir must never leak a sibling source's rows into this frame
    (Readers.jsonl(spark, sourceDir(rawDir, source).toString, schema), fetches)
  }
}
