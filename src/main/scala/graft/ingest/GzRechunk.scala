package graft.ingest

import java.io.{BufferedInputStream, BufferedOutputStream, BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/**
 * Oversized-artifact guard for the download path (SURVEY §7 hard part e).
 *
 * Gzip is unsplittable, so Spark scans each artifact as ONE partition
 * (the reference has the same per-file parallelism ceiling,
 * `importer.rs:230-232`). One skewed multi-GB `requests-*.gz` therefore
 * serializes its table's entire load behind a single thread. When a
 * downloaded artifact exceeds `maxBytes` (compressed), this re-chunks it
 * locally into N smaller gz parts at LINE boundaries — the scan then runs
 * with one partition per part and byte-identical row content.
 *
 * Crash safety mirrors the downloader's tmp→rename discipline: parts are
 * written under temp names, renamed into place, a done-marker is written
 * LAST, and only then is the original deleted. Every prefix of that
 * sequence resumes correctly: no marker ⇒ the original still exists and
 * the split re-runs from scratch (part overwrites are idempotent);
 * marker present ⇒ the part set is complete and the original may be gone.
 */
object GzRechunk {

  private def markerOf(gz: Path): Path =
    gz.resolveSibling(gz.getFileName.toString + ".rechunk.done")

  private def partName(gz: Path, i: Int): Path =
    gz.resolveSibling(f"${gz.getFileName}%s.rechunk$i%03d.gz")

  /** True when `gz` was already re-chunked (its original may be deleted);
    * the downloader must consult this BEFORE its resume-by-existence
    * check, or it would re-fetch an artifact it already split. */
  def isChunked(gz: Path): Boolean = Files.exists(markerOf(gz))

  /** The completed part set of a re-chunked artifact, in order. */
  def parts(gz: Path): Seq[Path] =
    Iterator.from(0).map(partName(gz, _)).takeWhile(Files.exists(_)).toSeq

  /**
   * Ensure `gz` is scan-parallel: returns the paths to feed the reader —
   * either the original (small or non-gz artifacts) or the re-chunked
   * parts. `partUncompressedBytes` bounds each part by DECOMPRESSED
   * volume (the quantity that actually costs scan time); the compressed
   * parts come out smaller by the data's own ratio. Non-positive means
   * `maxBytes / 4`: a just-oversized artifact still splits into several
   * parts (uncompressed quarter-threshold ⇒ ≥ ~8-16 parts at typical
   * 2-4× text compression), and the default tracks whatever threshold
   * the caller configured.
   */
  def ensureChunked(gz: Path, maxBytes: Long,
      partUncompressedBytes: Long = -1L): Seq[Path] = {
    if (isChunked(gz)) return parts(gz)
    if (!gz.getFileName.toString.endsWith(".gz") ||
        !Files.exists(gz) || Files.size(gz) <= maxBytes) return Seq(gz)
    val partBytes =
      if (partUncompressedBytes > 0) partUncompressedBytes
      else math.max(maxBytes / 4, 1L)

    val in = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(new BufferedInputStream(Files.newInputStream(gz))), UTF_8))
    try {
      var idx = 0
      var out: java.io.Writer = null
      var tmp: Path = null
      var written = 0L
      def roll(): Unit = {
        if (out != null) {
          out.close()
          Files.move(tmp, partName(gz, idx),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          idx += 1
        }
        tmp = gz.resolveSibling(gz.getFileName.toString + s".rechunk.tmp")
        out = new java.io.OutputStreamWriter(new GZIPOutputStream(
          new BufferedOutputStream(Files.newOutputStream(tmp))), UTF_8)
        written = 0L
      }
      roll()
      var line = in.readLine()
      while (line != null) {
        out.write(line); out.write('\n')
        written += line.length + 1L
        if (written >= partBytes) roll()
        line = in.readLine()
      }
      out.close()
      if (written > 0 || idx == 0) // avoid a trailing empty part
        Files.move(tmp, partName(gz, idx),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      else Files.delete(tmp)
    } finally in.close()

    Files.write(markerOf(gz), Array.emptyByteArray) // marker LAST
    Files.delete(gz)
    parts(gz)
  }
}
