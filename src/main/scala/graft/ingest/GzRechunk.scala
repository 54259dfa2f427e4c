package graft.ingest

import java.io.{BufferedInputStream, BufferedOutputStream, BufferedReader, InputStreamReader, OutputStream}
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
 * with one partition per part and byte-identical row content (line
 * terminators normalized to `\n`, the TSV reader's own delimiter).
 *
 * Crash safety mirrors the downloader's tmp→rename discipline: any stale
 * parts from an earlier crashed attempt are deleted first (their count
 * could differ under a different part-size setting, and `parts` trusts
 * contiguous numbering), parts are written under a temp name and renamed
 * into place, a done-marker is written LAST, and only then is the original
 * deleted. Every prefix of that sequence resumes correctly: no marker ⇒
 * the original still exists and the split re-runs from scratch; marker
 * present ⇒ the part set is complete (the marker branch also retries the
 * original's delete, so a crash between marker and delete cannot orphan a
 * multi-GB file forever).
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
   * volume; the compressed parts come out smaller by the data's own
   * ratio. Non-positive means `maxBytes / 4`: a just-oversized artifact
   * still splits into several parts (uncompressed quarter-threshold ⇒
   * ≥ ~8-16 parts at typical 2-4× text compression), and the default
   * tracks whatever threshold the caller configured.
   */
  def ensureChunked(gz: Path, maxBytes: Long,
      partUncompressedBytes: Long = -1L): Seq[Path] = {
    if (isChunked(gz)) {
      if (Files.exists(gz)) Files.delete(gz) // crashed between marker+delete
      return parts(gz)
    }
    if (!gz.getFileName.toString.endsWith(".gz") ||
        !Files.exists(gz) || Files.size(gz) <= maxBytes) return Seq(gz)
    val partBytes =
      if (partUncompressedBytes > 0) partUncompressedBytes
      else math.max(maxBytes / 4, 1L)

    parts(gz).foreach(Files.delete(_)) // stale output of a crashed attempt
    val tmp = gz.resolveSibling(gz.getFileName.toString + ".rechunk.tmp")
    val in = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(new BufferedInputStream(Files.newInputStream(gz))), UTF_8))
    try {
      var idx = 0
      var out: OutputStream = null
      var written = 0L // UNCOMPRESSED bytes in the current part — counted
      // from the UTF-8 encoding, not String.length (code units), which
      // undercounts multibyte text up to 4x and re-creates the skew
      def roll(): Unit = {
        if (out != null) {
          out.close()
          Files.move(tmp, partName(gz, idx),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          idx += 1
        }
        out = new GZIPOutputStream(
          new BufferedOutputStream(Files.newOutputStream(tmp)))
        written = 0L
      }
      try {
        roll()
        var line = in.readLine()
        while (line != null) {
          val bytes = line.getBytes(UTF_8)
          out.write(bytes); out.write('\n')
          written += bytes.length + 1L
          if (written >= partBytes) roll()
          line = in.readLine()
        }
        out.close(); out = null
        if (written > 0 || idx == 0) // avoid a trailing empty part
          Files.move(tmp, partName(gz, idx),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        else Files.delete(tmp)
      } catch {
        case e: Throwable =>
          // release the deflater/fd and drop the partial temp — the next
          // attempt restarts from the (still present) original
          if (out != null) { try out.close() catch { case _: Throwable => () } }
          Files.deleteIfExists(tmp)
          throw e
      }
    } finally in.close()

    Files.write(markerOf(gz), Array.emptyByteArray) // marker LAST
    Files.delete(gz)
    parts(gz)
  }
}
