package graft.keys

/**
 * Dump artifact filename split: `{table}-{shard}-{hash}.{ext}`.
 *
 * Port of `FileNameSplit::new` (`/root/reference/src/importer.rs:66-101`):
 * exactly three `-`-separated parts or the file is rejected. NOTE the known
 * reference bug: table names containing `-` produce >3 parts and are silently
 * dropped (`importer.rs:86-88`). We reproduce the parse for compatibility
 * tests, but the ingest pipeline keys on the API manifest's `tableName`
 * instead (`api_client.rs:374-376`), which has no such failure mode.
 */
final case class FileName(tableName: String, shardPart: String, hashPart: String, extension: String)

object FileName {

  def parse(fileName: String): Option[FileName] = {
    if (!fileName.contains("-")) return None
    val parts = fileName.split("-", -1)
    if (parts.length != 3) return None
    val hashExt = parts(2).split("\\.", -1)
    // reference indexes [1] unconditionally (`importer.rs:92`): no '.' → panic.
    // We return None instead of throwing — documented divergence (safer).
    if (hashExt.length < 2) return None
    Some(FileName(parts(0), parts(1), hashExt(0), hashExt(1)))
  }
}
