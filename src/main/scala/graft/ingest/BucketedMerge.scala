package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucket-pruned incremental merge — the 100 TB answer to "every hourly dump
 * rewrites the whole table" (the round-1 write path read + rewrote 100% of
 * the target per batch).
 *
 * Layout: the target is hash-partitioned into `__bucket=N` directories,
 * `N = pmod(hash(pk), nBuckets)`. A merge then:
 *  1. buckets the (deduped) batch and collects its affected bucket ids
 *     (≤ nBuckets values — a driver-side scalar set, never row data);
 *  2. reads ONLY the affected partition directories (partition pruning —
 *     asserted via `inputFiles` in BucketingSpec);
 *  3. anti-joins + unions within those buckets (`Merge.applyIncremental`,
 *     batch keys broadcast so the target side never shuffles);
 *  4. stages the merged buckets and swaps ONLY those partition directories.
 * Untouched buckets are neither read nor written: rewrite amplification
 * drops from 100% to |affected|/nBuckets.
 *
 * A flat (unbucketed) pre-existing target is migrated in one full rewrite,
 * after which merges are pruned. In a production lake the same semantics
 * come from a Delta/Iceberg MERGE; this keeps the engine dependency-free on
 * plain parquet while preserving the pruned-IO shape.
 */
object BucketedMerge {

  val BucketColName = "__bucket"

  def bucketExpr(pk: Seq[String], nBuckets: Int): Column =
    pmod(hash(pk.map(col).toIndexedSeq: _*), lit(nBuckets))

  private def fsOf(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** True when `path` exists and carries `__bucket=` partition dirs. */
  def isBucketedLayout(spark: SparkSession, path: String): Boolean = {
    val fs = fsOf(spark)
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith(s"$BucketColName="))
  }

  /** Marker file recording the layout's bucket count: the hash mod is part
    * of the on-disk format, so merges must use the WRITER's count, not the
    * caller's — a mismatched mod would read the wrong dirs (stale-duplicate
    * PKs) and swap dirs it never read (data loss). */
  private val BucketCountFile = "_graft_buckets"

  private def writeBucketCount(fs: FileSystem, targetPath: String, n: Int): Unit = {
    val out = fs.create(new Path(targetPath, BucketCountFile), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The layout's bucket count, if recorded. */
  def layoutBuckets(spark: SparkSession, targetPath: String): Option[Int] = {
    val fs = fsOf(spark)
    val p = new Path(targetPath, BucketCountFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toInt) finally in.close()
    }
  }

  /** Full (re)write in bucketed layout via staging + atomic-ish rename. */
  private def fullRewrite(spark: SparkSession, df: DataFrame, targetPath: String,
      nBuckets: Int): Unit = {
    val tmp = s"$targetPath.__staging"
    df.write.mode(SaveMode.Overwrite).partitionBy(BucketColName).parquet(tmp)
    StagedWrite.swap(spark, tmp, targetPath)
    writeBucketCount(fsOf(spark), targetPath, nBuckets)
  }

  /**
   * Merge `batch` (already deduped per PK — see [[Merge.dedupLatest]]) into
   * the bucketed target at `targetPath`, rewriting only affected buckets.
   * `nBuckets` applies to the FIRST write; an existing bucketed layout's
   * recorded count always wins (see [[layoutBuckets]]). When `seqCol` is
   * set and present on the target, rows merge sequence-aware
   * ([[Merge.applyIncrementalSeq]]): an out-of-order replay of an older
   * batch cannot regress newer target rows.
   */
  def mergeInto(spark: SparkSession, targetPath: String, batch: DataFrame,
      pk: Seq[String], nBuckets: Int = 32, seqCol: Option[String] = None): Unit = {
    def merge(target: DataFrame, withB: DataFrame): DataFrame =
      seqCol.filter(target.columns.contains) match {
        case Some(sc) => Merge.applyIncrementalSeq(target, withB, pk, sc)
        case None     => Merge.applyIncremental(target, withB, pk)
      }
    val fs = fsOf(spark)
    if (!fs.exists(new Path(targetPath)) || !hasData(spark, targetPath)) {
      // absent target, or an existing zero-ROW one (an all-empty first
      // batch writes bookkeeping but no parquet footers — reading it for
      // migration would crash schema inference): (re)write from scratch
      val withB = batch.withColumn(BucketColName, bucketExpr(pk, nBuckets))
      fullRewrite(spark, withB, targetPath, nBuckets)
    } else if (!isBucketedLayout(spark, targetPath)) {
      // one-time migration of a flat target; read errors propagate (X-3)
      val withB = batch.withColumn(BucketColName, bucketExpr(pk, nBuckets))
      val target = spark.read.parquet(targetPath)
        .withColumn(BucketColName, bucketExpr(pk, nBuckets))
      fullRewrite(spark, merge(target, withB), targetPath, nBuckets)
    } else {
      val n = layoutBuckets(spark, targetPath).getOrElse(nBuckets)
      val withB = batch.withColumn(BucketColName, bucketExpr(pk, n))
      val affected = withB.select(BucketColName).distinct()
        .collect().map(_.getInt(0)).sorted.toIndexedSeq
      val pruned = prunedTarget(spark, targetPath, affected)
      val merged = merge(pruned, withB)
      val tmp = s"$targetPath.__staging"
      merged.write.mode(SaveMode.Overwrite).partitionBy(BucketColName).parquet(tmp)
      affected.foreach { b =>
        val part = s"$BucketColName=$b"
        val src = new Path(s"$tmp/$part")
        val dst = new Path(s"$targetPath/$part")
        fs.delete(dst, true)
        if (fs.exists(src)) fs.rename(src, dst)
      }
      fs.delete(new Path(tmp), true)
    }
  }

  /** The affected-buckets read — split out so specs can assert the scan
    * touches a strict subset of partition directories. */
  def prunedTarget(spark: SparkSession, targetPath: String, affected: Seq[Int]): DataFrame =
    spark.read.parquet(targetPath)
      .filter(col(BucketColName).isin(affected: _*))

  /** Reader view without the layout column. */
  def read(spark: SparkSession, targetPath: String): DataFrame =
    spark.read.parquet(targetPath).drop(BucketColName)

  /** True iff the target holds at least one written parquet part. A
    * zero-ROW first write leaves only bookkeeping files (_SUCCESS, the
    * bucket-count sidecar) — no footers — so a schema-inferring
    * `spark.read.parquet` over it throws; consumers that recompute a
    * derived table after every merge guard with this instead. */
  def hasData(spark: SparkSession, targetPath: String): Boolean = {
    val fs = fsOf(spark)
    val p = new Path(targetPath)
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
  }
}
