package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Co-located joins via bucketing — the 100 TB answer to "this join shuffles
 * both fact tables every run": write both sides bucketed + sorted by the
 * join key once, and every subsequent join is exchange-free (bucket-local
 * sort-merge). Asserted here by scanning the physical plan for shuffle
 * exchanges.
 */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val dir = TempDirs.tempDir("graft_buckets").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path

    val li = (1 to 2000).map(i => (i.toLong % 500, i.toDouble)).toDF("k", "price")
    val os = (1 to 500).map(i => (i.toLong, s"o$i")).toDF("k", "status")
    // external-table form: bucketing metadata in the catalog, data at `path`
    li.write.bucketBy(8, "k").sortBy("k").option("path", s"$dir/li_b")
      .mode("overwrite").saveAsTable("li_b")
    os.write.bucketBy(8, "k").sortBy("k").option("path", s"$dir/os_b")
      .mode("overwrite").saveAsTable("os_b")

    val joined = spark.table("li_b").join(spark.table("os_b"), "k")
      .groupBy($"status").agg(sum($"price").as("total"))

    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // one shuffle for the final groupBy on status is allowed; the JOIN
    // itself must be bucket-local (would be 2 more exchanges unbucketed)
    assert(shuffles.size <= 1, s"expected join without exchanges, got:\n$joined")
    // li keys are 0..499, os keys 1..500 → 499 overlapping statuses
    assert(joined.count() == 499)

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucket-pruned merge reads and rewrites a strict subset of buckets") {
    import graft.ingest.BucketedMerge
    val dir = TempDirs.tempDir("graft_bmerge").toString
    val target = s"$dir/t"
    val nBuckets = 8

    // seed: 400 rows spread over all 8 buckets
    val seed = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "payload")
    BucketedMerge.mergeInto(spark, target, seed, Seq("id"), nBuckets)
    val dirs = new java.io.File(target).listFiles().filter(_.getName.startsWith("__bucket="))
    assert(dirs.length == nBuckets)

    def filesState(): Map[String, Long] =
      dirs.flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified())).toMap
    val before = filesState()

    // batch: update id=1, insert id=401 — touches at most 2 buckets
    val batch = Seq((1L, "v1_updated"), (401L, "v401")).toDF("id", "payload")
    val affected = batch
      .withColumn("__bucket", BucketedMerge.bucketExpr(Seq("id"), nBuckets))
      .select("__bucket").distinct().as[Int].collect().sorted.toIndexedSeq

    // read-side prune: the merge's target scan touches only affected dirs
    // (inputFiles ignores partition pruning — inspect the scan's selected
    // partitions in the executed plan instead)
    val scan = BucketedMerge.prunedTarget(spark, target, affected)
      .queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    val scanned = scan.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(scanned.nonEmpty)
    assert(scanned.forall(f => affected.exists(b => f.contains(s"__bucket=$b/"))),
      s"scan leaked outside affected buckets: ${scanned.mkString(",")}")
    assert(scanned.length < spark.read.parquet(target).inputFiles.length)

    BucketedMerge.mergeInto(spark, target, batch, Seq("id"), nBuckets)

    // write-side prune: untouched bucket files are bit-identical (same
    // paths, same mtimes); affected buckets were rewritten
    val after = filesState()
    val untouchedBefore = before.filterNot { case (p, _) => affected.exists(b => p.contains(s"__bucket=$b/")) }
    val untouchedAfter = after.filterNot { case (p, _) => affected.exists(b => p.contains(s"__bucket=$b/")) }
    assert(untouchedBefore == untouchedAfter, "untouched buckets were rewritten")
    assert(before.keySet != after.keySet || before != after, "affected buckets were not rewritten")

    // correctness: update applied, insert present, everything else intact
    val out = BucketedMerge.read(spark, target).as[(Long, String)].collect().toMap
    assert(out.size == 401)
    assert(out(1L) == "v1_updated" && out(401L) == "v401" && out(2L) == "v2")

    // a caller passing a DIFFERENT nBuckets cannot corrupt the layout: the
    // recorded bucket count wins, so no stale duplicates / lost buckets
    val batch2 = Seq((2L, "v2_updated")).toDF("id", "payload")
    BucketedMerge.mergeInto(spark, target, batch2, Seq("id"), nBuckets = 64)
    assert(BucketedMerge.layoutBuckets(spark, target).contains(nBuckets))
    val out2 = BucketedMerge.read(spark, target).as[(Long, String)].collect().toMap
    assert(out2.size == 401)
    assert(out2(2L) == "v2_updated" && out2(1L) == "v1_updated")
  }
}
