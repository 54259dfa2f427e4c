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
    val dir = Files.createTempDirectory("graft_buckets").toString
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
}
