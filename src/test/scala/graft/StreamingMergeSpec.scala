package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ingest.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming ingest → warehouse merge: a file-source stream drained through
 * `foreachBatch`, each micro-batch applied with the SAME Merge used by the
 * batch ingest path (keep-latest per PK). This is the continuous-ingestion
 * tier: at scale the reference's hourly-cron dump loop becomes a stream of
 * arriving artifacts merged incrementally.
 */
class StreamingMergeSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch applies keep-latest merge per micro-batch") {
    val root = TempDirs.tempDir("graft_smerge").toString
    val srcDir = s"$root/src"
    val target = s"$root/warehouse/user_dim"

    // batch 1: two users; batch 2 (arrives later): user 2 renamed + user 3
    Seq((1L, "alice", 1L), (2L, "bob", 1L))
      .toDF("id", "name", "seq").coalesce(1).write.parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def runStream(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val deduped = Merge.dedupLatest(batch, Seq("id"), "seq")
          val merged =
            if (new java.io.File(target).exists()) {
              val cur = spark.read.parquet(target)
              Merge.applyIncremental(cur, deduped, Seq("id"))
            } else deduped
          val tmp = s"$target.__staging"
          merged.write.mode("overwrite").parquet(tmp)
          val f = new java.io.File(target)
          if (f.exists()) { org.apache.commons.io.FileUtils.deleteDirectory(f) }
          new java.io.File(tmp).renameTo(f)
          ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    runStream()
    assert(spark.read.parquet(target).count() == 2)

    Seq((2L, "bobby", 2L), (3L, "carol", 2L))
      .toDF("id", "name", "seq").coalesce(1).write.mode("append").parquet(srcDir)
    runStream()

    val out = spark.read.parquet(target)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "alice"), (2L, "bobby"), (3L, "carol")))
  }
}
