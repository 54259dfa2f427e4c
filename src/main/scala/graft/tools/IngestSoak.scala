package graft.tools

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

import graft.api.DumpInList
import graft.jobs.IngestJob
import graft.schema.CanvasSchema
import graft.state.IngestState
import org.apache.spark.sql.SparkSession

/**
 * Dev-only ingest soak: synthesizes a two-dump Canvas-style load (gzipped
 * headerless TSV, \N nulls) at ~1M rows and times the full pipeline —
 * scan+cast → keep-latest dedup → incremental merge → parquet warehouse.
 * Prints one JSON line with stage timings and row counts.
 */
object IngestSoak {

  private val schemaJson =
    """{
      |  "version": "1.0.0",
      |  "schema": {
      |    "submission_fact": {
      |      "dw_type": "fact", "incremental": true, "tableName": "submission_fact",
      |      "columns": [
      |        {"name": "submission_id", "type": "bigint"},
      |        {"name": "assignment_id", "type": "bigint"},
      |        {"name": "user_id", "type": "bigint"},
      |        {"name": "score", "type": "double precision"},
      |        {"name": "submitted_at", "type": "timestamp"},
      |        {"name": "grade_state", "type": "enum"},
      |        {"name": "body", "type": "text"}
      |      ]
      |    }
      |  }
      |}""".stripMargin

  private def writeShard(path: File, idFrom: Long, rows: Int, seed: Long): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), "UTF-8"), 1 << 20)
    val rnd = new scala.util.Random(seed)
    var i = 0
    while (i < rows) {
      val id = idFrom + i
      val score = if (rnd.nextInt(10) == 0) "\\N" else f"${rnd.nextDouble() * 100}%.4f"
      w.write(s"$id\t${id % 5000}\t${id % 100000}\t$score\t2024-01-01 00:00:00\tgraded\tbody text $id")
      w.write("\n")
      i += 1
    }
    w.close()
  }

  def main(args: Array[String]): Unit = {
    val rowsPerShard = args.headOption.map(_.toInt).getOrElse(250000)
    val shards = 4
    val root = java.nio.file.Files.createTempDirectory("graft_soak").toFile
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // dump 1: 4 shards × N rows; dump 2: 1 shard re-shipping 25% of the ids
    val (_, genSec) = timed {
      (0 until shards).foreach(s => writeShard(
        new File(root, f"submission_fact-$s%05d-d1.gz"), s.toLong * rowsPerShard, rowsPerShard, s))
      writeShard(new File(root, "submission_fact-00000-d2.gz"), 0, rowsPerShard, 99)
    }

    val schema = CanvasSchema.fromJson(schemaJson)
    val state = new IngestState(spark, s"$root/state")
    val job = new IngestJob(spark, schema, s"$root/wh", state)
    val dumps = Seq(
      DumpInList("d1", 1, shards, finished = true, "2024-01-01T00:00:00Z", "1.0.0"),
      DumpInList("d2", 2, 1, finished = true, "2024-02-01T00:00:00Z", "1.0.0"))
    val files = Map(
      "d1" -> Map("submission_fact" ->
        (0 until shards).map(s => new File(root, f"submission_fact-$s%05d-d1.gz").getAbsolutePath)),
      "d2" -> Map("submission_fact" ->
        Seq(new File(root, "submission_fact-00000-d2.gz").getAbsolutePath)))

    val (_, loadSec) = timed(job.run(dumps, files(_)))
    val (n, countSec) = timed(spark.read.parquet(s"$root/wh/submission_fact").count())
    val total = shards.toLong * rowsPerShard
    println(s"""{"soak":"ingest","rows_dump1":$total,"rows_dump2":$rowsPerShard,""" +
      s""""final_rows":$n,"gen_sec":$genSec,"load_sec":$loadSec,"count_sec":$countSec}""")
    assert(n == total, s"expected $total rows after merge, got $n")
    spark.stop()
  }
}
