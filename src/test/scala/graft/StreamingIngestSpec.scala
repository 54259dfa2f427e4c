package graft

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.schema.CanvasSchema
import graft.streaming.StreamingIngest
import org.scalatest.funsuite.AnyFunSuite

/** Continuous loader: landing-dir file stream → typed scan → keep-latest
  * dedup → bucket-pruned merge, exactly-once per file, idempotent target. */
class StreamingIngestSpec extends AnyFunSuite with SparkSuite {

  private val schemaJson =
    """{
      |  "version": "1.0.0",
      |  "schema": {
      |    "user_dim": {
      |      "dw_type": "dimension", "incremental": true, "tableName": "user_dim",
      |      "columns": [
      |        {"name": "id", "type": "bigint"},
      |        {"name": "name", "type": "varchar"}
      |      ]
      |    }
      |  }
      |}""".stripMargin

  private def gz(path: File, lines: Seq[String]): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), "UTF-8"))
    lines.foreach { l => w.write(l); w.write("\n") }
    w.close()
  }

  test("streaming ingest merges arriving artifacts with keep-latest semantics") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_singest").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val target = s"$root/warehouse/user_dim"
    val table = CanvasSchema.fromJson(schemaJson).tables("user_dim")

    def runOnce(): Unit = {
      val q = StreamingIngest.start(
        spark, landing.getAbsolutePath, table, target, s"$root/chk")
      q.awaitTermination() // AvailableNow: drains what's there, then stops
    }

    // wave 1: two users
    gz(new File(landing, "user_dim-00000-aa.gz"), Seq("1\talice", "2\tbob"))
    runOnce()
    assert(spark.read.parquet(target).select("id", "name")
      .as[(Long, String)].collect().toSet == Set((1L, "alice"), (2L, "bob")))

    // wave 2: update user 2, add user 3 — only the new file is processed
    gz(new File(landing, "user_dim-00001-bb.gz"), Seq("2\tbobby", "3\tcarol"))
    runOnce()
    assert(spark.read.parquet(target).select("id", "name")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "alice"), (2L, "bobby"), (3L, "carol")))

    // wave 3: nothing new — the checkpointed file log skips processed files,
    // and rerunning leaves the target unchanged (idempotence)
    runOnce()
    assert(spark.read.parquet(target).count() == 3)
  }

  test("catch-up batch draining several files resolves PK overlaps by file order") {
    import spark.implicits._
    val root = TempDirs.tempDir("graft_singest2").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val target = s"$root/warehouse/user_dim"
    val table = CanvasSchema.fromJson(schemaJson).tables("user_dim")

    // BOTH artifacts present before the stream ever runs → one micro-batch.
    // The lexicographically-later file must win the overlapping PK.
    gz(new File(landing, "user_dim-00000-aa.gz"), Seq("1\talice", "2\tbob"))
    gz(new File(landing, "user_dim-00001-bb.gz"), Seq("2\tbobby"))
    val q = StreamingIngest.start(
      spark, landing.getAbsolutePath, table, target, s"$root/chk")
    q.awaitTermination()

    assert(spark.read.parquet(target).select("id", "name")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "alice"), (2L, "bobby")))
  }

  test("a malformed landing line aborts the micro-batch instead of nulling rows") {
    val root = TempDirs.tempDir("graft_singest3").toFile
    val landing = new File(root, "landing"); landing.mkdirs()
    val table = CanvasSchema.fromJson(schemaJson).tables("user_dim")
    gz(new File(landing, "user_dim-00000-aa.gz"), Seq("1\talice\tEXTRA\tCOLS\tHERE"))
    val q = StreamingIngest.start(
      spark, landing.getAbsolutePath, table, s"$root/wh/user_dim", s"$root/chk")
    intercept[Exception] { q.awaitTermination() }
    assert(!new File(s"$root/wh/user_dim").exists()) // nothing half-written
  }
}
