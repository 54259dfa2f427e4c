package graft

import graft.ingest.JsonlReader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** JSONL corpus door: typed round-trip, corrupt-line quarantine policy,
  * and gz shard export. */
class JsonlReaderSpec extends AnyFunSuite with SparkSuite {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("documents round-trip through gzipped JSONL shards bit-exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tempDir("graft_jsonl").resolve("docs").toString
    JsonlReader.write(docs, dir, shards = 4)
    val back = JsonlReader.read(spark, docSchema, dir)
      .select(docs.columns.map(col).toSeq: _*)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // gz shards, one task per file
    assert(back.inputFiles.forall(_.endsWith(".gz")))
    assert(back.inputFiles.length == 4)
  }

  test("FAILFAST read throws on a malformed line (ingest-grade X-3 semantics)") {
    val dir = tempDir("graft_jsonl_bad")
    val f = dir.resolve("part.jsonl")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |{"doc_id": oops not json
        |""".stripMargin)
    val ex = intercept[Exception] {
      JsonlReader.read(spark, docSchema, dir.toString).count()
    }
    assert(ex.getMessage != null)
  }

  test("PERMISSIVE read quarantines the verbatim bad line, keeps clean rows whole") {
    val dir = tempDir("graft_jsonl_q")
    val f = dir.resolve("part.jsonl")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}
        |{"doc_id": oops not json
        |""".stripMargin)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val r = JsonlReader.readPermissive(spark, docSchema, dir.toString)
    assert(r.clean.count() == 2)
    assert(r.clean.columns.toSeq == docSchema.fieldNames.toSeq,
      "the corrupt column must not leak into the clean frame")
    val q = r.quarantined.collect()
    assert(q.length == 1)
    assert(q.head.getString(0).contains("oops not json"),
      "quarantine must carry the verbatim line for forensics")
    assert(q.head.getString(1).endsWith("part.jsonl"))
    // the split pins ONE shared cache; release() must actually drop it
    // (counts are relative — the shared session may hold other caches)
    assert(spark.sparkContext.getPersistentRDDs.size > cachedBefore,
      "permissive read is expected to cache the raw pass")
    r.release()
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore,
      "release() must unpersist the shared raw cache")
  }
}
