package graft

import graft.schema.CanvasSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-catalog JSON decode → StructType (SURVEY §1.1/§1.4). */
class CanvasSchemaSpec extends AnyFunSuite {

  val json: String =
    """{
      |  "version": "4.2.0",
      |  "schema": {
      |    "user_dim": {
      |      "dw_type": "dimension",
      |      "description": "user attributes",
      |      "incremental": true,
      |      "tableName": "user_dim",
      |      "columns": [
      |        {"name": "id", "type": "bigint", "description": "pk"},
      |        {"name": "name", "type": "varchar", "length": 256},
      |        {"name": "created_at", "type": "timestamp"},
      |        {"name": "visibility", "type": "enum"},
      |        {"name": "course_id", "type": "bigint",
      |         "dimension": {"name": "course", "id": "id", "role": "course"}}
      |      ]
      |    },
      |    "assignment_fact": {
      |      "dw_type": "fact",
      |      "incremental": false,
      |      "tableName": "assignment_fact",
      |      "columns": [
      |        {"name": "assignment_id", "type": "bigint"},
      |        {"name": "points_possible", "type": "double precision"},
      |        {"name": "due_at", "type": "datetime"},
      |        {"name": "muted", "type": "boolean"}
      |      ]
      |    }
      |  }
      |}""".stripMargin

  test("decode version + tables") {
    val s = CanvasSchema.fromJson(json)
    assert(s.version == "4.2.0")
    assert(s.tables.keySet == Set("user_dim", "assignment_fact"))
    assert(s.tables("user_dim").isDimension)
    assert(s.tables("user_dim").incremental)
    assert(!s.tables("assignment_fact").incremental)
  }

  test("toStructType: schema-ordered, typed, nullable, metadata kept") {
    val st = CanvasSchema.fromJson(json).tables("user_dim").toStructType
    assert(st.fieldNames.toSeq == Seq("id", "name", "created_at", "visibility", "course_id"))
    assert(st("id").dataType == LongType)
    assert(st("name").dataType == StringType)
    assert(st("name").metadata.getLong("length") == 256L)
    assert(st("created_at").dataType == TimestampType)
    assert(st.fields.forall(_.nullable))
    assert(st("course_id").metadata.getString("dimension.name") == "course")
  }

  test("fact table types") {
    val st = CanvasSchema.fromJson(json).tables("assignment_fact").toStructType
    assert(st("points_possible").dataType == DoubleType)
    assert(st("due_at").dataType == TimestampType)
    assert(st("muted").dataType == BooleanType)
  }

  test("case-insensitive table lookup without refetch (vs api_client.rs:181-221)") {
    val s = CanvasSchema.fromJson(json)
    assert(s.tableDefinition("USER_DIM").exists(_.tableName == "user_dim"))
    assert(s.tableDefinition("nope").isEmpty)
  }
}
