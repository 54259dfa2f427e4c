-- createTableSql
CREATE TABLE IF NOT EXISTS "account_dim" ("id" BIGINT, "_default" TEXT, "generated" TEXT, "flag" BOOLEAN, "score" double precision, "kind" TEXT, "n" INT, "body" TEXT, "created_at" TIMESTAMP, "on_date" DATE, "label" TEXT, "uid" TEXT, "updated_at" TIMESTAMP)
-- dropTableSql
DROP TABLE IF EXISTS "account_dim"
-- columnTypesOption
id BIGINT, _default TEXT, generated TEXT, flag BOOLEAN, score double precision, kind TEXT, n INT, body TEXT, created_at TIMESTAMP, on_date DATE, label TEXT, uid TEXT, updated_at TIMESTAMP
-- mergeSql
DELETE FROM "account_dim" WHERE "id" IN (SELECT "id" FROM "account_dim__stage")
INSERT INTO "account_dim" ("id", "_default", "generated", "flag", "score", "kind", "n", "body", "created_at", "on_date", "label", "uid", "updated_at") SELECT "id", "_default", "generated", "flag", "score", "kind", "n", "body", "created_at", "on_date", "label", "uid", "updated_at" FROM "account_dim__stage"
DROP TABLE "account_dim__stage"
