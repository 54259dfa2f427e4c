-- createTableSql
CREATE TABLE "account_dim" ("id" BIGINT, "_default" VARCHAR(32672), "generated" VARCHAR(32672), "flag" BOOLEAN, "score" DOUBLE, "kind" VARCHAR(32672), "n" INT, "body" VARCHAR(32672), "created_at" TIMESTAMP, "on_date" DATE, "label" VARCHAR(32672), "uid" VARCHAR(32672), "updated_at" TIMESTAMP)
-- dropTableSql
DROP TABLE "account_dim"
-- columnTypesOption
id BIGINT, _default VARCHAR(32672), generated VARCHAR(32672), flag BOOLEAN, score DOUBLE, kind VARCHAR(32672), n INT, body VARCHAR(32672), created_at TIMESTAMP, on_date DATE, label VARCHAR(32672), uid VARCHAR(32672), updated_at TIMESTAMP
-- mergeSql
DELETE FROM "account_dim" WHERE "id" IN (SELECT "id" FROM "account_dim__stage")
INSERT INTO "account_dim" ("id", "_default", "generated", "flag", "score", "kind", "n", "body", "created_at", "on_date", "label", "uid", "updated_at") SELECT "id", "_default", "generated", "flag", "score", "kind", "n", "body", "created_at", "on_date", "label", "uid", "updated_at" FROM "account_dim__stage"
DROP TABLE "account_dim__stage"
