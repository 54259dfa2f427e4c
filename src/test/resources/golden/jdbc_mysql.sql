-- createTableSql
CREATE TABLE IF NOT EXISTS `account_dim` (`id` BIGINT, `_default` LONGTEXT, `_generated` LONGTEXT, `flag` VARCHAR(10), `score` FLOAT(17), `kind` TEXT, `n` INT, `body` LONGTEXT, `created_at` DATETIME, `on_date` DATE, `label` LONGTEXT, `uid` LONGTEXT, `updated_at` DATETIME) CHARACTER SET utf8mb4
-- dropTableSql
DROP TABLE IF EXISTS `account_dim`
-- columnTypesOption
id BIGINT, _default LONGTEXT, _generated LONGTEXT, flag VARCHAR(10), score FLOAT(17), kind TEXT, n INT, body LONGTEXT, created_at DATETIME, on_date DATE, label LONGTEXT, uid LONGTEXT, updated_at DATETIME
-- mergeSql
DELETE FROM `account_dim` WHERE `id` IN (SELECT `id` FROM `account_dim__stage`)
INSERT INTO `account_dim` (`id`, `_default`, `_generated`, `flag`, `score`, `kind`, `n`, `body`, `created_at`, `on_date`, `label`, `uid`, `updated_at`) SELECT `id`, `_default`, `_generated`, `flag`, `score`, `kind`, `n`, `body`, `created_at`, `on_date`, `label`, `uid`, `updated_at` FROM `account_dim__stage`
DROP TABLE `account_dim__stage`
