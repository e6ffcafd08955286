package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog DDL/introspection helpers (SURVEY.md §2.1 S13).
  *
  * The reference namespaces its lake layers as databases
  * (`curate_data.py:110-111` CREATE DATABASE, `serving_layer.py:17-37`
  * SHOW DATABASES/TABLES, `lakehouse_data_igestion.py:136-138`
  * DESCRIBE TABLE). Thin wrappers over `spark.sql`/`spark.catalog` so
  * pipelines can declare their namespaces programmatically.
  */
object Catalog {

  def createDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")

  def dropDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$name` CASCADE")

  def showDatabases(spark: SparkSession): DataFrame =
    spark.sql("SHOW DATABASES")

  def showTables(spark: SparkSession, db: String): DataFrame =
    spark.sql(s"SHOW TABLES IN `$db`")

  def describeTable(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $table")

  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)
}
