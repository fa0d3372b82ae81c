package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** DDL surface — reference op-17 (`create_table_pp_complete_data.py:9-31`,
  * `create_table_pp_complete_metadata.py`, `create_test_table.py`,
  * orchestrator `create_table_recreate_all_tables.py:6-15`).
  *
  * The reference derives DDL from ORM metadata under one Postgres schema
  * `land_registry_simple`; here the single source of truth is the
  * `StructType`s in [[PPComplete]]/[[RunMeta]] and the DDL is issued
  * through the Spark SQL catalog (`CREATE DATABASE` / `CREATE TABLE …
  * USING parquet`). At scale these are metastore operations — data files
  * land wherever the warehouse points (object storage on a cluster).
  */
object Catalog {

  val SchemaName = "land_registry_simple"

  /** `test_table` (reference `lib_db.py:61-66`): 2-column smoke table. */
  val testTableSchema: StructType = StructType(Seq(
    StructField("text_column", StringType),
    StructField("int_column", IntegerType)
  ))

  /** RunMeta as a StructType (durations as micros — SURVEY §7.4). */
  lazy val metadataSchema: StructType =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[RunMeta]().schema

  def createSchema(spark: SparkSession, name: String = SchemaName): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name")

  /** CREATE TABLE from a StructType (schema-on-write, like the ORM DDL). */
  def createTable(
      spark: SparkSession,
      table: String,
      schema: StructType,
      database: String = SchemaName
  ): Unit = {
    createSchema(spark, database)
    val cols = schema.toDDL
    spark.sql(s"CREATE TABLE IF NOT EXISTS $database.$table ($cols) USING parquet")
  }

  def dropTable(spark: SparkSession, table: String, database: String = SchemaName): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $database.$table")

  /** Orchestrator — reference `create_table_recreate_all_tables.py`
    * (forces recreate=True): drop + create the data, metadata and test
    * tables.
    */
  def recreateAll(spark: SparkSession, recreate: Boolean = true, database: String = SchemaName): Unit = {
    val tables = Seq(
      "pp_complete_data" -> PPComplete.typedSchema,
      "pp_complete_metadata" -> metadataSchema,
      "test_table" -> testTableSchema
    )
    createSchema(spark, database)
    tables.foreach { case (name, schema) =>
      if (recreate) dropTable(spark, name, database)
      createTable(spark, name, schema, database)
    }
  }
}
