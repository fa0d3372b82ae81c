package graft.ingest

import graft.SparkSpec

/** op-17 DDL + op-18 config parity specs. */
class CatalogConfigSpec extends SparkSpec {

  test("op-17: recreateAll creates schema + 3 tables; drop removes") {
    val db = "graft_ddl_spec"
    Catalog.recreateAll(spark, recreate = true, database = db)
    // SHOW TABLES also lists session temp views (q_rollup/q_grouping_sets
    // register some in the shared test session) — keep only catalog tables.
    val tables = spark.sql(s"SHOW TABLES IN $db").collect()
      .filter(!_.getBoolean(2)).map(_.getString(1)).toSet
    assert(tables == Set("pp_complete_data", "pp_complete_metadata", "test_table"))
    // schema-on-write: the catalog table carries the declared StructType
    val dataCols = spark.table(s"$db.pp_complete_data").schema.fieldNames.toSeq
    assert(dataCols == PPComplete.columns)
    assert(
      spark.table(s"$db.pp_complete_data").schema("transaction_date").dataType ==
        org.apache.spark.sql.types.TimestampType
    )
    // recreate drops and recreates (idempotent, like recreate=True)
    Catalog.recreateAll(spark, recreate = true, database = db)
    assert(
      spark.sql(s"SHOW TABLES IN $db").collect().count(!_.getBoolean(2)) == 3
    )
    // cleanup
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("op-18: connection-string formatters match the reference forms") {
    val c = Config("h", "u", "pw", "db")
    assert(c.connectionUrl == "postgresql://u:pw@h/db")
    assert(c.connectionUrlPsycopg2 == "postgresql+psycopg2://u:pw@h/db")
    assert(c.connectionUrlPsycopg == "postgresql+psycopg://u:pw@h/db")
    assert(c.connectionUrlWithPort == "postgresql+psycopg://u:pw@h:5432/db")
    assert(c.connectionKeyValue == "user=u password=pw host=h dbname=db port=5432")
    assert(c.jdbcUrl == "jdbc:postgresql://h:5432/db")
  }

  test("op-18: missing env var fails fast (reference KeyError semantics)") {
    assertThrows[NoSuchElementException] {
      Config.fromEnv(Map("POSTGRES_HOST" -> "h")) // user/password/db missing
    }
  }
}
