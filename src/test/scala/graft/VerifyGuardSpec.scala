package graft

/** Verify's output-dtype guard (r20 verdict task 3): a query whose output
  * schema carries a DecimalType must be REFUSED before its parquet ships —
  * the driver hashes dtypes, the DuckDB oracle yields float64, and r20's
  * q130 went hash-red on exactly this class while every value agreed.
  */
class VerifyGuardSpec extends SparkFunSuite {

  test("a decimal-emitting query is refused") {
    // the r20 q130 shape: unsuffixed 0.0/1.0 literals parse as DECIMAL(1,1)
    val df = spark.range(10).selectExpr(
      "round(sum(CASE WHEN id % 2 = 0 THEN 0.0 ELSE 1.0 END) / count(1), 4) AS drop_frac")
    assert(df.schema("drop_frac").dataType
      .isInstanceOf[org.apache.spark.sql.types.DecimalType])
    val e = intercept[IllegalArgumentException] {
      Verify.assertNoDecimal("q_decimal_probe", df.schema)
    }
    assert(e.getMessage.contains("drop_frac"))
    assert(e.getMessage.contains("q_decimal_probe"))
  }

  test("double-typed output passes, including the fixed q130 shape") {
    val df = spark.range(10).selectExpr(
      "round(sum(CASE WHEN id % 2 = 0 THEN 0.0D ELSE 1.0D END) / count(1), 4) AS drop_frac")
    assert(df.schema("drop_frac").dataType ==
      org.apache.spark.sql.types.DoubleType)
    Verify.assertNoDecimal("q_double_probe", df.schema) // must not throw
  }

  test("schema snapshot guard catches int64-vs-int32 and date-vs-timestamp drift") {
    // the committed-snapshot breadth guard (r21 verdict task 8): the same
    // driver-hash mismatch q130 hit via decimal can arrive via ANY dtype
    // drift; pin the two named classes plus the pass case
    val want = Map("q_probe" -> "day DATE, n BIGINT")
    val ok = spark.sql("SELECT DATE '2024-01-01' AS day, 1L AS n")
    Verify.assertExpectedSchema("q_probe", ok.schema, want) // must not throw
    // int64 -> int32 drift
    val narrowed = spark.sql("SELECT DATE '2024-01-01' AS day, CAST(1 AS INT) AS n")
    val e1 = intercept[IllegalArgumentException] {
      Verify.assertExpectedSchema("q_probe", narrowed.schema, want)
    }
    assert(e1.getMessage.contains("drifted"))
    // date -> timestamp drift
    val widened = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS day, 1L AS n")
    val e2 = intercept[IllegalArgumentException] {
      Verify.assertExpectedSchema("q_probe", widened.schema, want)
    }
    assert(e2.getMessage.contains("drifted"))
    // a query not yet in the snapshot passes (regeneration not required
    // for local iteration on new queries)
    Verify.assertExpectedSchema("q_unsnapshotted", narrowed.schema, want)
  }

  test("the committed schema snapshot covers the full registry") {
    val expected = Verify.loadExpectedSchemas()
    assert(expected.size == SparkEntry.queries.size,
      s"expected-schemas.txt has ${expected.size} entries for " +
        s"${SparkEntry.queries.size} registered queries — regenerate with " +
        "SPARK_GRAFT_SCHEMA_SNAPSHOT=1")
    assert(SparkEntry.queries.keySet.forall(expected.contains))
  }

  test("the fixed q130 emits drop_frac as DoubleType") {
    val df = graft.queries.Pipeline.q130(spark, sf)
    assert(df.schema("drop_frac").dataType ==
      org.apache.spark.sql.types.DoubleType)
    Verify.assertNoDecimal("q130_dataset_card", df.schema)
  }
}
