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

  test("the fixed q130 emits drop_frac as DoubleType") {
    val df = graft.queries.Pipeline.q130(spark, sf)
    assert(df.schema("drop_frac").dataType ==
      org.apache.spark.sql.types.DoubleType)
    Verify.assertNoDecimal("q130_dataset_card", df.schema)
  }
}
