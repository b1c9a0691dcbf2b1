package graft

import graft.functions.{GraftFunctions, Parity}

/** SQL-surface registration of the native expressions. */
class SqlFunctionsSpec extends SparkSpec {

  test("dot_product and poly_hash usable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark
      .sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d, " +
          "poly_hash('abc', 31, 1000003) AS h")
      .collect()(0)
    assert(row.getDouble(0) === 32.0)
    assert(row.getLong(1) === ((97L * 31 + 98) * 31 + 99) % Parity.TokP)
  }

  test("poly_hash rejects non-literal modulus") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT poly_hash('a', 31, doc) FROM (SELECT 5L AS doc)").collect()
    }
  }
}
