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

  test("simhash40 and minhash_sig usable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark
      .sql(
        // hashes 1L (bit 0) and 3L (bits 0,1): votes bit0=+2, bit1=0 → 1
        "SELECT simhash40(array(1L, 3L)) AS sh, " +
          "minhash_sig(CAST(array() AS ARRAY<BIGINT>), 4) AS empty_sig")
      .collect()(0)
    assert(row.getLong(0) === 1L)
    assert(row.getSeq[Long](1) === Seq.fill(4)(Parity.BigP))
  }

  test("poly_hash rejects non-literal modulus") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT poly_hash('a', 31, doc) FROM (SELECT 5L AS doc)").collect()
    }
  }
}
