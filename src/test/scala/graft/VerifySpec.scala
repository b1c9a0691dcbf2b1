package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The dump loop's error path: a throwing query must be SURFACED (its
  * parquet dir absent while its oracle entry remains, so the driver's
  * compare records `err`), never swallowed into a green wall, and must
  * not take the later queries down with it.
  */
class VerifySpec extends SparkSpec {

  test("a throwing query leaves no parquet but keeps its oracle entry; later queries still run") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_verify_spec").toString
    val good = (s: org.apache.spark.sql.SparkSession, _: String) =>
      Seq((1L, "x")).toDF("id", "v")
    val bad = (_: org.apache.spark.sql.SparkSession, _: String) =>
      throw new RuntimeException("deliberate")
    // alphabetical order runs a_bad first — the good query after it
    // proves the loop survives the throw
    Verify.dump(
      spark,
      "unused",
      out,
      queries = scala.collection.immutable.ListMap("a_bad" -> bad, "b_good" -> good),
      oracles = Map("a_bad" -> "SELECT 1 AS one", "b_good" -> "SELECT 1 AS one"))
    assert(!Files.exists(Paths.get(s"$out/a_bad")), "failed query must not leave a result dir")
    assert(Files.exists(Paths.get(s"$out/b_good")), "queries after a failure must still run")
    val oracleJson = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(oracleJson.contains("\"a_bad\""), "the failed query's oracle entry must survive — that is what makes the driver record err instead of silence")
    // the manifest self-check (round 14: a registered query's row vanished
    // from the driver's correctness file with no err) must name the
    // missing query and carry the registered-vs-dumped counts
    val manifest = Files.readString(Paths.get(s"$out/manifest.json"))
    assert(manifest.contains("\"registered\": 2"), manifest)
    assert(manifest.contains("\"dumped\": 1"), manifest)
    assert(manifest.contains("\"a_bad\""), "the missing query must be NAMED in the manifest")
    assert(!manifest.contains("\"b_good\""), "a dumped query must not be listed missing")
  }

  test("manifest reports all-dumped when every query succeeds") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_verify_spec_ok").toString
    val good = (s: org.apache.spark.sql.SparkSession, _: String) =>
      Seq((1L, "x")).toDF("id", "v")
    Verify.dump(
      spark,
      "unused",
      out,
      queries = Map("only_q" -> good),
      oracles = Map("only_q" -> "SELECT 1 AS one"))
    val manifest = Files.readString(Paths.get(s"$out/manifest.json"))
    assert(manifest.contains("\"registered\": 1"), manifest)
    assert(manifest.contains("\"dumped\": 1"), manifest)
    assert(manifest.contains("\"missing\": []"), manifest)
  }

  test("fault injection is flag-gated: off by default, on under the sysprop") {
    assert(!Verify.effectiveQueries.contains("fault_injection"))
    assert(!Verify.effectiveOracles.contains("fault_injection"))
    System.setProperty("graft.verify.fault", "1")
    try {
      assert(Verify.effectiveQueries.contains("fault_injection"))
      assert(Verify.effectiveOracles.contains("fault_injection"))
      val e = intercept[RuntimeException] {
        Verify.effectiveQueries("fault_injection")(spark, "unused")
      }
      assert(e.getMessage.contains("deliberate fault"))
    } finally System.clearProperty("graft.verify.fault")
  }
}
