package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation patterns.
  *
  * A single hot group key at 100 TB turns one reducer into the job's
  * critical path. The classic remedy is two-phase salted aggregation:
  * pre-aggregate on (key, salt) — spreading the hot key over `salts`
  * reducers — then combine the partials per key. Only decomposable
  * aggregates (count/sum/min/max) qualify; the result is EXACTLY equal
  * to the direct groupBy for integer measures (associative sums), which
  * is how the harness oracle-checks it against a plain GROUP BY.
  *
  * (AQE's skewedJoin handles skewed JOINS automatically; skewed
  * AGGREGATION keys are still the application's job.)
  */
object SkewOps {

  /** Two-phase count+sum over a possibly-skewed key. `saltExpr` must be
    * deterministic per row (e.g. `pmod(event_id, 8)`) — a random salt
    * would break retry-safety.
    */
  def saltedCountSum(
      df: DataFrame,
      key: Column,
      measure: Column,
      saltExpr: Column): DataFrame =
    df.select(key.as("key"), measure.as("m"), saltExpr.as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("m")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("sum_m"))
}
