package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the canonical time-series operator
  * Spark SQL lacks natively.
  *
  * Implementation picks preference (a) from the custom-operator ladder
  * (compose built-ins; see the build brief): tag and UNION the two
  * sides, sort within each key partition by (ts, side), and carry the
  * right side's payload forward with an ignore-nulls `last` window.
  * One shuffle on the key, one sort — the same cost profile as a
  * sort-merge join, no custom SparkPlan needed. A native
  * `LogicalPlan`+`SparkStrategy` implementation (ladder step c) would
  * only pay off once the window's carried payload gets wide.
  *
  * Match semantics: for each left row, the right row with the greatest
  * `ts ≤ left.ts` (inclusive; right-at-equal-ts wins by side ordering).
  * The right side must be unique per (key, ts) — pre-aggregate it
  * (e.g. `max_by`) or ties are implementation-defined, which is also
  * true of DuckDB's native ASOF JOIN used as the oracle.
  */
object AsOfJoin {

  /** Left as-of join. `rightCols` are carried to matched left rows
    * (null when no prior right row exists).
    */
  def asOfLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      rightCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
    val rightTagged = right.withColumn("__side", lit(0))
    val leftOnly = left.columns.filterNot(c => c == key || c == tsCol)
    val rightOnly = rightCols

    // align schemas: key, ts, side, left payload (null on right rows),
    // right payload (null on left rows)
    val l = leftTagged.select(
      Seq(col(key), col(tsCol).as("__ts"), col("__side")) ++
        leftOnly.map(col) ++
        rightOnly.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = rightTagged.select(
      Seq(col(key), col(tsCol).as("__ts"), col("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightOnly.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightOnly.foldLeft(l.unionAll(r)) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(
        Seq(col(key), col("__ts").as(tsCol)) ++
          leftOnly.map(col) ++
          rightOnly.map(c => col(s"__c_$c").as(s"asof_$c")): _*)
  }

  /** Also carry the matched right row's timestamp. Convenience wrapper
    * used by the harness: right side gets its ts duplicated as a payload
    * column first.
    */
  def asOfLeftWithTs(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      rightCols: Seq[String]): DataFrame =
    asOfLeft(
      left,
      right.withColumn("__rts", col(tsCol)),
      key,
      tsCol,
      rightCols :+ "__rts")
}
