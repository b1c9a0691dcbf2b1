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
    *
    * The right payload travels as ONE struct carried by a single
    * ignore-nulls `last` — so the matched columns always come from the
    * same right row, even when some of its payload fields are NULL
    * (per-column carries would stitch fields from different rows,
    * diverging from true as-of semantics and DuckDB's native ASOF JOIN).
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
    val rType = org.apache.spark.sql.types.StructType(
      rightOnly.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))

    // align schemas: key, ts, side, left payload (null on right rows),
    // right payload struct (null on left rows — never null on right rows,
    // even when every field inside is null)
    val l = leftTagged.select(
      Seq(col(key), col(tsCol).as("__ts"), col("__side")) ++
        leftOnly.map(col) :+
        lit(null).cast(rType).as("__r"): _*)
    val r = rightTagged.select(
      Seq(col(key), col(tsCol).as("__ts"), col("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightOnly.map(col): _*).as("__r"): _*)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionAll(r)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        Seq(col(key), col("__ts").as(tsCol)) ++
          leftOnly.map(col) ++
          rightOnly.map(c => col("__c").getField(c).as(s"asof_$c")): _*)
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
