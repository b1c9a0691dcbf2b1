package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-prefiltered joins: the shuffle-volume reducer for
  * selective fact⋈dim joins at 100 TB.
  *
  * A plain semi/inner join of a huge fact table against a selective
  * dimension shuffles EVERY fact row — including the ~99% that no
  * dimension key will ever match — because the hash exchange happens
  * before the join can reject anything. The fix is the classic
  * "broadcast a Bloom filter of the build side, prefilter the probe
  * side BEFORE its exchange" pattern: the filter is a few MB regardless
  * of fact size, false positives are removed by the exact join that
  * follows, so the result is EXACT while the shuffle carries only
  * (matches + fpp·rest) of the fact table.
  *
  * Built on Spark's own sketch machinery (the same classes Spark's
  * adaptive InjectRuntimeFilter rule uses): [[BloomFilterAggregate]]
  * builds the sketch distributedly (map-side partial sketches merged
  * once — no row ever leaves its partition), and the probe side filters
  * through the codegen'd [[BloomFilterMightContain]] predicate on the
  * same xxhash64 key. Only the finished sketch (not data) is pulled to
  * the driver and re-broadcast as a literal — identical in spirit to a
  * broadcast join's build side, but O(bits) instead of O(rows).
  *
  * Spark CAN inject this automatically (AQE runtime filters), but only
  * under size-threshold heuristics that a pipeline author often knows
  * better than the planner — this operator is the explicit form, and
  * PlanAuditSpec pins BOTH forms (explicit here, auto-injected via the
  * runtime-filter confs).
  *
  * No reference counterpart (the reference is a graph engine;
  * north-star extension per BASELINE.json).
  */
object BloomJoin {

  /** Default expected distinct keys for the sketch size; ~1.2 MB of bits
    * at fpp=0.03. Callers with a known build-side cardinality should pass
    * their own.
    */
  val DefaultExpectedItems = 1000000L
  val DefaultFpp = 0.03

  /** Build-side pass: the serialized Bloom sketch of `key` over `dim`,
    * built distributedly via [[BloomFilterAggregate]] on xxhash64(key).
    * The single-row result (the sketch bytes) is the ONLY thing
    * collected.
    */
  def bloomBytes(
      dim: DataFrame,
      key: Column,
      expectedItems: Long = DefaultExpectedItems,
      fpp: Double = DefaultFpp): Array[Byte] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems),
      Literal(numBits),
      0,
      0)
    dim
      .select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head()
      .getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a serialized sketch: true when
    * `value` MIGHT be in the set (no false negatives; fpp false
    * positives).
    */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        ColumnBridge.expression(xxhash64(value))))

  /** Exact left-semi join of `fact` against `dim` on `factKey = dimKey`,
    * with the fact side Bloom-prefiltered before its exchange. Result is
    * identical to the plain semi join (the join removes the sketch's
    * false positives); the shuffle upstream of the join carries only the
    * prefiltered fraction of the fact table.
    */
  def semiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = DefaultExpectedItems): DataFrame = {
    val bf = bloomBytes(dim, dim(dimKey), expectedItems)
    fact
      .filter(mightContain(bf, fact(factKey)))
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
  }
}
