package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split handles most runtime skew; explicit salting
  * remains the tool when one key dominates so heavily that even split
  * partitions bottleneck (the classic power-law `parent_id` or
  * token-frequency case in this engine's sibling and inverted-index
  * joins). The fact table gets a per-row salt; the dimension side is
  * replicated across all salt values; the join key becomes
  * (key, salt) — identical results, `numSalts`× finer key granularity.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `numSalts` ways.
    * `fact` is the large/skewed side. Result equals the plain join
    * (column order: fact columns then dim columns, key kept once). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    // right/full outer would surface the dim replicas for unmatched
    // keys (numSalts rows instead of one) — only fact-preserving join
    // types are equivalent to the plain join
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed(joinType.toLowerCase.replace("_", "")) ||
      allowed(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType (dim side is replicated)")
    // deterministic spread: hash of the whole fact row modulo salts
    // (any per-row value works — the salt never reaches the output)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*),
        lit(numSalts)).cast("int"))
    val expandedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(expandedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase salted aggregation — the skew tool for hot GROUP BY
    * keys (saltedJoin's counterpart): phase 1 aggregates by
    * (key, salt) so a dominant key's rows spread over `numSalts`
    * reducers, phase 2 merges the partials by key. Only valid for
    * aggregates with an associative merge — this helper does
    * SUM/COUNT, the shapes that dominate skewed rollups (AVG = summed
    * parts; MIN/MAX would merge the same way). Results equal the
    * plain `groupBy(key).agg(sum, count)` exactly: integer/decimal
    * sums are order-independent, and double sums should be routed
    * through decimal by the caller (StarQueries.sumd) as everywhere
    * else in the gate. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      numSalts: Int): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
        lit(numSalts)).cast("int"))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("cnt"))
  }
}
