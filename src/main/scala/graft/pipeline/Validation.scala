package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declarative data-quality validation (Deequ-style): a rule set is
  * compiled into ONE aggregation pass over ONE scan of the table, and
  * the result is a tiny per-rule report (rule, metric, threshold, op,
  * passed). This is the shape that survives 100 TB: adding a rule
  * adds an aggregate expression, never a scan — completeness, range
  * conformance, pattern conformance, and mean checks all fold into
  * the same map-side partial aggregation; a single key-uniqueness
  * rule rides the same pass as Spark's two-stage distinct aggregate
  * (still one scan). The report itself is O(rules) rows.
  *
  * The reference (joshmcarthur/xml-to-sqlite3) enforces its contracts
  * as SQLite constraints (PRIMARY KEY / UNIQUE in
  * db/migrate/001_create_base_schema.rb:5-40) checked row-at-a-time
  * on insert; at warehouse scale the equivalent is a post-hoc
  * validation report like this one.
  *
  * Determinism: ratios are exact integer-count divisions routed
  * through DECIMAL before a 6-dp round; mean metrics sum in
  * DECIMAL(28,6) (no float accumulation order sensitivity).
  */
object Validation {

  /** One declarative rule: `name` labels the report row, the compiled
    * aggregate produces the metric, and the check asserts
    * `metric op threshold` with op ∈ {">=", "<="}. */
  sealed trait Rule {
    def name: String
    def threshold: Double
    def op: String
  }

  /** Fraction of rows where `col` is non-null. */
  final case class Completeness(name: String, col: String,
      threshold: Double, op: String = ">=") extends Rule

  /** Fraction of rows satisfying an arbitrary row predicate
    * (range membership, regexp match, non-negativity, ...). Rows
    * where the predicate evaluates to null count as non-conforming. */
  final case class Conformance(name: String, predicate: Column,
      threshold: Double, op: String = ">=") extends Rule

  /** Distinct (non-null) key combinations / total rows — 1.0 iff the
    * column set is a candidate key. Uses an exact distinct aggregate;
    * keep at most one per check() call so the plan stays a single
    * two-stage distinct pass (a second one would add an Expand). */
  final case class UniqueKey(name: String, cols: Seq[String],
      threshold: Double, op: String = ">=") extends Rule

  /** Mean of a numeric column compared against a bound. */
  final case class MeanBound(name: String, col: String,
      threshold: Double, op: String) extends Rule

  /** Exact integer counts, ONE double division, then the
    * decimal-routed 6-dp round (StarQueries.roundd pattern) — decimal
    * ÷ decimal is avoided because engines disagree on the result
    * scale, while a single IEEE division of exact values is
    * bit-identical everywhere. */
  private def ratio(num: Column, den: Column): Column =
    round((num.cast("double") / den.cast("double"))
      .cast(DecimalType(28, 10)), 6).cast("double")

  /** Compile `rules` into one aggregation pass and evaluate the
    * report. Output: (rule, metric, threshold, op, passed), one row
    * per rule, ordered by rule name. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Validation.check: need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "Validation.check: rule names must be unique")
    rules.foreach(r => require(r.op == ">=" || r.op == "<=",
      s"Validation.check: rule ${r.name} op must be >= or <="))
    val n = count(lit(1))
    val metricCols: Seq[Column] = rules.map {
      case Completeness(name, c, _, _) =>
        ratio(count(col(c)), n).as(s"m_$name")
      case Conformance(name, pred, _, _) =>
        ratio(sum(when(pred, 1L).otherwise(0L)), n).as(s"m_$name")
      case UniqueKey(name, cols, _, _) =>
        ratio(countDistinct(col(cols.head),
          cols.tail.map(col): _*), n).as(s"m_$name")
      case MeanBound(name, c, _, _) =>
        ratio(sum(col(c).cast(DecimalType(28, 6))), n).as(s"m_$name")
    }
    val agged = df.agg(metricCols.head, metricCols.tail: _*)
    // Pivot the 1-row metric frame into one report row per rule with
    // a single stack() projection — no self-union, no recompute.
    val stackArgs = rules.flatMap { r =>
      Seq(s"'${r.name}'", s"`m_${r.name}`",
        r.threshold.toString + "D", s"'${r.op}'")
    }.mkString(", ")
    agged
      .select(expr(
        s"stack(${rules.size}, $stackArgs) AS (rule, metric, threshold, op)"))
      .withColumn("passed",
        when(col("op") === ">=", col("metric") >= col("threshold"))
          .otherwise(col("metric") <= col("threshold")))
      .orderBy(col("rule"))
  }
}
