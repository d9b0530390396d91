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
    * bit-identical everywhere. Shared with the streamed monitor
    * ([[graft.streaming.DqStream]]), whose folded sums must flow
    * through the SAME arithmetic to stay bit-identical. */
  private[graft] def ratio(num: Column, den: Column): Column =
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
    rules.foreach(r => requireLexicalName(r, "check"))
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
    assemble(df.agg(metricCols.head, metricCols.tail: _*), rules)
  }

  /** Rule names are embedded verbatim in a generated stack() SQL
    * expression ([[assemble]]) and become `m_<name>` / `s_<name>`
    * column names (with parquet's own character restrictions for the
    * streamed partials), so they must be lexically inert: a quote,
    * backtick, or comma would break — or worse, silently alter — the
    * generated expression. */
  private def requireLexicalName(r: Rule, site: String): Unit =
    require(r.name.matches("[A-Za-z0-9_]+"),
      s"Validation.$site: rule name '${r.name}' must match " +
        "[A-Za-z0-9_]+ — names are embedded in generated SQL and " +
        "become report/partial column names")

  /** Pivot a 1-row frame of `m_<rule>` metric columns into the
    * per-rule report with a single stack() projection — no
    * self-union, no recompute. Shared by [[check]] and the streamed
    * monitor's fold path. */
  private[graft] def assemble(agged: DataFrame,
      rules: Seq[Rule]): DataFrame = {
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

  /** Per-rule ADDITIVE numerators + the row count, as ONE aggregation
    * row — the partial a streamed monitor persists per batch. Only
    * algebraic rules qualify: [[UniqueKey]] needs a distinct count,
    * which does not fold from per-batch partials (the honest options
    * at scale are a sketch or a keyed state store), so it is rejected
    * here rather than silently double-counted. Columns: `n` plus
    * `s_<rule>` (BIGINT counts; DECIMAL(28,6) sums for means). */
  private[graft] def partialNumerators(df: DataFrame,
      rules: Seq[Rule]): DataFrame = {
    rules.foreach(r => requireLexicalName(r, "partialNumerators"))
    rules.foreach {
      case u: UniqueKey => throw new IllegalArgumentException(
        s"Validation.partialNumerators: rule ${u.name} — UniqueKey " +
          "does not fold from per-batch partials; use the one-shot " +
          "check() or a sketch-based rule instead")
      case _ => ()
    }
    val numCols: Seq[Column] = rules.map {
      case Completeness(name, c, _, _) =>
        count(col(c)).as(s"s_$name")
      case Conformance(name, pred, _, _) =>
        coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
          .as(s"s_$name")
      case MeanBound(name, c, _, _) =>
        coalesce(sum(col(c).cast(DecimalType(28, 6))),
          lit(0).cast(DecimalType(28, 6))).as(s"s_$name")
      case u: UniqueKey =>
        throw new IllegalStateException(s"unreachable: ${u.name}")
    }
    df.agg(count(lit(1)).as("n"), numCols: _*)
  }

  /** Metric columns from FOLDED numerator sums — the same [[ratio]]
    * arithmetic as [[check]], so a report assembled from streamed
    * partials is bit-identical to the one-shot report over the same
    * rows. */
  private[graft] def metricsFromFolded(folded: DataFrame,
      rules: Seq[Rule]): DataFrame =
    folded.select(rules.map { r =>
      ratio(col(s"s_${r.name}"), col("n")).as(s"m_${r.name}")
    }: _*)
}
