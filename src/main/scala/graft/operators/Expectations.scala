package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE table scan —
  * the generalization of the reference's hand-written silver validation
  * trio (`etl_transactions_silver.py:24-86`: amount range, currency
  * IN-list, status IN-list) into a rule catalog any table can declare.
  * Where [[graft.transform.Audit]] tags and splits ROWS, this produces
  * the per-RULE summary a pipeline gates on (the DQ summary JSON the
  * reference README declares but never implements, `README.md:85-87`).
  *
  * Evaluation contract:
  *  - every row-level rule becomes one conditional aggregate over the
  *    SAME scan — adding a rule adds a projection column, never a pass;
  *  - violation predicates are TOTAL: a NULL that cannot satisfy the
  *    rule counts as a violation (NOT-IN-with-NULL can never be true, so
  *    naive `!isin` would silently under-count — same trap ADVICE flagged
  *    on q99's NOT IN oracle);
  *  - [[Rule.Unique]] is the one non-row-local rule: violations =
  *    COUNT(*) − COUNT(DISTINCT key), computed in the same agg (Catalyst
  *    plans the distinct via Expand — still a single scan, two exchanges
  *    of partial state, never a second read). SQL-standard caveat: rows
  *    with a NULL key column are skipped by COUNT(DISTINCT) — pair with
  *    [[Rule.NotNull]] on the key, as any real suite does.
  *
  * At 100 TB: the whole suite is one pruned scan reading exactly the
  * referenced columns + map-side partial aggregation; the report is
  * O(rules) rows. This is the shape Deequ computes metrics with, minus
  * the framework.
  */
object Expectations {

  sealed trait Rule {
    /** Stable rule id surfaced in the report. */
    def id: String
    /** Column(s) the rule targets, surfaced in the report. */
    def target: String
  }

  object Rule {
    /** Column must be non-null. */
    final case class NotNull(column: String) extends Rule {
      val id = "not_null"; val target = column
    }
    /** Column must be one of `allowed` (NULL violates). */
    final case class InSet(column: String, allowed: Seq[String]) extends Rule {
      val id = "in_set"; val target = column
    }
    /** lo <= column <= hi, inclusive (NULL violates). */
    final case class Between(column: String, lo: Double, hi: Double) extends Rule {
      val id = "between"; val target = column
    }
    /** Column must match the (Java/RE2-compatible) regex (NULL violates). */
    final case class Matches(column: String, pattern: String) extends Rule {
      val id = "matches"; val target = column
    }
    /** The column tuple must be unique across the table. */
    final case class Unique(columns: Seq[String]) extends Rule {
      val id = "unique"; val target = columns.mkString(",")
    }
  }
  import Rule._

  /** Total (null-counting) violation predicate of a row-level rule. */
  private def violates(r: Rule): Column = r match {
    case NotNull(c)        => col(c).isNull
    case InSet(c, allowed) => !col(c).isin(allowed: _*) || col(c).isNull
    case Between(c, lo, hi) =>
      !(col(c) >= lit(lo) && col(c) <= lit(hi)) || col(c).isNull
    case Matches(c, p) => !col(c).rlike(p) || col(c).isNull
    case _: Unique     => throw new IllegalArgumentException("not row-level")
  }

  /** Evaluate the rule suite in one scan. Report schema (one row per
    * rule, input order): `rule` STRING, `target` STRING, `n_violations`
    * BIGINT, `n_rows` BIGINT, `passed` BIGINT (0/1 — portable across
    * engines that disagree on boolean rendering). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    val aggs = rules.zipWithIndex.map {
      case (u: Unique, i) =>
        (count(lit(1)) - count_distinct(col(u.columns.head),
          u.columns.tail.map(col): _*)).as(s"__v$i")
      case (r, i) =>
        sum(when(violates(r), 1L).otherwise(0L)).as(s"__v$i")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val reportRows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.id).as("rule"), lit(r.target).as("target"),
        coalesce(col(s"__v$i"), lit(0L)).cast("long").as("n_violations"),
        col("__n").cast("long").as("n_rows"),
        when(coalesce(col(s"__v$i"), lit(0L)) === 0, 1L).otherwise(0L)
          .as("passed"))
    }
    one.select(explode(array(reportRows: _*)).as("r")).select("r.*")
  }

  /** Rules that failed, as (rule, target, n_violations) — empty means the
    * suite passed. Driver-side by design: the report is O(rules) rows. */
  def failures(df: DataFrame, rules: Seq[Rule]): Seq[(String, String, Long)] =
    check(df, rules).filter(col("passed") === 0)
      .select("rule", "target", "n_violations")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
}
