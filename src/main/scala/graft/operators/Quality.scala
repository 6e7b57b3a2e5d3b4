package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking (deequ-style, minimal): declare
  * expectations, get one violation-count row back in a single pass.
  * Reference analog: the collectors' data-cleansing layer ("the data
  * at this point is mostly pristine", docs/sql_server.md) made
  * explicit and measurable.
  *
  * Scale shape: all constraints evaluate as conditional aggregates in
  * ONE map-side-combined aggregation over the table — adding a
  * constraint adds a column, not a pass.
  */
object Quality {

  sealed trait Constraint { def name: String; def violations: Column }
  case class NotNull(colName: String) extends Constraint {
    val name = s"not_null_$colName"
    val violations: Column = sum(when(col(colName).isNull, 1L).otherwise(0L))
  }
  case class InRange(colName: String, lo: Double, hi: Double) extends Constraint {
    val name = s"in_range_$colName"
    val violations: Column =
      sum(when(col(colName) < lo || col(colName) > hi, 1L).otherwise(0L))
  }
  case class OneOf(colName: String, allowed: Seq[String]) extends Constraint {
    val name = s"one_of_$colName"
    val violations: Column =
      sum(when(!col(colName).isin(allowed: _*), 1L).otherwise(0L))
  }
  case class Matches(colName: String, regex: String) extends Constraint {
    val name = s"matches_$colName"
    val violations: Column =
      sum(when(!col(colName).rlike(regex), 1L).otherwise(0L))
  }

  /** One row: total_rows + a violation count per constraint. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame =
    df.agg(count(lit(1)).as("total_rows"),
      constraints.map(c => c.violations.as(c.name)): _*)

  /** Uniqueness needs its own aggregation (count distinct vs count). */
  def uniqueViolations(df: DataFrame, cols: Seq[String]): Long = {
    val total = df.count()
    val distinct = df.select(cols.map(col): _*).distinct().count()
    total - distinct
  }

  /** Referential integrity: fact keys missing from the dimension. */
  def orphans(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String): DataFrame =
    fact.join(dim.select(col(dimKey)).distinct(),
      fact(factKey) === col(dimKey), "left_anti")
}
