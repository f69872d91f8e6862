package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — the same bootstrap the production
  * entry points use (`GraftSession`), so specs exercise the session
  * shape Verify/Bench actually run with (planner rule + functions
  * installed). Specs that need Spark's NATIVE planning (to show what a
  * query would do WITHOUT the engine's rule) use [[bare]].
  */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession.create("local[4]", 4, "graft-test")

  /** A rule-free sibling session (shared SparkContext, fresh session
    * state): no extraOptimizations, for before/after rewrite specs. */
  lazy val bare: SparkSession = spark.newSession()
}
