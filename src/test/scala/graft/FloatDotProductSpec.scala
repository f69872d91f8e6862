package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** The native codegen'd dot-product expression: value parity with the
  * builtin fold, null handling, SQL registration, codegen execution.
  * Constructed through the PUBLIC `call_function` path (the session is
  * GraftSession-bootstrapped, so `float_dot` is registered) — the same
  * way the similarity models consume it.
  */
class FloatDotProductSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def fd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("float_dot", a, b)

  test("matches the builtin aggregate(zip_with) fold exactly") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f)))
      .toDF("a", "b")
    val builtin = aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val rows = df.select(fd($"a", $"b").as("native"), builtin.as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, r) => assert(n == r) } // bit-exact, not approx
    assert(rows(0)._1 == 32.0d)
  }

  test("null input yields null (BinaryExpression null semantics)") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(fd($"a", $"b")).head().isNullAt(0))
  }

  test("registered SQL function works and type-checks") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val v = spark.sql("SELECT float_dot(a, b) FROM vecs").head().getDouble(0)
    assert(v == 11.0d)
    val err = intercept[Exception] {
      spark.sql("SELECT float_dot(a, 1) FROM vecs").collect()
    }
    assert(err.getMessage.contains("float_dot") ||
      err.getMessage.toLowerCase.contains("type"))
  }

  test("double_dot / double_l2 match the builtin folds bit-exactly") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, 0.6)),
      // order-sensitive case: a permuted fold WOULD differ in the last
      // ulp, so bit-equality here pins the left-to-right order too
      (Array(1e16, 1.0, -1e16), Array(1.0, 1.0, 1.0)))
      .toDF("a", "b")
    val refDot = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val refL2 = aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)
    val rows = df.select(
      call_function("double_dot", $"a", $"b").as("nd"), refDot.as("rd"),
      call_function("double_l2", $"a", $"b").as("nl"), refL2.as("rl"))
      .as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (nd, rd, nl, rl) =>
      assert(nd == rd && nl == rl) // bit-exact, not approx
    }
    assert(rows(0)._1 == 32.0d && rows(0)._3 == 27.0d)
  }

  test("mismatched lengths and null elements yield NULL like the builtin") {
    // zip_with pads the shorter array with null → null product → the
    // builtin fold returns null. The native expressions must agree —
    // NOT silently truncate to the shorter length or read nulls as 0.
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](4.0, 5.0)),
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](4.0, 5.0, 6.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val rows = df.select(
      call_function("double_dot", $"a", $"b").as("d"),
      call_function("double_l2", $"a", $"b").as("l")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1)) // length mismatch
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // null element
    assert(rows(2).getDouble(0) == 11.0d && rows(2).getDouble(1) == 8.0d)
    // float sibling: same contract
    val fdf = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f)),
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)))
      .toDF("a", "b")
    val frows = fdf.select(fd($"a", $"b")).collect()
    assert(frows(0).isNullAt(0) && frows(1).isNullAt(0))
  }

  test("runs inside whole-stage codegen over a real scan") {
    val emb = graft.catalog.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = emb.select(fd($"embedding", $"embedding").as("norm2"))
    // plan should execute (codegen path) and give positive norms
    val norms = out.as[Double].collect()
    assert(norms.nonEmpty && norms.forall(_ > 0.0))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; the Project computing float_dot must carry it
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("float_dot"))
  }
}
