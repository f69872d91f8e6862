package graft

import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The output-type contract behind the driver's hash compare: no query
  * may emit a DECIMAL column (Spark renders them scale-preserving,
  * the DuckDB oracle float-style — value-equal results hash apart), and
  * `SparkEntry.doubleCols` — which drives the oracle-side CAST..AS DOUBLE
  * wrapper — must list exactly the columns the raw queries produce as
  * decimals. Schema-only: plans are analyzed, never executed.
  */
class OutputContractSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("doubleCols matches each raw query's actual DecimalType columns") {
    val mismatches = SparkEntry.rawQueries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val actual = fn(spark, sf).schema.fields
          .filter(_.dataType.isInstanceOf[DecimalType]).map(_.name).toSet
        val declared = SparkEntry.doubleCols.getOrElse(name, Nil).toSet
        if (actual == declared) None
        else Some(s"$name: schema=$actual declared=$declared")
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }

  test("published queries emit no DECIMAL output columns") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val decs = fn(spark, sf).schema.fields
        .filter(_.dataType.isInstanceOf[DecimalType]).map(_.name)
      assert(decs.isEmpty, s"$name still emits DECIMAL: ${decs.mkString(",")}")
    }
  }

  test("oracleSql wraps exactly the doubleCols queries") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val wrapped = sql.startsWith("SELECT * REPLACE")
      val expected = SparkEntry.doubleCols.getOrElse(name, Nil).nonEmpty
      assert(wrapped == expected, s"$name: wrapped=$wrapped expected=$expected")
    }
  }
}
