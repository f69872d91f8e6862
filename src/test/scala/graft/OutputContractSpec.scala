package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The output-type contract behind the driver's hash compare: no query
  * may emit a DECIMAL column (Spark renders them scale-preserving,
  * the DuckDB oracle float-style — value-equal results hash apart), and
  * `SparkEntry.doubleCols` — which drives the oracle-side CAST..AS DOUBLE
  * wrapper — must list exactly the columns the raw queries produce as
  * decimals. Plans are mostly analyzed, not executed — except d07
  * (eager fixpoint during construction) and the KRE chain, whose shared
  * intermediates materialize once via `Shared` (small at sf0.001).
  */
class OutputContractSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** decimalsToDouble only rewrites top-level columns, so a nested
    * decimal would silently bypass the whole contract — detect it
    * anywhere in the type tree and fail loudly instead. */
  private def hasNestedDecimal(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => containsDecimal(et)
    case MapType(kt, vt, _) => containsDecimal(kt) || containsDecimal(vt)
    case st: StructType => st.fields.exists(f => containsDecimal(f.dataType))
    case _ => false
  }
  private def containsDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case other => hasNestedDecimal(other)
  }

  test("no query emits a decimal nested inside array/struct/map") {
    SparkEntry.rawQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val nested = fn(spark, sf).schema.fields
        .filter(f => hasNestedDecimal(f.dataType)).map(_.name)
      assert(nested.isEmpty,
        s"$name has nested decimal in ${nested.mkString(",")} — " +
          "decimalsToDouble/doubleCols cannot express this; restructure " +
          "the output or extend the contract explicitly")
    }
  }

  test("no published query emits a top-level array/struct/map column") {
    // The driver's pandas comparator cannot sort/hash complex cells
    // (q36's ARRAY<BIGINT> died with "unhashable type: numpy.ndarray"
    // in round 2) — complex outputs must be exploded to rows or
    // serialized with to_json before publication.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val complex = fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] => f.name
      }
      assert(complex.isEmpty,
        s"$name emits complex-typed column(s) ${complex.mkString(",")} — " +
          "explode to rows or to_json before publishing")
    }
  }

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
