package graft

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.runner._
import graft.sinks.{JdbcServingStore, Replicator}

/** The real JDBC serving sink (§2.1 S7's actual target): the same
  * watermark/rename replication semantics as the parquet mode, driven
  * against an embedded Derby database — existence probe, JDBC-read
  * sink-side watermark, distributed jdbc-format writes, and the
  * rebuild path's generated-identity primary key.
  */
class JdbcSinkSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // Derby writes a derby.log wherever it feels like; pin it to tmp
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private val jdbcOpts =
    Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def store(db: String) =
    new JdbcServingStore(spark,
      s"jdbc:derby:memory:$db;create=true", jdbcOpts)

  private def readSink(db: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", s"jdbc:derby:memory:$db;create=true")
      .option("dbtable", table)
      .options(jdbcOpts)
      .load()

  private def src(days: Int): DataFrame = (1 to days).map(d =>
    (f"2024-01-$d%02d", d.toLong, d * 10L))
    .toDF("dk", "app_id", "total_amount")
    .select(to_date($"dk").as("date_key"), $"app_id", $"total_amount")

  test("incremental replication into Derby: watermark read back via JDBC") {
    val rep = new Replicator(spark, store("inc"))
    assert(rep.sinkWatermark("daily_summary", "dateKey").isEmpty)
    // first run: table created by the jdbc writer, all rows land
    assert(rep.replicate("daily_summary", src(3)) == 3)
    assert(rep.sinkWatermark("daily_summary").contains("2024-01-03"))
    // second run: only the 2 rows past the sink-side watermark append
    assert(rep.replicate("daily_summary", src(5)) == 2)
    val sink = readSink("inc", "daily_summary")
    assert(sink.count() == 5)
    assert(sink.columns.toSeq == Seq("dateKey", "appId", "totalAmount"))
    // re-run with no new data: nothing written (idempotent by date)
    assert(rep.replicate("daily_summary", src(5)) == 0)
    assert(readSink("inc", "daily_summary").count() == 5)
  }

  test("rebuild drops, re-creates with an identity PK, and reloads") {
    val rep = new Replicator(spark, store("reb"))
    assert(rep.replicate("daily_summary", src(5)) == 5)
    // rebuild: full replace + the reference's introspection PK
    // (snowflake_postgres_replicator.py:172) — id fills itself
    assert(rep.replicate("daily_summary", src(3), rebuild = true) == 3)
    val sink = readSink("reb", "daily_summary")
    assert(sink.count() == 3)
    assert(sink.columns.toSeq ==
      Seq("id", "dateKey", "appId", "totalAmount"))
    // the generated key is unique and non-null
    assert(sink.select($"id").distinct().count() == 3)
    assert(sink.filter($"id".isNull).count() == 0)
    // incremental resumes on top of the rebuilt table
    assert(rep.replicate("daily_summary", src(5)) == 2)
    assert(readSink("reb", "daily_summary").count() == 5)
  }

  test("sink-side repair deletes the tail; the next replicate refills it") {
    // the same repair contract through BOTH backends
    val parquetDir = Files.createTempDirectory("graft-serve-repair").toString
    val stores = Seq[(String, graft.sinks.ServingStore, () => DataFrame)](
      ("jdbc", store("repair"), () => readSink("repair", "daily_summary")),
      ("parquet", new graft.sinks.ParquetServingStore(spark, parquetDir),
        () => spark.read.parquet(s"$parquetDir/daily_summary")))
    for ((kind, st, read) <- stores) {
      val rep = new Replicator(spark, st)
      def served: Seq[String] =
        read().collect().map(_.mkString("|")).sorted.toSeq
      assert(rep.replicate("daily_summary", src(5)) == 5, kind)
      val full = served
      // repair from day 4: days 4-5 deleted, watermark recedes to day 3
      assert(rep.repair("daily_summary", LocalDate.parse("2024-01-04")), kind)
      assert(rep.sinkWatermark("daily_summary").contains("2024-01-03"), kind)
      // the next incremental replicate refills exactly the deleted tail
      assert(rep.replicate("daily_summary", src(5)) == 2, kind)
      assert(served == full, kind)
      // no-op cutoffs and missing tables report false (warehouse contract)
      assert(!rep.repair("daily_summary", LocalDate.parse("2024-02-01")), kind)
      assert(!rep.repair("never_served", LocalDate.parse("2024-01-01")), kind)
    }
  }

  test("per-column type overrides land in the database DDL on every path") {
    // the reference replicator's dtype-override dict
    // (snowflake_postgres_replicator.py:16-59, e.g. 'top10': JSON):
    // declared database types must land on first-append, create-empty
    // AND rebuild paths. Derby has no JSON type, so the spec proves the
    // mechanism with types whose metadata is assertable.
    val db = "types"
    val st = new JdbcServingStore(spark,
      s"jdbc:derby:memory:$db;create=true", jdbcOpts,
      typeOverrides = Map("daily_summary" -> Map(
        "totalAmount" -> "DECIMAL(12,2)", "note" -> "VARCHAR(123)")))
    def colTypes(table: String): Map[String, (String, Int, Int)] = {
      val c = java.sql.DriverManager.getConnection(
        s"jdbc:derby:memory:$db;create=true")
      try {
        val rs = c.getMetaData.getColumns(null, null, table.toUpperCase, null)
        val out = scala.collection.mutable.Map.empty[String, (String, Int, Int)]
        while (rs.next()) out(rs.getString("COLUMN_NAME")) =
          (rs.getString("TYPE_NAME"), rs.getInt("COLUMN_SIZE"),
            rs.getInt("DECIMAL_DIGITS"))
        rs.close(); out.toMap
      } finally c.close()
    }
    val rep = new Replicator(spark, st)
    val withNote = src(3).withColumn("note", concat(lit("d"), $"app_id"))
    // path 1: incremental first load (append creates the table)
    assert(rep.replicate("daily_summary", withNote) == 3)
    var t = colTypes("daily_summary")
    assert(t("totalAmount") == ("DECIMAL", 12, 2), t)
    assert(t("note") == ("VARCHAR", 123, 0), t)
    // un-overridden columns keep the default mapping
    assert(t("appId")._1 == "BIGINT", t)
    // path 2: rebuild (explicit CREATE with identity PK)
    assert(rep.replicate("daily_summary", withNote, rebuild = true) == 3)
    t = colTypes("daily_summary")
    assert(t("totalAmount") == ("DECIMAL", 12, 2), t)
    assert(t("note") == ("VARCHAR", 123, 0), t)
    assert(t.contains("id"), t)
    // path 3: create-empty (no rows yet, schema-bearing target)
    assert(rep.replicate("empty_t", withNote.limit(0)) == 0)
    assert(st.exists("empty_t"))
    // values round-trip through the overridden types
    assert(readSink(db, "daily_summary")
      .agg(sum($"totalAmount")).head().getDecimal(0).doubleValue() == 60.0)
  }

  test("DailyPipeline replicates the serving tables into Derby end-to-end") {
    val sfDir = "/root/testdata/sf0.001"
    def sources: String => DataFrame = {
      case "events" => graft.catalog.Tables.events(spark, sfDir)
      case other => graft.catalog.Tables.load(spark, sfDir, other)
    }
    val wh = Files.createTempDirectory("graft-jdbc-wh").toString
    val serving = Files.createTempDirectory("graft-jdbc-serve").toString
    val st = store("pipe")
    val p = new DailyPipeline(spark, wh, serving,
      LocalDate.parse("2024-02-05"), servingStore = Some(st))
    val r1 = p.run(sources)
    // every serving table exists IN THE DATABASE with the model's rows
    for (spec <- DailyPipeline.ServingTables) {
      assert(st.exists(spec.table), spec.table)
      assert(readSink("pipe", spec.table).count() ==
        p.runner.readModel(spec.model).count(), spec.table)
    }
    // spot-check two tables' serving-side shape through spark.read.jdbc
    val appSink = readSink("pipe", "dailySummaryApp")
    for (c <- Seq("date", "index", "name", "totalDailyTransactions"))
      assert(appSink.columns.contains(c), s"dailySummaryApp missing $c")
    assert(readSink("pipe", "kreSummary").columns.contains("dailyKinPayout"))
    // a second run finds the JDBC watermark and serves nothing new
    val r2 = p.run(sources)
    assert(r2.servedRows.values.forall(_ == 0), r2.servedRows.toString)
    assert(r1.servedRows("dailySummaryApp") ==
      readSink("pipe", "dailySummaryApp").count())
  }
}
