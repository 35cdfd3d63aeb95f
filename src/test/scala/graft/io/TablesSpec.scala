package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("S2: CSV scan with declared schema + header roundtrips (S4 sink)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq(
      (1, 10, 100, "31/01/2024", "31/01/2024", "02/02/2024",
        BigDecimal("200.00"), "USD", "confirmed"))
      .toDF("booking_id", "user_id", "apartment_id", "booking_date",
        "checkin_date", "checkout_date", "total_price", "currency",
        "booking_status")
    // S4: single-file CSV sink (reference helper_func.py:30-33 shape)
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$dir/bookings")
    val back = Tables.csv(spark, s"$dir/bookings", Schemas.bookings)
    assert(back.count() == 1)
    val r = back.head()
    assert(r.getAs[Int]("booking_id") == 1)
    assert(r.getAs[String]("booking_date") == "31/01/2024")
    assert(r.getAs[java.math.BigDecimal]("total_price")
      .compareTo(new java.math.BigDecimal("200.00")) == 0)
    assert(back.schema("total_price").dataType.typeName == "decimal(7,2)")
  }

  test("exchangeRates literal dim has the reference rows") {
    val rows = Tables.exchangeRates(spark).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows == Map("USD" -> 1.0, "EUR" -> 1.1, "INR" -> 0.012))
  }

  test("JSON-lines scan with declared schema roundtrips") {
    val dir = Files.createTempDirectory("graft_json").toString
    val df = Seq((1L, "view", 2.5), (2L, "purchase", 9.0))
      .toDF("event_id", "event_type", "value")
    df.write.mode("overwrite").json(s"$dir/events")
    val back = Tables.json(spark, s"$dir/events", df.schema)
    // declared, not inferred (JSON reads are always nullable, so
    // compare names + types)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "view", 2.5), (2L, "purchase", 9.0)))
  }

  test("S3→S1: JDBC append sink + partitioned scan roundtrip (embedded Derby)") {
    // Spark ships the Derby embedded driver (it backs the Hive
    // metastore), so the JDBC source/sink pair gets a real runtime
    // check — the same Tables.writeJdbc / Tables.jdbc entry points a
    // warehouse deployment would call, minus only the network.
    System.setProperty("derby.stream.error.file",
      Files.createTempDirectory("graft_derby_log").toString + "/derby.log")
    val db = Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val df = spark.range(1, 101).select(
      col("id"), concat(lit("name_"), col("id")).as("name"),
      (col("id") * 1.5).as("score"))
    Tables.writeJdbc(df, url, "bookings_sink", props)          // creates
    Tables.writeJdbc(df.filter(col("id") <= 10), url,          // appends
      "bookings_sink", props)
    val back = Tables.jdbc(spark, url, "bookings_sink", props,
      partitioning = Some(("id", 1L, 101L, 4)))
    // the partitioned read really is a 4-way parallel range scan
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 110)
    val byId = back.groupBy("id").count()
    assert(byId.filter(col("count") === 2).count() == 10)   // appended ids
    val r = back.filter(col("id") === 7).orderBy("id").head()
    assert(r.getAs[String]("name") == "name_7")
    assert(r.getAs[Double]("score") == 10.5)
  }

  test("writeParquet partitions by the given columns") {
    val dir = Files.createTempDirectory("graft_pq").toString
    val df = Seq((1, "2024-01"), (2, "2024-02")).toDF("id", "month")
    Tables.writeParquet(df, s"$dir/t", partitionBy = Seq("month"))
    val subdirs = new java.io.File(s"$dir/t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == Seq("month=2024-01", "month=2024-02"))
    assert(spark.read.parquet(s"$dir/t").count() == 2)
  }
}
