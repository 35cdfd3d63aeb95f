package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.StructType

/** Source / sink operators (SURVEY.md §2.1).
  *
  * The reference reads whole tables over JDBC (S1,
  * `helper_func.py:55-63`) or CSV-with-declared-schema from S3 (S2,
  * `helper_func.py:20-28`) and writes with JDBC append (S3,
  * `helper_func.py:36-45`). In the offline harness the scan analog is a
  * parquet scan over `/root/testdata/sf*` (TESTDATA.md); the JDBC/CSV
  * entry points are kept as first-class operators of the library.
  *
  * Scale note: parquet scans get vectorized reads, column pruning and
  * predicate pushdown from Catalyst for free; JDBC scans should always
  * be given `partitionColumn/lowerBound/upperBound/numPartitions` at
  * cluster scale so the read parallelizes — exposed here explicitly.
  */
object Tables {

  /** Parquet table scan — the harness-side analog of S1. */
  def parquet(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Named testdata accessors (TESTDATA.md schema).
  def orders(spark: SparkSession, dir: String): DataFrame    = parquet(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = parquet(spark, dir, "lineitem")
  def customer(spark: SparkSession, dir: String): DataFrame  = parquet(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame      = parquet(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame  = parquet(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame    = parquet(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = parquet(spark, dir, "region")
  /** events.parquet stores TIMESTAMP(NANOS); Spark reads it as long
    * only under `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench sessions). Convert ns→µs with integer division —
    * floor semantics, matching DuckDB's ns→µs truncation. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = parquet(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = parquet(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = parquet(spark, dir, "embeddings")

  /** S2: CSV scan with explicit schema + header
    * (ref `helper_func.py:20-28`). Schema is declared, never inferred —
    * inference is a full extra pass over the data at scale. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  /** JSON-lines scan with declared schema (source-format extension —
    * same declared-schema stance as S2: inference is a full extra
    * pass at scale, so the schema is always explicit). */
  def json(spark: SparkSession, path: String,
           schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S1: JDBC table scan (ref `helper_func.py:55-63`). `partitioning`
    * turns the single-connection read into a parallel range scan —
    * mandatory at scale, absent in the reference. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Map[String, String],
           partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    val withPart = partitioning.fold(withProps) { case (col, lo, hi, n) =>
      withProps.option("partitionColumn", col)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
    withPart.load()
  }

  /** S6: literal in-memory exchange-rate dimension
    * (ref `curated_tranformation.py:121-125`). 3 rows — Catalyst
    * broadcasts it below `autoBroadcastJoinThreshold` automatically. */
  def exchangeRates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("USD", 1.0), ("EUR", 1.1), ("INR", 0.012))
      .toDF("currency", "usd_rate")
  }

  /** S3: JDBC append sink (ref `helper_func.py:36-45`). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Map[String, String]): Unit = {
    val base = df.write.format("jdbc").mode(SaveMode.Append)
      .option("url", url).option("dbtable", table)
    props.foldLeft(base) { case (w, (k, v)) => w.option(k, v) }.save()
  }

  /** Parquet sink — harness analog of S3/S4. No `coalesce(1)` (the
    * reference's `helper_func.py:31` serializes the write; at 100 TB
    * that is the anti-pattern — writers stay partitioned). */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }
}
