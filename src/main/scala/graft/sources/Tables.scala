package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Testdata table loaders.
 *
 * The driver-generated parquet stores timestamps as INT64
 * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
 * (PARQUET_TYPE_ILLEGAL). We read them via the
 * `spark.sql.legacy.parquet.nanosAsLong` escape hatch (nanos surface as
 * LongType) and immediately normalize to microsecond TimestampType —
 * the same truncation DuckDB 1.x applies when it reads nano parquet, so
 * both engines see identical timestamps.
 */
object Tables {

  /** Known nano-timestamp columns per table (FIXTURES.md §B). */
  private val tsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  /** Every driver-generated testdata table (TESTDATA.md). */
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    tsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.schema.find(_.name == c) match {
        case Some(f) if f.dataType == LongType =>
          d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case _ => d
      }
    }
  }
}
