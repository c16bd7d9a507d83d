package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg
import graft.ops.Profile

/** Typed Aggregator and approximate-profile behavior. */
class AggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val topk5 = udaf(new TopKAgg(5),
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))

  test("TopKAgg equals the window top-k, ties broken by id, partitioning-independent") {
    // deterministic pseudo-random data with intentional score ties
    val rows = (1L to 500L).map { id =>
      (s"g${id % 3}", ((id * 37) % 11).toDouble, id)
    }
    val df = rows.toDF("grp", "score", "id").repartition(7) // force merges
    val got = df.groupBy("grp")
      .agg(topk5(col("score"), col("id")).as("ids"))
      .select(col("grp"), posexplode(col("ids")).as(Seq("pos", "id")))
      .select(col("grp"), (col("pos") + 1).as("rank"), col("id"))
    val w = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id"))
    val expected = df
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .select(col("grp"), col("rank").cast("long"), col("id"))
    assert(got.orderBy("grp", "rank").collect().toSeq ==
      expected.orderBy("grp", "rank").collect().toSeq)
  }

  test("TopKAgg with k larger than the group returns every row, sorted") {
    val df = Seq(("g", 2.0, 1L), ("g", 9.0, 2L), ("g", 5.0, 3L))
      .toDF("grp", "score", "id")
    val ids = df.groupBy("grp")
      .agg(topk5(col("score"), col("id")).as("ids"))
      .select("ids").as[Seq[Long]].head()
    assert(ids == Seq(2L, 3L, 1L))
  }

  test("Profile.numericApprox matches exact profile except HLL distinct within tolerance") {
    val df = TestData.lineitem(spark)
    val cols = Seq("l_quantity", "l_extendedprice")
    def keyed(rows: Array[Row]) =
      rows.map(r => r.getString(0) -> r).toMap
    val exact = keyed(Profile.numeric(df, cols).collect())
    val approx = keyed(Profile.numericApprox(df, cols, rsd = 0.02).collect())
    cols.foreach { c =>
      val e = exact(c); val a = approx(c)
      // everything but n_distinct is computed identically
      Seq(1, 2, 4, 5, 6).foreach(i => assert(a.get(i) == e.get(i), s"$c field $i"))
      val eDist = e.getLong(3).toDouble
      assert(math.abs(a.getLong(3) - eDist) <= math.max(eDist * 0.10, 2.0),
        s"$c approx distinct ${a.getLong(3)} vs exact $eDist")
    }
  }
}

/** Tiny shared loader for specs that want real testdata shapes. */
object TestData {
  def lineitem(spark: org.apache.spark.sql.SparkSession) =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
}
