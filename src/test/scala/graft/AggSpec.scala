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

  test("Clustering.kmeans: hand-computed two-round Lloyd on separable points") {
    import graft.ext.Clustering
    // two tight groups; stride-2 init seeds centroids from ids 0 (at 0.0)
    // and 2 (at 10.0); round 1 assigns {0,1} / {2,3}; the update moves
    // centroids to the group means; round 2 keeps the same assignment
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(10.0, 0.0)), (3L, Array(11.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeans(pts, "vec_id", "embedding",
        centroidStride = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L)))
  }

  test("Clustering.kmeans: distance ties break to the lower centroid id, updates shift cells") {
    import graft.ext.Clustering
    // stride 2 seeds THREE centroids: ids 0 (0.0), 2 (6.0), 4 (7.0).
    // Round 1: p5=3.0 is equidistant from seeds 0.0 and 6.0 (d²=9) →
    // lower centroid id wins → cluster 0; p3=4.0 → cluster 2 (d²=4).
    // Update: c0 → mean(0,1,3)=4/3, c2 → mean(6,4)=5, c4 → 7.
    // Round 2: p2=6.0 is now equidistant from c2=5 and c4=7 (d²=1) →
    // stays cluster 2 by the same tie rule; no other point moves.
    val pts = Seq(
      (0L, Array(0.0)), (1L, Array(1.0)), (2L, Array(6.0)),
      (3L, Array(4.0)), (4L, Array(7.0)), (5L, Array(3.0)))
      .toDF("vec_id", "embedding")
    val expected = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L),
      (4L, 4L), (5L, 0L))
    val r1 = Clustering.kmeans(pts, "vec_id", "embedding", 2, iters = 1)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val r2 = Clustering.kmeans(pts, "vec_id", "embedding", 2, iters = 2)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(r1 == expected)
    assert(r2 == expected)
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
