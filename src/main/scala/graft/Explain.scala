package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of one or more registered
  * queries — `runMain graft.Explain <sfDir> <query...>` (no args = all).
  * Plan-shape review is part of the operator workflow: confirm filters
  * reach the scan (PushedFilters), joins broadcast where intended,
  * window top-k gets WindowGroupLimit, and codegen spans stay wide. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n==== $n ====")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan)
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
