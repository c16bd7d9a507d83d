package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Shards, TextOps}
import graft.ops.{Funnel, Retention}

/** Event-behavior (funnel, retention) and corpus-curation (shuffle order,
  * scrub, vocab) operator semantics on hand-built fixtures. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, Long)*) =
    rows.toSeq.map { case (u, t, ty, id) => (u, ts(t), ty, id) }
      .toDF("user_id", "ts", "event_type", "event_id")

  // ----------------------------------------------------------- funnel —

  test("Funnel: steps count only in order, strictly after the previous") {
    val in = events(
      // user 1: full in-order journey
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:05:00", "click", 2L),
      (1L, "2024-01-01 10:10:00", "purchase", 3L),
      // user 2: purchase BEFORE click — must not count as step 3
      (2L, "2024-01-01 10:00:00", "view", 4L),
      (2L, "2024-01-01 10:01:00", "purchase", 5L),
      (2L, "2024-01-01 10:02:00", "click", 6L),
      // user 3: click with no prior view — reaches no step beyond none
      (3L, "2024-01-01 10:00:00", "click", 7L),
      // user 4: view only
      (4L, "2024-01-01 09:00:00", "view", 8L))
    val got = Funnel.conversion(in, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "event_id")
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("Funnel: a later re-occurrence completes a step the first miss skipped") {
    // view@2 comes after click@1, so click@1 can't complete step 2 — but
    // click@3 can; the greedy earliest-completion chain must pick it up.
    val in = events(
      (1L, "2024-01-01 10:01:00", "click", 1L),
      (1L, "2024-01-01 10:02:00", "view", 2L),
      (1L, "2024-01-01 10:03:00", "click", 3L),
      (1L, "2024-01-01 10:04:00", "purchase", 4L))
    val per = Funnel.completionTimes(in, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), "event_id").collect()(0)
    assert(per.getTimestamp(1) == ts("2024-01-01 10:02:00"))
    assert(per.getTimestamp(2) == ts("2024-01-01 10:03:00"))
    assert(per.getTimestamp(3) == ts("2024-01-01 10:04:00"))
  }

  test("Funnel: counts are monotone non-increasing on real events") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val n = Funnel.conversion(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "event_id")
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(n.size == 3 && n(0) >= n(1) && n(1) >= n(2) && n(0) > 0)
  }

  // -------------------------------------------------------- retention —

  test("Retention.cohorts: offsets, sizes and ratios from first-seen day") {
    val in = events(
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-02 10:00:00", "view", 2L),
      (1L, "2024-01-02 11:00:00", "click", 3L), // same day — one active day
      (2L, "2024-01-01 10:00:00", "view", 4L),
      (3L, "2024-01-02 10:00:00", "view", 5L))
    val got = Retention.cohorts(in, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .select("cohort_day", "day_offset", "n_users", "cohort_size", "retention")
      .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSeq
    assert(got.map { case (c, o, n, s, r) => (c.toString, o, n, s, r) } == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0)))
  }

  // ---------------------------------------------------- shuffle order —

  test("Shards.shuffleOrder is the global md5 rank (vs single-window replay)") {
    val in = (0L until 500L).toDF("id")
    val got = Shards.shuffleOrder(in, "id", "seedA")
    // a dense permutation of 1..n …
    val pos = got.select("pos").as[Long].collect().sorted
    assert(pos.toSeq == (1L to 500L))
    // … equal to the naive global-sort row_number
    val key = md5(concat($"id".cast("string"), lit(":seedA")))
    val naive = in.withColumn("pos",
      row_number().over(Window.orderBy(key, $"id")).cast("long"))
    assert(got.select("id", "pos").except(naive.select("id", "pos")).isEmpty)
    // different seed ⇒ different permutation (overwhelmingly)
    val other = Shards.shuffleOrder(in, "id", "seedB")
    assert(got.select("id", "pos").except(other.select("id", "pos")).count() > 0)
  }

  // ------------------------------------------------------- text utils —

  test("TextOps.maskPattern masks spans and counts them") {
    val in = Seq((1L, "call 555 or 911 now"), (2L, "no digits here"))
      .toDF("id", "text")
    val got = TextOps.maskPattern(in, "text", "[0-9]+", "#")
      .select("id", "scrubbed", "n_masked")
      .as[(Long, String, Int)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "call # or # now", 2), (2L, "no digits here", 0)))
  }

  test("TextOps.vocabStats counts tokens, types and hapaxes per group") {
    val in = Seq(("en", "the cat the dog"), ("en", "the bird"),
        ("fr", "le le chat")).toDF("lang", "text")
    val got = TextOps.vocabStats(in, "text", Seq("lang"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // en: tokens=6 (the×3, cat, dog, bird), types=4, hapax=3, ttr=4/6
    // fr: tokens=3 (le×2, chat), types=2, hapax=1, ttr=2/3
    assert(got == Seq(("en", 6L, 4L, 3L, 0.6667), ("fr", 3L, 2L, 1L, 0.6667)))
  }
}
