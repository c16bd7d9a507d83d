package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BucketOf, DaysOf, HiddenPartition, MonthsOf,
  PartitionTransform, TruncateOf, VersionedPartitioned}

/** Hidden partitioning over the manifest format: transform round-trip,
  * FILE-LEVEL pruning (inputFiles, not just result equality), source-
  * column transparency, and the bucket/monotone capability split. */
class HiddenPartitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def sampleDf() =
    (1 to 200).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(f"2024-03-${i % 20 + 1}%02d 10:00:${i % 60}%02d"),
        s"user${i % 7}")
    }.toDF("id", "ts", "name")

  private def partDirs(files: Array[String], prefix: String): Seq[String] =
    files.toSeq.flatMap(_.split("/").find(_.startsWith(prefix))).distinct.sorted

  test("days: range read prunes to the in-range day partitions") {
    val root = freshRoot("graft_hp_days_")
    HiddenPartition.promote(sampleDf(), root, DaysOf("ts"))
    val lo = lit("2024-03-05 00:00:00").cast("timestamp")
    val hi = lit("2024-03-08 23:59:59").cast("timestamp")
    val pruned = HiddenPartition.readRange(spark, root, lo, hi)
    val full = HiddenPartition.read(spark, root)
    // hidden: consumers see exactly the written columns
    assert(pruned.columns.toSeq == Seq("id", "ts", "name"))
    assert(full.columns.toSeq == Seq("id", "ts", "name"))
    // correctness: pruned read == full read + plain source filter
    val want = full.where(col("ts").between(lo, hi))
      .as[(Long, java.sql.Timestamp, String)].collect().sortBy(_._1)
    val got = pruned.as[(Long, java.sql.Timestamp, String)]
      .collect().sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // pruning is physical: only 4 of the 20 day dirs are planned
    assert(partDirs(full.inputFiles, "hp__days__ts=").size == 20)
    assert(partDirs(pruned.inputFiles, "hp__days__ts=") ==
      Seq("hp__days__ts=2024-03-05", "hp__days__ts=2024-03-06",
        "hp__days__ts=2024-03-07", "hp__days__ts=2024-03-08"))
  }

  test("bucket: point lookup plans exactly one hash partition") {
    val root = freshRoot("graft_hp_bucket_")
    HiddenPartition.promote(sampleDf(), root, BucketOf(8, "id"))
    val pruned = HiddenPartition.readEquals(spark, root, lit(42L))
    assert(partDirs(pruned.inputFiles, "hp__bucket8__id=").size == 1)
    assert(pruned.as[(Long, java.sql.Timestamp, String)].collect()
      .map(_._1).toSeq == Seq(42L))
    // a monotone-only capability is rejected on hash layouts
    val e = intercept[IllegalArgumentException](
      HiddenPartition.readRange(spark, root, lit(1L), lit(5L)))
    assert(e.getMessage.contains("bucket"))
  }

  test("truncate: prefix lookup prunes and keeps only exact matches") {
    val root = freshRoot("graft_hp_trunc_")
    HiddenPartition.promote(sampleDf(), root, TruncateOf(5, "name"))
    // all names share the "user" prefix but split on the 5th char
    val got = HiddenPartition.readEquals(spark, root, lit("user3"))
    assert(partDirs(got.inputFiles, "hp__trunc5__name=") ==
      Seq("hp__trunc5__name=user3"))
    assert(got.select("name").distinct().as[String].collect().toSeq ==
      Seq("user3"))
  }

  test("transform spec round-trips through the physical column name") {
    for (t <- Seq(DaysOf("ts"), MonthsOf("event_time"), BucketOf(16, "user_id"),
        TruncateOf(3, "code")))
      assert(PartitionTransform.parse(t.physCol) == t)
    intercept[IllegalArgumentException](PartitionTransform.parse("date"))
  }

  test("multi-member spec: time range and key bucket prune multiplicatively") {
    import graft.ops.{AnyValue, MemberEquals, MemberRange, MultiOf}
    val root = freshRoot("graft_hp_multi_")
    val t = MultiOf(Seq(DaysOf("ts"), BucketOf(4, "name")))
    HiddenPartition.promote(sampleDf(), root, t)
    assert(HiddenPartition.transformOf(spark, root) == t)
    val lo = lit("2024-03-05 00:00:00").cast("timestamp")
    val hi = lit("2024-03-06 23:59:59").cast("timestamp")
    val got = HiddenPartition.readMultiWhere(spark, root,
      Seq(MemberRange(lo, hi), MemberEquals(lit("user3"))))
    assert(got.columns.toSeq == Seq("id", "ts", "name"))
    val want = HiddenPartition.read(spark, root)
      .where(col("ts").between(lo, hi) && col("name") === "user3")
      .select("id").as[Long].collect().sorted.toSeq
    assert(want.nonEmpty &&
      got.select("id").as[Long].collect().sorted.toSeq == want)
    // pruning is multiplicative: 2 in-range days x 1 bucket value
    val pfx = t.physCol + "="
    val dirs = partDirs(got.inputFiles, pfx)
    assert(dirs.size <= 2, s"planned dirs: $dirs")
    assert(dirs.forall(d => d.startsWith(pfx + "2024-03-05") ||
      d.startsWith(pfx + "2024-03-06")), s"planned dirs: $dirs")
    // an unconstrained member keeps its dimension whole
    val byDayOnly = HiddenPartition.readMultiWhere(spark, root,
      Seq(MemberRange(lo, hi), AnyValue))
    assert(partDirs(byDayOnly.inputFiles, pfx).size > dirs.size)
    // arity is checked
    intercept[IllegalArgumentException](
      HiddenPartition.readMultiWhere(spark, root, Seq(AnyValue)))
  }

  test("multi-member spec: null member values keep their rows readable") {
    import graft.ops.{AnyValue, MemberEquals, MemberRange, MultiOf}
    val root = freshRoot("graft_hp_multinull_")
    val t = MultiOf(Seq(DaysOf("ts"), BucketOf(4, "name")))
    // 3 rows with a NULL bucket-member value: concat_ws would silently
    // drop the null part, shifting the composite value to 1 part and
    // readMultiWhere's arity check would then silently exclude the rows
    val withNulls = sampleDf().withColumn("name",
      when(col("id") <= 3, lit(null).cast("string")).otherwise(col("name")))
    HiddenPartition.promote(withNulls, root, t)
    val lo = lit("2024-03-01 00:00:00").cast("timestamp")
    val hi = lit("2024-03-20 23:59:59").cast("timestamp")
    // unconstrained member: null-name rows MUST come back
    val all = HiddenPartition.readMultiWhere(spark, root,
      Seq(MemberRange(lo, hi), AnyValue))
    assert(all.where(col("name").isNull).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(all.count() == 200)
    // constrained member: equality never matches the null rows
    val eq = HiddenPartition.readMultiWhere(spark, root,
      Seq(AnyValue, MemberEquals(lit("user3"))))
    assert(eq.where(col("name").isNull).isEmpty)
    // the sentinel is reserved: a data value colliding with it raises
    val bad = sampleDf().withColumn("name",
      when(col("id") === 1, lit("__null__")).otherwise(col("name")))
    val e = intercept[Exception](
      bad.select(MultiOf(Seq(DaysOf("ts"), TruncateOf(10, "name"))).expr)
        .collect())
    assert(e.getMessage.contains("reserved null sentinel") ||
      Option(e.getCause).exists(_.getMessage.contains("reserved null sentinel")))
  }

  test("bucket lookup literal is cast to the stored source-column type") {
    val root = freshRoot("graft_hp_buckcast_")
    HiddenPartition.promote(sampleDf(), root, BucketOf(8, "id"))
    // id is stored LONG; an INT literal hashes differently under
    // xxhash64 — without the schema cast this pruned to the wrong
    // bucket and returned zero rows
    assert(HiddenPartition.readEquals(spark, root, lit(42))
      .select("id").as[Long].collect().toSeq == Seq(42L))
  }

  test("streaming sink lands hidden-partitioned and prunes like batch") {
    val root = freshRoot("graft_hp_stream_")
    val in = s"$root/in"
    val df = sampleDf()
    df.write.parquet(in)
    val q = graft.pipeline.Streaming.hiddenPartitionedSink(
      spark.readStream.schema(df.schema).parquet(in),
      s"$root/t", s"$root/ckpt", DaysOf("ts"))
    q.awaitTermination()
    val table = HiddenPartition.read(spark, s"$root/t")
    assert(table.columns.toSeq == Seq("id", "ts", "name"))
    assert(table.count() == df.count())
    val pruned = HiddenPartition.readRange(spark, s"$root/t",
      lit("2024-03-05 00:00:00").cast("timestamp"),
      lit("2024-03-05 23:59:59").cast("timestamp"))
    assert(partDirs(pruned.inputFiles, "hp__days__ts=") ==
      Seq("hp__days__ts=2024-03-05"))
    // replay guard: restarting the finished stream re-commits nothing
    val v1 = VersionedPartitioned.currentVersion(spark, s"$root/t").get
    val q2 = graft.pipeline.Streaming.hiddenPartitionedSink(
      spark.readStream.schema(df.schema).parquet(in),
      s"$root/t", s"$root/ckpt", DaysOf("ts"))
    q2.awaitTermination()
    assert(VersionedPartitioned.currentVersion(spark, s"$root/t").get == v1)
  }

  test("SQL door: statement WHERE prunes a hidden table like the Scala read") {
    import graft.ops.{MemberEquals, MemberRange, MultiOf, SqlLifecycle}
    val root = java.nio.file.Files
      .createTempDirectory("graft_hp_sqlprune_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA hid")
    life.execute("""
      CREATE TABLE hid.ev (id BIGINT, ts TIMESTAMP, name STRING)
      USING ICEBERG PARTITIONED BY (days(ts), bucket(4, name))""")
    sampleDf().createOrReplaceTempView("hp_sqlprune_src")
    life.execute("INSERT INTO hid.ev SELECT * FROM hp_sqlprune_src")
    val routed = life.query("""
      SELECT * FROM hid.ev
      WHERE ts BETWEEN TIMESTAMP '2024-03-05 00:00:00'
                AND TIMESTAMP '2024-03-06 23:59:59'
        AND name = 'user3'""")
    val scalaPruned = HiddenPartition.readMultiWhere(spark,
      java.nio.file.Paths.get(root, "hid", "ev").toString, Seq(
        MemberRange(lit("2024-03-05 00:00:00").cast("timestamp"),
          lit("2024-03-06 23:59:59").cast("timestamp")),
        MemberEquals(lit("user3"))))
    // the routed statement plans the SAME partition dirs as the
    // member-wise pruned Scala read — the VERDICT r14 "SQL door reads
    // bypass pruning" gap, closed
    val pfx = MultiOf(Seq(DaysOf("ts"), BucketOf(4, "name"))).physCol + "="
    assert(partDirs(routed.inputFiles, pfx).nonEmpty)
    assert(partDirs(routed.inputFiles, pfx) ==
      partDirs(scalaPruned.inputFiles, pfx))
    // and returns the same rows
    assert(routed.select("id").as[Long].collect().sorted.toSeq ==
      scalaPruned.select("id").as[Long].collect().sorted.toSeq)
    assert(routed.select("id").as[Long].collect().nonEmpty)
    // hidden stays hidden through the pruned path too
    assert(routed.columns.toSeq == Seq("id", "ts", "name"))
  }

  test("SQL door: partition-equality statement prunes a plain table") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl_sqlprune_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA s")
    life.execute("""
      CREATE TABLE s.bars (date DATE, id BIGINT, px DOUBLE)
      USING ICEBERG PARTITIONED BY (date)""")
    (1 to 100).map(i => (java.sql.Date.valueOf(f"2024-03-${i % 10 + 1}%02d"),
        i.toLong, i * 1.5))
      .toDF("date", "id", "px").createOrReplaceTempView("pl_sqlprune_src")
    life.execute("INSERT INTO s.bars SELECT * FROM pl_sqlprune_src")
    val routed = life.query(
      "SELECT * FROM s.bars WHERE date = DATE '2024-03-05'")
    // exactly one of the ten day partitions enters the plan
    assert(partDirs(routed.inputFiles, "date=") == Seq("date=2024-03-05"))
    assert(routed.count() == 10)
    // a range prunes too, and an unfiltered read keeps every partition
    val ranged = life.query("SELECT * FROM s.bars " +
      "WHERE date >= DATE '2024-03-03' AND date < DATE '2024-03-05'")
    assert(partDirs(ranged.inputFiles, "date=") ==
      Seq("date=2024-03-03", "date=2024-03-04"))
    assert(partDirs(life.query("SELECT * FROM s.bars").inputFiles,
      "date=").size == 10)
    // a self-join narrows each scan INDEPENDENTLY (per-occurrence
    // views): the `a.date =` side plans exactly its one partition, the
    // unfiltered side keeps every row it needs — r15's shared view had
    // to stay whole whenever any scan was unconstrained
    val joined = life.query("""
      SELECT a.id FROM s.bars a
      JOIN s.bars b ON a.id = b.id
      WHERE a.date = DATE '2024-03-05'""")
    assert(joined.count() == 10)
    val sides = joined.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        partDirs(l.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles, "date=")
    }
    assert(sides.exists(_ == Seq("date=2024-03-05")), s"sides: $sides")
    assert(sides.exists(_.size == 10), s"sides: $sides")
  }

  test("SQL door: OR-of-partition-values and AS-OF reads prune too") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_or_sqlprune_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA s")
    life.execute("""
      CREATE TABLE s.bars (date DATE, id BIGINT, px DOUBLE)
      USING ICEBERG PARTITIONED BY (date)""")
    (1 to 100).map(i => (java.sql.Date.valueOf(f"2024-03-${i % 10 + 1}%02d"),
        i.toLong, i * 1.5))
      .toDF("date", "id", "px").createOrReplaceTempView("or_sqlprune_src")
    life.execute("INSERT INTO s.bars SELECT * FROM or_sqlprune_src")
    // a disjunction of partition values keeps exactly its branches
    val ored = life.query("""SELECT * FROM s.bars
      WHERE date = DATE '2024-03-02' OR date = DATE '2024-03-07'""")
    assert(partDirs(ored.inputFiles, "date=") ==
      Seq("date=2024-03-02", "date=2024-03-07"))
    assert(ored.count() == 20)
    // v2 rewrites one day; a FOR SYSTEM_VERSION AS OF 1 read with a
    // WHERE prunes the PINNED manifest (pre-rewrite rows come back)
    life.execute("DELETE FROM s.bars WHERE date = DATE '2024-03-05'")
    val travel = life.query("""
      SELECT * FROM s.bars FOR SYSTEM_VERSION AS OF 1
      WHERE date = DATE '2024-03-05'""")
    assert(partDirs(travel.inputFiles, "date=") == Seq("date=2024-03-05"))
    assert(travel.count() == 10)
    // the current view still sees the delete (and an impossible
    // predicate plans nothing)
    assert(life.query(
      "SELECT * FROM s.bars WHERE date = DATE '2024-03-05'").count() == 0)
  }

  test("SQL door: stats bounds skip FILES like the Scala readPruned") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_zr_sqlprune_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA z")
    life.execute("""
      CREATE TABLE z.fact (date DATE, id BIGINT, px DOUBLE)
      USING ICEBERG PARTITIONED BY (date)""")
    // promote straight into the cataloged dir with id-clustered small
    // files + [min,max] id stats — the z-order/readPruned layout
    val path = java.nio.file.Paths.get(root, "z", "fact").toString
    val df = (1 to 1000).map(i =>
        (java.sql.Date.valueOf(f"2024-03-${i % 4 + 1}%02d"), i.toLong, i * 1.5))
      .toDF("date", "id", "px")
    VersionedPartitioned.promote(df, path, "date",
      statsCols = Seq("id"), clusterBy = Seq("id"), maxRecordsPerFile = 50L)
    val routed = life.query(
      "SELECT * FROM z.fact WHERE id BETWEEN 100 AND 200")
    val scalaPruned = VersionedPartitioned
      .readPruned(spark, path, "id", 100L, 200L)
    // the routed statement scans exactly the files the Scala
    // stats-pruned read scans — a strict subset of the table
    assert(routed.inputFiles.sorted.toSeq ==
      scalaPruned.inputFiles.sorted.toSeq)
    assert(routed.inputFiles.length <
      VersionedPartitioned.read(spark, path).inputFiles.length)
    assert(routed.select("id").as[Long].collect().sorted.toSeq ==
      (100L to 200L).toSeq)
    // partition keep COMPOSES with the file skip: one day AND the id
    // range plans a subset of both prunes
    val both = life.query("""SELECT * FROM z.fact
      WHERE date = DATE '2024-03-01' AND id BETWEEN 100 AND 200""")
    assert(partDirs(both.inputFiles, "date=") == Seq("date=2024-03-01"))
    assert(both.inputFiles.length < routed.inputFiles.length)
    assert(both.select("id").as[Long].collect().sorted.toSeq ==
      (100L to 200L).filter(i => i % 4 + 1 == 1).toSeq)
  }

  test("bloom sidecars: point lookups skip files min/max cannot") {
    val root = freshRoot("graft_bloom_point_")
    // 3 date partitions × ~4 files each; doc = md5(id) is scattered, so
    // EVERY file's [min, max] doc range spans the hex space — range
    // stats keep everything, only the per-file bloom can discriminate
    val df = (1 to 4000).map(i =>
        (java.sql.Date.valueOf(f"2024-03-${i % 3 + 1}%02d"), i.toLong))
      .toDF("date", "id")
      .withColumn("doc", md5(col("id").cast("string")))
    VersionedPartitioned.promote(df, root, "date",
      clusterBy = Seq("id"), maxRecordsPerFile = 400,
      bloomCols = Seq("doc"))
    val target = df.where(col("id") === 500L)
      .select("doc").head().getString(0)
    val census = VersionedPartitioned.prunedFilesWhere(spark, root, Nil)
    assert(census.size >= 9) // multiple files per partition materialized
    // min/max alone keeps every file — the high-cardinality overlap
    val rangeOnly = VersionedPartitioned.prunedFilesWhere(spark, root,
      Seq(("doc", Some(target), Some(target))))
    assert(rangeOnly.size == census.size)
    // the bloom probe narrows to ~1 file (fpp may admit a stray file,
    // never lose the real one)
    val bloomed = VersionedPartitioned.prunedFilesWhere(spark, root,
      Nil, points = Seq(("doc", Seq(target))))
    assert(bloomed.nonEmpty && bloomed.size <= 2,
      s"bloom kept ${bloomed.size} of ${census.size} files")
    // correctness: the pruned read still finds the row, exactly
    val got = VersionedPartitioned.readPrunedWhere(spark, root, Nil,
        points = Seq(("doc", Seq(target))))
      .where(col("doc") === target)
    assert(got.select("id").as[Long].collect().toSeq == Seq(500L))
    // an IN list keeps the union of its members' files
    val other = df.where(col("id") === 2500L)
      .select("doc").head().getString(0)
    val pair = VersionedPartitioned.prunedFilesWhere(spark, root,
      Nil, points = Seq(("doc", Seq(target, other))))
    assert(pair.size >= 2 && pair.size <= 4)
    val both = VersionedPartitioned.readPrunedWhere(spark, root, Nil,
        points = Seq(("doc", Seq(target, other))))
      .where(col("doc").isin(target, other))
    assert(both.select("id").as[Long].collect().toSeq.sorted ==
      Seq(500L, 2500L))
    // PLANNING BUDGET: with the cap below the candidate fan-out, the
    // point columns degrade to min/max-only for the statement — the
    // answer is unchanged and no bloom blob reaches the driver
    spark.conf.set("spark.graft.bloom.maxProbeFiles", "2")
    try {
      val capped = VersionedPartitioned.prunedFilesWhere(spark, root,
        Nil, points = Seq(("doc", Seq(target))))
      assert(capped.size == census.size,
        "an over-budget probe must degrade to keep-all, never skip")
      val viaRead = VersionedPartitioned.readPrunedWhere(spark, root, Nil,
          points = Seq(("doc", Seq(target))))
        .where(col("doc") === target)
      assert(viaRead.select("id").as[Long].collect().toSeq == Seq(500L))
    } finally spark.conf.unset("spark.graft.bloom.maxProbeFiles")
  }

  test("SQL door: BLOOMFILTER INDEX point lookup skips files") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_sqlbloom_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA b")
    life.execute("""
      CREATE TABLE b.docs (day STRING, id BIGINT, doc STRING)
      USING ICEBERG PARTITIONED BY (day)""")
    life.execute("CREATE BLOOMFILTER INDEX ON TABLE b.docs FOR COLUMNS (doc)")
    (1 to 3000).map(i => (f"d${i % 3 + 1}%02d", i.toLong))
      .toDF("day", "id")
      .withColumn("doc", md5(col("id").cast("string")))
      .createOrReplaceTempView("sqlbloom_src")
    life.execute("INSERT INTO b.docs SELECT * FROM sqlbloom_src")
    val target = spark.table("sqlbloom_src")
      .where(col("id") === 500L).select("doc").head().getString(0)
    // no partition predicate: only the bloom can narrow — the routed
    // statement must touch ~1 of the 3 per-partition files
    val routed = life.query(
      s"SELECT id FROM b.docs WHERE doc = '$target'")
    assert(routed.as[Long].collect().toSeq == Seq(500L))
    assert(routed.inputFiles.length < 3,
      s"bloom kept ${routed.inputFiles.length} of 3 files")
    // min/max alone keeps everything (scattered md5): a RANGE statement
    // on doc shows the contrast — all 3 files scanned
    val ranged = life.query(
      s"SELECT count(*) AS n FROM b.docs WHERE doc >= '0' AND doc <= 'g'")
    assert(ranged.head().getLong(0) == 3000L)
    // DROP removes the meta entry; later inserts skip the bloom pass
    life.execute("DROP BLOOMFILTER INDEX ON TABLE b.docs")
    life.execute("INSERT INTO b.docs VALUES ('d04', 9001, 'zzz')")
    val after = life.query(
      s"SELECT id FROM b.docs WHERE doc = '$target'")
    assert(after.as[Long].collect().toSeq == Seq(500L))
    // HIDDEN partitioning composes: blooms on a data column skip files
    // inside hash-bucket partitions the transform cannot discriminate
    life.execute("""
      CREATE TABLE b.hdocs (id BIGINT, grp STRING, doc STRING)
      USING ICEBERG PARTITIONED BY (bucket(4, grp))""")
    life.execute("CREATE BLOOMFILTER INDEX ON TABLE b.hdocs FOR COLUMNS (doc)")
    (1 to 2000).map(i => (i.toLong, s"g${i % 40}"))
      .toDF("id", "grp")
      .withColumn("doc", md5(col("id").cast("string")))
      .createOrReplaceTempView("sqlbloom_hsrc")
    life.execute("INSERT INTO b.hdocs SELECT * FROM sqlbloom_hsrc")
    val htarget = spark.table("sqlbloom_hsrc")
      .where(col("id") === 700L).select("doc").head().getString(0)
    val hrouted = life.query(
      s"SELECT id FROM b.hdocs WHERE doc = '$htarget'")
    assert(hrouted.as[Long].collect().toSeq == Seq(700L))
    assert(hrouted.inputFiles.length < 4,
      s"hidden-table bloom kept ${hrouted.inputFiles.length} of 4 files")
  }

  test("SQL door: a join to a filtered dim prunes the fact (DPP shape)") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_dpp_sqlprune_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA s")
    life.execute("""
      CREATE TABLE s.fact (date DATE, id BIGINT, px DOUBLE)
      USING ICEBERG PARTITIONED BY (date)""")
    (1 to 100).map(i => (java.sql.Date.valueOf(f"2024-03-${i % 10 + 1}%02d"),
        i.toLong, i * 1.5))
      .toDF("date", "id", "px").createOrReplaceTempView("dpp_fact_src")
    life.execute("INSERT INTO s.fact SELECT * FROM dpp_fact_src")
    life.execute("CREATE TABLE s.dim (date DATE, flag STRING) USING ICEBERG")
    life.execute("INSERT INTO s.dim VALUES " +
      (1 to 10).map(d => s"(DATE '2024-03-${"%02d".format(d)}', " +
        s"'${if (d == 3 || d == 7) "x" else "y"}')").mkString(", "))
    // the filter sits on the DIM side only — the fact's partitions
    // prune to the dim-selected days via the join key (classic DPP)
    val routed = life.query("""
      SELECT f.id FROM s.fact f
      JOIN s.dim d ON f.date = d.date
      WHERE d.flag = 'x'""")
    assert(partDirs(routed.inputFiles, "date=") ==
      Seq("date=2024-03-03", "date=2024-03-07"))
    assert(routed.as[Long].collect().sorted.toSeq ==
      (1 to 100).filter(i => i % 10 + 1 == 3 || i % 10 + 1 == 7)
        .map(_.toLong).toSeq)
    // preserved side of an outer join must NOT prune: every fact row
    // survives a LEFT JOIN regardless of the dim filter
    val outer = life.query("""
      SELECT f.id FROM s.fact f
      LEFT JOIN (SELECT * FROM s.dim WHERE flag = 'x') d
        ON f.date = d.date""")
    assert(outer.count() == 100)
    assert(partDirs(outer.inputFiles, "date=").size == 10)
    // the IN-subquery spelling optimizes to a semi join — same prune
    val insub = life.query("""
      SELECT id FROM s.fact
      WHERE date IN (SELECT date FROM s.dim WHERE flag = 'x')""")
    assert(partDirs(insub.inputFiles, "date=") ==
      Seq("date=2024-03-03", "date=2024-03-07"))
    assert(insub.count() == 20)
    // kill switch honored
    spark.conf.set("spark.graft.dpp.enabled", "false")
    try {
      val off = life.query("""
        SELECT f.id FROM s.fact f
        JOIN s.dim d ON f.date = d.date
        WHERE d.flag = 'x'""")
      assert(partDirs(off.inputFiles, "date=").size == 10)
    } finally spark.conf.unset("spark.graft.dpp.enabled")
  }

  test("SQL door: DPP probe runs once across identical routed statements") {
    import graft.ops.{ScanPrune, SqlLifecycle}
    val root = java.nio.file.Files
      .createTempDirectory("graft_dpp_cache_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA s")
    life.execute("""
      CREATE TABLE s.fact (date DATE, id BIGINT)
      USING ICEBERG PARTITIONED BY (date)""")
    (1 to 60).map(i => (java.sql.Date.valueOf(f"2024-05-${i % 6 + 1}%02d"),
        i.toLong))
      .toDF("date", "id").createOrReplaceTempView("dpp_cache_src")
    life.execute("INSERT INTO s.fact SELECT * FROM dpp_cache_src")
    life.execute("CREATE TABLE s.dim (date DATE, flag STRING) USING ICEBERG")
    life.execute("INSERT INTO s.dim VALUES " +
      (1 to 6).map(d => s"(DATE '2024-05-${"%02d".format(d)}', " +
        s"'${if (d == 2) "x" else "y"}')").mkString(", "))
    val stmt = """
      SELECT f.id FROM s.fact f
      JOIN s.dim d ON f.date = d.date
      WHERE d.flag = 'x'"""
    val r1 = life.query(stmt)
    assert(partDirs(r1.inputFiles, "date=") == Seq("date=2024-05-02"))
    val after1 = ScanPrune.probeRuns.get()
    // a dashboard replaying the same statement: same prune, NO new
    // probe job — the key probe result is served from the cache
    val r2 = life.query(stmt)
    assert(partDirs(r2.inputFiles, "date=") == Seq("date=2024-05-02"))
    assert(ScanPrune.probeRuns.get() == after1,
      "identical statement re-ran the dim probe")
    // the dim ADVANCING invalidates by construction (new snapshot
    // paths): the re-probe sees the new keys and the prune follows
    life.execute("INSERT INTO s.dim VALUES (DATE '2024-05-05', 'x')")
    val r3 = life.query(stmt)
    assert(partDirs(r3.inputFiles, "date=") ==
      Seq("date=2024-05-02", "date=2024-05-05"))
    assert(ScanPrune.probeRuns.get() > after1, "dim advance must re-probe")
  }

  test("SQL door: DPP bails on LIMIT/Window between leaf and join") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_dpp_limit_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA s")
    life.execute("""
      CREATE TABLE s.fact (date DATE, id BIGINT, px DOUBLE)
      USING ICEBERG PARTITIONED BY (date)""")
    (1 to 100).map(i => (java.sql.Date.valueOf(f"2024-03-${i % 10 + 1}%02d"),
        i.toLong, i * 1.5))
      .toDF("date", "id", "px").createOrReplaceTempView("dpp_limit_src")
    life.execute("INSERT INTO s.fact SELECT * FROM dpp_limit_src")
    life.execute("CREATE TABLE s.dim (date DATE, flag STRING) USING ICEBERG")
    life.execute("INSERT INTO s.dim VALUES " +
      (1 to 10).map(d => s"(DATE '2024-03-${"%02d".format(d)}', " +
        s"'${if (d == 3 || d == 7) "x" else "y"}')").mkString(", "))
    // a LIMIT between the fact leaf and the join: the 10 globally-
    // lowest ids must be picked BEFORE the dim filter applies — a
    // pre-limit prune would pick a different (flag-x-only) 10 and
    // return 10 rows instead of 2
    val limited = life.query("""
      SELECT f.id FROM (SELECT * FROM s.fact ORDER BY id LIMIT 10) f
      JOIN s.dim d ON f.date = d.date
      WHERE d.flag = 'x'""")
    assert(partDirs(limited.inputFiles, "date=").size == 10,
      "pre-limit DPP prune is illegal: all partitions must scan")
    assert(limited.as[Long].collect().sorted.toSeq == Seq(2L, 6L))
    // a window function between leaf and join: row_number over the
    // FULL table must number all 100 rows before the dim filter
    val windowed = life.query("""
      SELECT f.id, f.rn FROM (
        SELECT date, id, row_number() OVER (ORDER BY id) AS rn
        FROM s.fact) f
      JOIN s.dim d ON f.date = d.date
      WHERE d.flag = 'x' AND f.rn <= 10""")
    assert(partDirs(windowed.inputFiles, "date=").size == 10,
      "pre-window DPP prune is illegal: all partitions must scan")
    assert(windowed.select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 6L))
    // plain Filter/Project chains still prune — the legality walk must
    // not regress the classic shape
    val plain = life.query("""
      SELECT f.id FROM (SELECT date, id FROM s.fact WHERE px > 0) f
      JOIN s.dim d ON f.date = d.date
      WHERE d.flag = 'x'""")
    assert(partDirs(plain.inputFiles, "date=") ==
      Seq("date=2024-03-03", "date=2024-03-07"))
  }

  test("SQL door: DPP key-count cap detects truncation despite nulls") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_dpp_nullcap_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA s")
    life.execute("""
      CREATE TABLE s.fact (date DATE, id BIGINT)
      USING ICEBERG PARTITIONED BY (date)""")
    (1 to 40).map(i => (java.sql.Date.valueOf(f"2024-04-${i % 4 + 1}%02d"),
        i.toLong))
      .toDF("date", "id").createOrReplaceTempView("dpp_null_src")
    life.execute("INSERT INTO s.fact SELECT * FROM dpp_null_src")
    life.execute("CREATE TABLE s.dim (date DATE, flag STRING) USING ICEBERG")
    // 3 distinct non-null keys + a NULL key; with maxKeys=2 the key
    // set is truncated and the prune MUST be abandoned — a sampled
    // null shrinking the post-filter count under the cap would prune
    // date 2024-04-03 away and lose its rows
    life.execute("""INSERT INTO s.dim VALUES
      (DATE '2024-04-01', 'x'), (DATE '2024-04-02', 'x'),
      (DATE '2024-04-03', 'x'), (NULL, 'x')""")
    spark.conf.set("spark.graft.dpp.maxKeys", "2")
    try {
      val routed = life.query("""
        SELECT f.id FROM s.fact f
        JOIN s.dim d ON f.date = d.date
        WHERE d.flag = 'x'""")
      assert(routed.count() == 30,
        "truncated key set must abandon the prune, not drop date 03")
      assert(partDirs(routed.inputFiles, "date=").size == 4)
    } finally spark.conf.unset("spark.graft.dpp.maxKeys")
  }

  test("SQL door: DPP prunes hidden BUCKET partitions via the join key") {
    import graft.ops.SqlLifecycle
    val root = java.nio.file.Files
      .createTempDirectory("graft_dpp_hidden_").toString
    val life = new SqlLifecycle(spark, root)
    life.execute("CREATE SCHEMA h")
    life.execute("""
      CREATE TABLE h.ev (id BIGINT, ts TIMESTAMP, name STRING)
      USING ICEBERG PARTITIONED BY (bucket(4, name))""")
    sampleDf().createOrReplaceTempView("dpp_hidden_src")
    life.execute("INSERT INTO h.ev SELECT * FROM dpp_hidden_src")
    life.execute("CREATE TABLE h.dim (name STRING, flag STRING) USING ICEBERG")
    life.execute("INSERT INTO h.dim VALUES " + (0 to 6)
      .map(i => s"('user$i', '${if (i == 3) "x" else "y"}')").mkString(", "))
    // the filter sits on the dim; the fact's HASH partitions prune to
    // the flagged names' buckets — join-derived keys flow through the
    // same transform lookup literal equality uses
    val routed = life.query("""
      SELECT e.id FROM h.ev e
      JOIN h.dim d ON e.name = d.name
      WHERE d.flag = 'x'""")
    val pfx = "hp__bucket4__name="
    val scalaPruned = HiddenPartition.readEquals(spark,
      java.nio.file.Paths.get(root, "h", "ev").toString, lit("user3"))
    assert(partDirs(routed.inputFiles, pfx) ==
      partDirs(scalaPruned.inputFiles, pfx))
    assert(partDirs(routed.inputFiles, pfx).size == 1)
    assert(routed.as[Long].collect().sorted.toSeq ==
      (1 to 200).filter(_ % 7 == 3).map(_.toLong).toSeq)
  }

  test("hidden tables keep the plain-format capabilities (time travel)") {
    val root = freshRoot("graft_hp_tt_")
    val df = sampleDf()
    HiddenPartition.promote(df, root, DaysOf("ts"))
    val v1 = VersionedPartitioned.currentVersion(spark, root).get
    // rewrite one day's rows with shifted ids; old version unaffected
    HiddenPartition.promote(
      df.where(date_format(col("ts"), "yyyy-MM-dd") === "2024-03-05")
        .withColumn("id", col("id") + 1000L), root, DaysOf("ts"))
    val t = HiddenPartition.transformOf(spark, root)
    assert(t == DaysOf("ts"))
    val now = HiddenPartition.read(spark, root)
    assert(now.where(col("id") > 1000L).count() > 0)
    assert(VersionedPartitioned.readAt(spark, root, v1)
      .where(col("id") > 1000L).count() == 0)
  }
}
