package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * SQL LIFECYCLE front door. The reference pipeline's entire interface
 * is raw SQL statement texts — including the table lifecycle: CREATE
 * SCHEMA (reference `dags/dag.py:119`), CREATE TABLE ... USING ICEBERG
 * PARTITIONED BY (`dags/dag.py:130-148`), CREATE OR REPLACE TABLE
 * staging (`dags/dag.py:158-175`), partition-targeted DELETE FROM
 * (`dags/dag.py:292-296,368-371`), INSERT INTO ... SELECT / VALUES
 * (`dags/dag.py:89-104,307-311,385-437`), DROP TABLE IF EXISTS
 * (`dags/dag.py:322-325`). The SELECT side of that interface went
 * through `spark.sql` since round 11 (the `sql_*` shared-bytes gates);
 * this router closes the remaining gap: a user can paste the
 * reference's DDL/DML statement texts and run them against the
 * manifest table format.
 *
 * Routing, verb by verb:
 *  - CREATE SCHEMA → a directory namespace under the catalog root.
 *  - CREATE TABLE (+ PARTITIONED BY) → catalog entry (schema parsed by
 *    Spark's own DDL parser, so every Spark type incl. nested
 *    ARRAY<DECIMAL(10,2)> round-trips); partitioned tables live on
 *    `VersionedPartitioned` manifests (snapshot isolation, time
 *    travel), unpartitioned staging tables on a plain parquet dir with
 *    atomic swap (`Exchange.swapTable`) — transient by design, like
 *    the reference's per-ds staging.
 *  - INSERT INTO t <query> / VALUES → run the body through the query
 *    door, conform to the declared schema (BY NAME when the source
 *    column names match the target's, else positionally with an arity
 *    check — the schema-checked resolution of reference bug #6,
 *    SURVEY §2.14), cast column-by-column to the DDL types (the
 *    reference's implicit cast-on-INSERT into DECIMAL), and append.
 *    Partitioned-table appends rewrite ONLY the partitions present in
 *    the new rows (read-back union → promote), so a daily INSERT costs
 *    O(day), never O(table).
 *  - DELETE FROM t WHERE col = DATE '...' → partition-targeted
 *    `VersionedPartitioned.deleteWhere` (copy-on-write of the affected
 *    partition only). Arbitrary predicates are deliberately out of
 *    scope here — `deleteWhere`/`deleteRowsMergeOnRead` take any
 *    Column predicate via the Scala API.
 *  - DROP TABLE → removes data and catalog entry.
 *  - anything else → `spark.sql` passthrough with every cataloged
 *    table registered as a temp view (qualified names rewritten to
 *    view-safe ones, longest-first, so `jakebuto.daily_stock_prices`
 *    in the reference text resolves).
 *
 * Catalog metadata (`_graft_table.meta`: DDL string + partition
 * column) lives inside each table directory, so a second session's
 * router resolves existing tables with no shared driver state.
 *
 * `-- comments` are stripped before matching (the reference texts are
 * comment-heavy). Statement matching is case-insensitive on keywords.
 */
class SqlLifecycle(val spark: SparkSession, val root: String) {
  import SqlLifecycle._

  /** Execute one statement text. Query statements return Some(result);
    * lifecycle verbs return None. */
  def execute(sqlText: String): Option[DataFrame] = {
    val s = stripComments(sqlText).trim
    s match {
      case CreateSchemaRe(name) =>
        java.nio.file.Files.createDirectories(schemaDir(name)); None
      case CreateTableRe(orReplace, ifNotExists, name, colsBlock, partBy) =>
        createTable(name.toLowerCase, colsBlock,
          Option(partBy).map(_.trim.toLowerCase),
          orReplace = orReplace != null, ifNotExists = ifNotExists != null)
        None
      case DeletePartRe(name, colName, d) =>
        deletePartition(name.toLowerCase, colName.toLowerCase, d); None
      case InsertRe(name, body) =>
        insert(name.toLowerCase, body); None
      case DropTableRe(name) =>
        dropTable(name.toLowerCase); None
      case _ => Some(query(s))
    }
  }

  /** The query door: `spark.sql` over the cataloged tables (each
    * registered as a temp view under its view-safe name), with
    * Iceberg's time-travel SQL sugar resolved first: `t VERSION AS OF
    * n` and `t TIMESTAMP AS OF '<ts>'` on a cataloged partitioned
    * table register a pinned-history view over the existing
    * `readAt`/`readAsOf` machinery (manifest resolution is O(1) in
    * table depth either way; `README.md:76` of the reference names the
    * capability). Timestamps accept `yyyy-MM-dd HH:mm:ss[.SSS]` or
    * ISO-8601 instants, interpreted in the session UTC. */
  def query(sel: String): DataFrame = {
    registerViews()
    val withTravel = resolveAsOf(sel)
    spark.sql(rewriteNames(withTravel))
  }

  private def resolveAsOf(sel: String): String = {
    def pinned(tableName: String, suffix: String,
        read: (String, TableMeta) => DataFrame): Option[String] = {
      val t = tableName.toLowerCase
      metaOf(t).filter(_.partitionCol.isDefined).map { meta =>
        val vn = viewName(t) + suffix
        read(tableDir(t).toString, meta)
          .select(meta.schema.fieldNames.map(c => col(s"`$c`")): _*)
          .createOrReplaceTempView(vn)
        vn
      }
    }
    val s1 = VersionAsOfRe.replaceAllIn(sel, m =>
      scala.util.matching.Regex.quoteReplacement(
        pinned(m.group(1), "__v" + m.group(2), (p, _) =>
          VersionedPartitioned.readAt(spark, p, m.group(2).toLong))
          .getOrElse(m.matched)))
    TimestampAsOfRe.replaceAllIn(s1, m => {
      val raw = m.group(2)
      val ms =
        try java.time.Instant.parse(raw).toEpochMilli
        catch { case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli }
      scala.util.matching.Regex.quoteReplacement(
        pinned(m.group(1), "__ts" + ms, (p, _) =>
          VersionedPartitioned.readAsOf(spark, p, ms))
          .getOrElse(m.matched))
    })
  }

  /** Current contents of a cataloged table. */
  def table(name: String): DataFrame = {
    val n = name.toLowerCase
    readTable(n, metaOf(n).getOrElse(
      throw new IllegalArgumentException(s"table $n does not exist")))
  }

  /** Cataloged table names (lowercase `schema.table`). */
  def tables(): Seq[String] = {
    val rootDir = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(rootDir)) return Nil
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(rootDir).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .flatMap { sd =>
        java.nio.file.Files.list(sd).iterator().asScala
          .filter(td => java.nio.file.Files.exists(td.resolve(MetaFile)))
          .map(td => s"${sd.getFileName}.${td.getFileName}")
      }.toSeq.sorted
  }

  // ------------------------------------------------------------ verbs —

  private def createTable(name: String, colsBlock: String,
      partBy: Option[String], orReplace: Boolean,
      ifNotExists: Boolean): Unit = {
    val exists = metaOf(name).isDefined
    if (exists && ifNotExists) return
    if (exists && !orReplace)
      throw new IllegalArgumentException(s"table $name already exists " +
        "(use CREATE OR REPLACE TABLE or IF NOT EXISTS)")
    if (exists) dropTable(name)
    val schema = StructType.fromDDL(colsBlock)
    partBy.foreach { p =>
      require(schema.fieldNames.map(_.toLowerCase).contains(p),
        s"PARTITIONED BY ($p): no such column in the DDL")
    }
    val dir = tableDir(name)
    java.nio.file.Files.createDirectories(dir)
    val meta = TableMeta(schema, partBy)
    java.nio.file.Files.write(dir.resolve(MetaFile),
      meta.render.getBytes("UTF-8"))
  }

  private def insert(name: String, body: String): Unit = {
    val meta = metaOf(name).getOrElse(
      throw new IllegalArgumentException(s"INSERT INTO $name: no such table"))
    // body = optional (col, ...) column list, then VALUES ... or a query
    val (colList, rest) = body.trim match {
      case ColListRe(cols, r) =>
        (Some(cols.split(",").map(_.trim.toLowerCase).toSeq), r)
      case r => (None, r)
    }
    val src0 =
      if (rest.trim.toUpperCase.startsWith("VALUES"))
        query(s"SELECT * FROM (${rest.trim}) AS __v")
      else query(rest)
    // explicit column list: positional tuple/query columns take the
    // listed names; unnamed → conform below decides by name vs position
    val src = colList match {
      case Some(cols) =>
        require(src0.columns.length == cols.length,
          s"INSERT INTO $name: ${cols.length} columns listed, " +
            s"${src0.columns.length} provided")
        val unknown = cols.filterNot(meta.schema.fieldNames
          .map(_.toLowerCase).contains(_))
        require(unknown.isEmpty,
          s"INSERT INTO $name lists columns the table does not have: " +
            s"${unknown.mkString(", ")} (reference bug #2.14/1 — the " +
            "phantom `timestamp` column — fails fast here)")
        // unlisted columns fill with NULL, every column cast to its
        // declared type
        graft.model.Schemas.evolve(src0.toDF(cols: _*), meta.schema)
      case None => conform(src0, meta.schema, name)
    }
    appendRows(name, meta, src)
  }

  /** BY NAME when the source columns are exactly the target's (any
    * order), else positional with an arity check — then cast to DDL
    * types. */
  private def conform(src: DataFrame, schema: StructType,
      name: String): DataFrame = {
    val bySet = src.columns.map(_.toLowerCase).toSet
    val want = schema.fieldNames.map(_.toLowerCase).toSet
    val named =
      if (bySet == want && src.columns.length == schema.fields.length) src
      else {
        require(src.columns.length == schema.fields.length,
          s"INSERT INTO $name: table has ${schema.fields.length} columns, " +
            s"query produced ${src.columns.length}")
        src.toDF(schema.fieldNames: _*)
      }
    named.select(schema.fields.map(f =>
      col(s"`${f.name}`").cast(f.dataType).as(f.name)): _*)
  }

  private def appendRows(name: String, meta: TableMeta,
      rows: DataFrame): Unit = meta.partitionCol match {
    case Some(p) =>
      val path = tableDir(name).toString
      // true INSERT semantics on the partition-overwrite format: union
      // the new rows with the CURRENT rows of only the affected
      // partitions, then promote those partitions (O(day), not
      // O(table); after the reference's DELETE step the union is just
      // the new rows)
      val parts = rows.select(col(p).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      if (parts.isEmpty) return
      val cur =
        if (VersionedPartitioned.currentVersion(spark, path).isDefined)
          VersionedPartitioned.readPartitionsWhere(spark, path, parts.contains)
            .select(meta.schema.fieldNames.map(c => col(s"`$c`")): _*)
        else emptyDf(meta.schema)
      VersionedPartitioned.promote(cur.unionByName(rows), path, p)
      ()
    case None =>
      val dataDir = tableDir(name).resolve(DataDir).toString
      val cur = readUnpartitioned(meta, dataDir)
      Exchange.swapTable(cur.unionByName(rows), dataDir)
  }

  private def deletePartition(name: String, colName: String,
      d: String): Unit = {
    val meta = metaOf(name).getOrElse(
      throw new IllegalArgumentException(s"DELETE FROM $name: no such table"))
    val p = meta.partitionCol.getOrElse(
      throw new IllegalArgumentException(s"DELETE FROM $name: table is " +
        "unpartitioned — the SQL front door supports partition-targeted " +
        "deletes; use VersionedPartitioned.deleteWhere for row deletes"))
    require(p == colName, s"DELETE FROM $name WHERE $colName: " +
      s"table is partitioned by $p — only partition-targeted deletes " +
      "route through the SQL front door")
    val path = tableDir(name).toString
    if (VersionedPartitioned.currentVersion(spark, path).isDefined) {
      // literal typed by the partition column's declared type (DATE in
      // the reference texts; string for e.g. month-keyed tables)
      val v = meta.schema(meta.schema.fieldNames
          .find(_.equalsIgnoreCase(p)).get).dataType match {
        case org.apache.spark.sql.types.DateType =>
          lit(java.sql.Date.valueOf(d))
        case dt => lit(d).cast(dt)
      }
      VersionedPartitioned.deleteWhere(spark, path, col(s"`$p`") === v)
      ()
    }
  }

  private def dropTable(name: String): Unit = {
    val dir = tableDir(name)
    if (java.nio.file.Files.exists(dir)) {
      val (fs, p) = Versioned.fsOf(spark, dir.toString)
      fs.delete(p, true)
      ()
    }
  }

  // ---------------------------------------------------------- reading —

  private def readTable(name: String, meta: TableMeta): DataFrame =
    meta.partitionCol match {
      case Some(_) =>
        val path = tableDir(name).toString
        if (VersionedPartitioned.currentVersion(spark, path).isDefined)
          VersionedPartitioned.read(spark, path)
            .select(meta.schema.fieldNames.map(c => col(s"`$c`")): _*)
        else emptyDf(meta.schema)
      case None =>
        readUnpartitioned(meta, tableDir(name).resolve(DataDir).toString)
    }

  private def readUnpartitioned(meta: TableMeta, dataDir: String): DataFrame = {
    val (fs, p) = Versioned.fsOf(spark, dataDir)
    if (fs.exists(p))
      spark.read.schema(meta.schema).parquet(dataDir)
        .select(meta.schema.fieldNames.map(c => col(s"`$c`")): _*)
    else emptyDf(meta.schema)
  }

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)

  // ---------------------------------------------------------- catalog —

  private def schemaDir(name: String) =
    java.nio.file.Paths.get(root, name.toLowerCase)

  private def tableDir(name: String) = {
    val parts = name.split("\\.")
    require(parts.length == 2,
      s"table name must be schema-qualified (schema.table), got $name")
    java.nio.file.Paths.get(root, parts(0), parts(1))
  }

  private def metaOf(name: String): Option[TableMeta] = {
    val f = tableDir(name).resolve(MetaFile)
    if (java.nio.file.Files.exists(f))
      Some(TableMeta.parse(
        new String(java.nio.file.Files.readAllBytes(f), "UTF-8")))
    else None
  }

  /** Register every cataloged table as a temp view under its view-safe
    * name (dots are illegal in temp view names). */
  private def registerViews(): Unit =
    tables().foreach { t =>
      readTable(t, metaOf(t).get).createOrReplaceTempView(viewName(t))
    }

  /** Rewrite qualified table names to their view-safe forms, longest
    * name first so `s.t_stg_x` never half-matches `s.t`. */
  private def rewriteNames(sql: String): String =
    tables().sortBy(-_.length).foldLeft(sql) { (acc, t) =>
      acc.replaceAll("(?i)" + java.util.regex.Pattern.quote(t) + "(?![\\w])",
        viewName(t))
    }

  private def viewName(t: String): String = t.replace(".", "__")
}

object SqlLifecycle {
  private val MetaFile = "_graft_table.meta"
  private val DataDir = "data"

  private final case class TableMeta(schema: StructType,
      partitionCol: Option[String]) {
    def render: String =
      s"partition=${partitionCol.getOrElse("-")}\nddl=${schema.toDDL}\n"
  }

  private object TableMeta {
    def parse(s: String): TableMeta = {
      val kv = s.linesIterator.filter(_.contains("="))
        .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }
        .toMap
      TableMeta(StructType.fromDDL(kv("ddl")),
        Some(kv("partition")).filter(_ != "-"))
    }
  }

  /** Strip `-- comment` lines (the reference texts are comment-heavy). */
  private def stripComments(sql: String): String =
    sql.linesIterator.map { l =>
      val i = l.indexOf("--")
      if (i >= 0) l.take(i) else l
    }.mkString("\n")

  private val CreateSchemaRe =
    """(?is)^\s*CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w]+)\s*;?\s*$""".r
  // column block = greedy to the last ')' before USING; PARTITIONED BY
  // and COMMENT optional, in the reference's order
  private val CreateTableRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([\w.]+)\s*\((.*)\)\s*USING\s+\w+""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?""" +
      """(?:\s+COMMENT\s+'[^']*')?\s*;?\s*$""").r
  private val DeletePartRe =
    ("""(?is)^\s*DELETE\s+FROM\s+([\w.]+)\s+WHERE\s+([\w]+)\s*=\s*""" +
      """(?:DATE\s*)?'([^']+)'\s*;?\s*$""").r
  private val VersionAsOfRe =
    """(?i)([\w.]+)\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private val TimestampAsOfRe =
    """(?i)([\w.]+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r
  private val InsertRe =
    """(?is)^\s*INSERT\s+INTO\s+([\w.]+)\s+(.*)$""".r
  private val DropTableRe =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$""".r
  // leading (col, col, ...) list of an INSERT body
  private val ColListRe = """(?s)^\(([^)]*)\)\s*(.*)$""".r
}
