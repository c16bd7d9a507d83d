package graft

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScanPrune

/** Unit pins for the statement-to-manifest predicate bridge: the keep
  * functions ScanPrune derives from optimized-plan conjuncts. The
  * end-to-end behavior (routed SELECT plans the same dirs as the
  * Scala pruned reads) lives in HiddenPartitionSpec; these pin the
  * value-mapping corners that an integration read could mask. */
class ScanPruneSpec extends AnyFunSuite {

  private val dateCol = AttributeReference("date", DateType)()
  private val numCol = AttributeReference("bucket", IntegerType)()

  private def dateLit(s: String) =
    Literal(java.sql.Date.valueOf(s).toLocalDate.toEpochDay.toInt, DateType)

  test("numeric partitions compare TYPED, not as strings") {
    // the classic '9' > '10' string trap: a numeric range keep must
    // parse the partition value back to the column type first
    val keep = ScanPrune.plainKeepFor(
      Seq(GreaterThanOrEqual(numCol, Literal(9, IntegerType))), "bucket").get
    assert(keep("9") && keep("10") && keep("100"))
    assert(!keep("8") && !keep("1"))
    // unparseable partition values are kept, never dropped on doubt
    assert(keep("not-a-number"))
  }

  test("date equality, IN-lists and one-sided bounds map to keeps") {
    val eq = ScanPrune.plainKeepFor(
      Seq(EqualTo(dateCol, dateLit("2024-03-05"))), "date").get
    assert(eq("2024-03-05") && !eq("2024-03-06"))
    val in = ScanPrune.plainKeepFor(
      Seq(In(dateCol, Seq(dateLit("2024-03-02"), dateLit("2024-03-07")))),
      "date").get
    assert(in("2024-03-02") && in("2024-03-07") && !in("2024-03-05"))
    val lower = ScanPrune.plainKeepFor(
      Seq(GreaterThan(dateCol, dateLit("2024-03-05"))), "date").get
    assert(!lower("2024-03-05") && lower("2024-03-06"))
    // literal-on-the-left flips the relation
    val flipped = ScanPrune.plainKeepFor(
      Seq(GreaterThan(dateLit("2024-03-05"), dateCol)), "date").get
    assert(flipped("2024-03-04") && !flipped("2024-03-05"))
  }

  test("and/or trees: OR unions branches, an unmappable branch disables the conjunct") {
    val ored = ScanPrune.plainKeepFor(Seq(Or(
      EqualTo(dateCol, dateLit("2024-03-02")),
      EqualTo(dateCol, dateLit("2024-03-07")))), "date").get
    assert(ored("2024-03-02") && ored("2024-03-07") && !ored("2024-03-05"))
    // OR with a branch on ANOTHER column constrains nothing
    val other = AttributeReference("px", DoubleType)()
    assert(ScanPrune.plainKeepFor(Seq(Or(
      EqualTo(dateCol, dateLit("2024-03-02")),
      GreaterThan(other, Literal(1.0, DoubleType)))), "date").isEmpty)
    // AND keeps whichever side maps (each alone is necessary)
    val anded = ScanPrune.plainKeepFor(Seq(And(
      EqualTo(dateCol, dateLit("2024-03-02")),
      GreaterThan(other, Literal(1.0, DoubleType)))), "date").get
    assert(anded("2024-03-02") && !anded("2024-03-07"))
  }

  test("null-intolerant keeps exclude the writer's null partition") {
    val keep = ScanPrune.plainKeepFor(
      Seq(EqualTo(dateCol, dateLit("2024-03-05"))), "date").get
    assert(!keep("__HIVE_DEFAULT_PARTITION__"))
    // a null literal never maps (IS NULL is not a prune we take)
    assert(ScanPrune.plainKeepFor(
      Seq(EqualTo(dateCol, Literal(null, DateType))), "date").isEmpty)
  }

  test("boundsFor: hidden-member bounds keep first-wins narrowing and typed literals") {
    val b = ScanPrune.boundsFor(Seq(
      GreaterThanOrEqual(dateCol, dateLit("2024-03-03")),
      GreaterThanOrEqual(dateCol, dateLit("2024-03-05")), // later bound ignored (superset rule)
      LessThan(dateCol, dateLit("2024-03-09"))), "date").get
    assert(b.lo.exists(_._1.semanticEquals(dateLit("2024-03-03"))))
    assert(b.hi.exists(_._1.semanticEquals(dateLit("2024-03-09"))))
    assert(b.eqs.isEmpty)
    assert(ScanPrune.boundsFor(Nil, "date").isEmpty)
  }
}
