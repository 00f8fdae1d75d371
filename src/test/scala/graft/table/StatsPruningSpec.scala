package graft.table

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

class StatsPruningSpec extends AnyFunSuite {

  private def file(stats: (String, SnapshotTable.ColStats)*) =
    SnapshotTable.DataFile("/x.parquet", 10L, stats.toMap)

  private val f = file(
    "id" -> SnapshotTable.ColStats("long", "100", "200"),
    "score" -> SnapshotTable.ColStats("double", "0.5", "1.5"),
    "name" -> SnapshotTable.ColStats("string", "alpha", "omega"))

  private def keeps(flt: Filter): Boolean =
    StatsPruning.prune(Seq(f), Seq(flt)).nonEmpty

  test("range comparisons prune exactly at the recorded bounds") {
    assert(!keeps(LessThan("id", 100L)))          // min is 100
    assert(keeps(LessThanOrEqual("id", 100L)))
    assert(!keeps(GreaterThan("id", 200L)))       // max is 200
    assert(keeps(GreaterThanOrEqual("id", 200L)))
    assert(keeps(EqualTo("id", 150L)))
    assert(!keeps(EqualTo("id", 99L)))
    assert(!keeps(EqualTo("id", 201L)))
  }

  test("double and string stats prune; int values compare against long stats") {
    assert(!keeps(GreaterThan("score", 1.5)))
    assert(keeps(EqualTo("score", 0.5)))
    assert(!keeps(EqualTo("name", "zzz")))
    assert(keeps(EqualTo("name", "delta")))
    assert(keeps(EqualTo("id", 150)))             // Int value, long stats
    assert(!keeps(EqualTo("id", 99)))
  }

  test("And/Or/In combine; unknown shapes and missing stats never prune") {
    assert(!keeps(And(EqualTo("id", 150L), EqualTo("name", "zzz"))))
    assert(keeps(Or(EqualTo("id", 99L), EqualTo("name", "delta"))))
    assert(!keeps(In("id", Array(1L, 2L, 99L))))
    assert(keeps(In("id", Array(1L, 150L))))
    assert(keeps(EqualTo("absent_col", 5L)))      // no stats for column
    assert(keeps(StringContains("name", "zzz")))  // unsupported shape
    assert(keeps(IsNull("id")))                   // min/max say nothing re nulls
    assert(keeps(EqualTo("id", "not-a-number")))  // type mismatch → keep
  }

  test("fromCatalyst translates comparisons and flips literal-first forms") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    val attr = AttributeReference("id", LongType)()
    val lit = Literal(5L, LongType)
    assert(StatsPruning.fromCatalyst(GreaterThan(attr, lit)).contains(
      org.apache.spark.sql.sources.GreaterThan("id", 5L)))
    assert(StatsPruning.fromCatalyst(GreaterThan(lit, attr)).contains(
      org.apache.spark.sql.sources.LessThan("id", 5L)))
    // partial And keeps the translatable conjunct (still a valid pruner)
    val mixed = And(GreaterThan(attr, lit), IsNaN(attr))
    assert(StatsPruning.fromCatalyst(mixed).contains(
      org.apache.spark.sql.sources.GreaterThan("id", 5L)))
    // Or with an untranslatable side must NOT prune at all
    val orMixed = Or(GreaterThan(attr, lit), IsNaN(attr))
    assert(StatsPruning.fromCatalyst(orMixed).isEmpty)
  }
}
