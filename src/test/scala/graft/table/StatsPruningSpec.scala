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

  test("bucketDerived pins bucket ids from key equality/IN/IS NULL shapes") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("user_id", LongType)))
    val pcols = Seq("bucket(8,user_id)")
    def derived(fs: Filter*): Seq[Filter] =
      StatsPruning.bucketDerived(pcols, schema, fs)
    val b7 = BucketFunction.bucketId(java.lang.Long.valueOf(7L), 8)
    val b9 = BucketFunction.bucketId(java.lang.Long.valueOf(9L), 8)
    val bNull = BucketFunction.bucketId(null, 8)

    derived(EqualTo("user_id", 7L)) match {
      case Seq(In("bucket(8,user_id)", vs)) => assert(vs.toSet == Set(b7))
      case other => fail(s"unexpected: $other")
    }
    // Integer literal against a bigint column must hash as LONG
    derived(EqualTo("user_id", 7)) match {
      case Seq(In("bucket(8,user_id)", vs)) => assert(vs.toSet == Set(b7))
      case other => fail(s"unexpected: $other")
    }
    derived(In("user_id", Array(7L, 9L))) match {
      case Seq(In("bucket(8,user_id)", vs)) => assert(vs.toSet == Set(b7, b9))
      case other => fail(s"unexpected: $other")
    }
    // the null-safe replace shape: IS NULL OR IN — nulls hash to a real
    // bucket (seed), so the union is still a finite pinned set
    derived(Or(IsNull("user_id"), In("user_id", Array(7L)))) match {
      case Seq(In("bucket(8,user_id)", vs)) => assert(vs.toSet == Set(b7, bNull))
      case other => fail(s"unexpected: $other")
    }
    // range shapes pin nothing (hash destroys order) → no derived filter
    assert(derived(GreaterThan("user_id", 7L)).isEmpty)
    // Or with an unconstrained side pins nothing
    assert(derived(Or(EqualTo("user_id", 7L), GreaterThan("user_id", 0L))).isEmpty)

    // end-to-end: the derived filter prunes other buckets' files via the
    // min==max partition-value stat, where user_id ranges cannot
    val inB7 = file("bucket(8,user_id)" ->
      SnapshotTable.ColStats("long", b7.toString, b7.toString))
    val other = file("bucket(8,user_id)" ->
      SnapshotTable.ColStats("long", ((b7 + 1) % 8).toString, ((b7 + 1) % 8).toString))
    val kept = StatsPruning.prune(Seq(inB7, other),
      derived(EqualTo("user_id", 7L)))
    assert(kept == Seq(inB7))
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
