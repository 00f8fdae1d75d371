package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Randomized conservativeness property for manifest-stats pruning: for
  * ANY predicate, a catalog scan (which prunes files by min/max stats)
  * must return exactly the rows a raw read of all files returns. A
  * pruning bug here silently loses rows from queries AND from row-level
  * rewrites, so this is the property most worth fuzzing. */
class PruningConservativeSpec extends SparkFunSuite {

  test("stats-pruned scans equal unpruned scans for randomized predicates") {
    val wh = scratch("prune-prop-wh")
    spark.conf.set("spark.sql.catalog.ppc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ppc.warehouse", wh)
    spark.sql(
      """CREATE TABLE ppc.db.ev
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartitionByRange(12, col("user_id"))
      .sortWithinPartitions("user_id")
      .writeTo("ppc.db.ev").append()
    val raw = spark.table("ppc.db.ev").cache()
    raw.count()

    val rnd = new scala.util.Random(42)
    val types = Seq("'click'", "'purchase'", "'page_view'", "'zzz_absent'")
    def simple(): String = {
      val col = Seq("event_id", "user_id", "value", "event_type")(rnd.nextInt(4))
      val v = col match {
        case "event_id" => (rnd.nextInt(12000) - 1000).toString
        case "user_id" => rnd.nextInt(200).toString
        case "value" => f"${rnd.nextDouble() * 1200 - 100}%.2f"
        case _ => types(rnd.nextInt(types.size))
      }
      val op = Seq("<", "<=", ">", ">=", "=", "<>")(rnd.nextInt(6))
      s"$col $op $v"
    }
    def pred(depth: Int): String =
      if (depth == 0 || rnd.nextInt(3) == 0) simple()
      else rnd.nextInt(3) match {
        case 0 => s"(${pred(depth - 1)}) AND (${pred(depth - 1)})"
        case 1 => s"(${pred(depth - 1)}) OR (${pred(depth - 1)})"
        case _ => s"NOT (${pred(depth - 1)})"
      }

    (1 to 40).foreach { i =>
      val p = pred(2)
      val pruned = spark.sql(s"SELECT count(*), sum(event_id) FROM ppc.db.ev WHERE $p").head()
      val full = raw.filter(expr(p)).agg(count(org.apache.spark.sql.functions.lit(1)), sum(col("event_id"))).head()
      assert(pruned == full, s"predicate #$i lost rows through pruning: $p")
    }
    raw.unpersist()
  }
}
