package graft.model

import graft.SparkFunSuite

class ModelsSpec extends SparkFunSuite {

  test("typed datasets round-trip the driver tables") {
    import spark.implicits._
    val ev = Models.events(spark, sf)
    assert(ev.head().event_type.nonEmpty)
    assert(ev.count() == 1000)
    // typed transformations compose with compile-time field access
    val purchasesPerUser = ev
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .count()
    assert(purchasesPerUser.collect().forall(_._2 > 0))
    assert(Models.customers(spark, sf).head().c_name.startsWith("Customer#"))
    assert(Models.documents(spark, sf).head().n_chars > 0)
  }
}
