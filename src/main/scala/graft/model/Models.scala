package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Tables

/** Typed views of the test tables (`Dataset[T]` with case-class encoders)
  * for pipelines that want compile-time column safety; the untyped
  * `DataFrame` registry remains the primary surface (the reference's whole
  * query corpus is dynamic SQL, SURVEY §1.3).
  */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)

case class Document(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

object Models {
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.load(spark, dir, "events").as[Event]
  }

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.load(spark, dir, "customer").as[Customer]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").as[Document]
  }
}
