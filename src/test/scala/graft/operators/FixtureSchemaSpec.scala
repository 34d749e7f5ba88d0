package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Fixture-schema canary: the driver regenerates /root/testdata between
  * rounds and has already changed physical types once (round 8:
  * events.ts TIMESTAMP(NANOS) → timestamp[us], which silently broke 20
  * queries until the loader learned to dispatch). This spec pins the
  * schema every loader returns, so the NEXT regeneration that shifts a
  * type fails here, in one place, with the offending column named —
  * instead of as a hundred cryptic DATATYPE_MISMATCH failures spread
  * across the query surface.
  *
  * Deliberately asserts the LOADER's post-dispatch schema (what queries
  * actually consume), not the raw parquet footer: a physical re-encoding
  * the loaders absorb (like the nanos→micros flip) should stay green.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  private def sig(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)

  private val expected = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // events: the loader normalizes ts to TIMESTAMP whatever the
    // fixture generation (TablesEventsSpec covers both encodings)
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  private val loaders: Map[String, org.apache.spark.sql.DataFrame] = {
    import Tables._
    Map(
      "region" -> region(spark, sf), "nation" -> nation(spark, sf),
      "customer" -> customer(spark, sf), "supplier" -> supplier(spark, sf),
      "part" -> part(spark, sf), "orders" -> orders(spark, sf),
      "lineitem" -> lineitem(spark, sf), "events" -> events(spark, sf),
      "documents" -> documents(spark, sf),
      "embeddings" -> embeddings(spark, sf))
  }

  expected.keys.toSeq.sorted.foreach { table =>
    test(s"$table loader schema is pinned") {
      val got = sig(loaders(table))
      assert(got == expected(table),
        s"FIXTURE REGENERATED WITH A NEW SCHEMA for '$table'?\n" +
          s"  got:      $got\n  expected: ${expected(table)}\n" +
          "If the new schema is intentional, teach the loader to absorb " +
          "it (Tables.events shows the dispatch pattern), then update " +
          "this pin.")
    }
  }
}
