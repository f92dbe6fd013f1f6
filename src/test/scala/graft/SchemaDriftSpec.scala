package graft

import org.apache.spark.sql.types._

/** Testdata schema canary. The driver regenerates /root/testdata between
  * rounds and has already changed a physical type once (events.ts:
  * int64-nanos → TIMESTAMP_MICROS, which silently zeroed 9 queries for a
  * round). This spec pins, per table, the column names and the SET of
  * physical types the engine's readers accept — so the next refresh that
  * drifts a type fails HERE with a message naming the exact column, instead
  * of erroring deep inside nine unrelated queries.
  */
class SchemaDriftSpec extends SparkTestBase {

  // accepted physical types per column; a refresh may legitimately move
  // within a set (e.g. int32 ↔ int64 promotions, timestamp tz-ness), and
  // readers must keep working across each listed alternative
  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> integral, "r_name" -> Set(StringType)),
    "nation" -> Seq("n_nationkey" -> integral, "n_name" -> Set(StringType),
      "n_regionkey" -> integral),
    "customer" -> Seq("c_custkey" -> integral, "c_name" -> Set(StringType),
      "c_nationkey" -> integral, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq("s_suppkey" -> integral, "s_name" -> Set(StringType),
      "s_nationkey" -> integral, "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq("p_partkey" -> integral, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> integral, "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> ts),
    "events" -> Seq("event_id" -> integral,
      // LongType = the legacy int64-nanos layout read via nanosAsLong
      "ts" -> (ts + LongType), "user_id" -> integral,
      "event_type" -> Set(StringType), "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Seq("doc_id" -> integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Seq("vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> integral))

  test("testdata physical schemas match what the engine's readers accept") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = spark.read.parquet(s"$sf/$table.parquet").schema
      val nameDrift =
        if (schema.fields.map(_.name).toSeq != cols.map(_._1))
          Seq(s"$table: columns ${schema.fields.map(_.name).mkString(",")} " +
            s"(expected ${cols.map(_._1).mkString(",")})")
        else Nil
      val typeDrift = cols.flatMap { case (name, accepted) =>
        schema.fields.find(_.name == name).toSeq.collect {
          case f if !accepted.contains(f.dataType) =>
            s"$table.$name: ${f.dataType.simpleString} not in accepted " +
              s"{${accepted.map(_.simpleString).mkString(", ")}} — update the " +
              "reader (see Tables.events for the dtype-branch pattern), then " +
              "widen this canary"
        }
      }
      nameDrift ++ typeDrift
    }
    assert(drift.isEmpty, "\nTESTDATA SCHEMA DRIFT:\n" + drift.mkString("\n"))
  }

  test("every table is loadable through Tables.t at all three scale factors") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      expected.keys.foreach { table =>
        val df = graft.ops.Tables.t(spark, dir, table)
        assert(df.limit(1).count() == 1, s"$dir/$table is empty or unreadable")
      }
    }
  }
}
