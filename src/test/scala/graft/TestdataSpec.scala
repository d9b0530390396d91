package graft

import org.apache.spark.sql.types._

/** Canary for the driver's testdata physical contracts. The driver
  * regenerated `/root/testdata` between rounds 8 and 9 and silently
  * changed events.ts from TIMESTAMP(NANOS) to timestamp[us], which
  * surfaced as five scattered DATATYPE_MISMATCH failures and seven
  * dead queries. This spec generalizes the lesson: every LOAD-BEARING
  * column the engine joins, filters, or computes on is asserted here
  * with a pointed per-column message, so the NEXT physical-type change
  * fails in one place that names the blast radius. Columns the engine
  * ignores are not asserted — cosmetic driver changes must not
  * false-alarm. */
class TestdataSpec extends SparkSpec {

  /** column -> acceptable Spark types (several where the driver has
    * shipped more than one physical contract across generations). */
  private val contracts: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType, LongType),
      "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType, LongType),
      "n_regionkey" -> Set(IntegerType, LongType),
      "n_name" -> Set(StringType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType, IntegerType),
      "c_nationkey" -> Set(IntegerType, LongType),
      "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType, IntegerType),
      "s_nationkey" -> Set(IntegerType, LongType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType, IntegerType),
      "p_size" -> Set(IntegerType, LongType),
      "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set(TimestampType, TimestampNTZType),
      "o_orderstatus" -> Set(StringType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Set(TimestampType, TimestampNTZType)),
    "events" -> Map(
      "event_id" -> Set(LongType),
      // the column that broke round 9: nanos-long (TIMESTAMP(NANOS)
      // under nanosAsLong) or timestamp[us] (NTZ without a tz) — both
      // handled by EventStream.tsSecCol/tsMicrosCol
      "ts" -> Set(LongType, TimestampType, TimestampNTZType),
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      // every vector kernel (VecDot/VecNorm/int8 quantization/SRP)
      // assumes float32 elements
      "embedding" -> Set(ArrayType(FloatType, true),
        ArrayType(FloatType, false)),
      "label" -> Set(IntegerType, LongType)))

  test("testdata physical contracts: every load-bearing column has a handled type") {
    for ((table, cols) <- contracts.toSeq.sortBy(_._1)) {
      val schema = spark.read
        .parquet(sf("sf0.001") + s"/$table.parquet").schema
      for ((name, ok) <- cols.toSeq.sortBy(_._1)) {
        assert(schema.fieldNames.contains(name),
          s"$table.$name MISSING — the driver's testdata dropped a " +
            "column the engine reads; grep the query modules for it")
        val dt = schema(name).dataType
        assert(ok.contains(dt),
          s"$table.$name arrived as $dt, expected one of $ok — the " +
            "driver regenerated testdata with a new physical type " +
            "(as with events.ts in round 9). Extend the reader for " +
            "the new contract, then widen this canary.")
      }
    }
  }
}
