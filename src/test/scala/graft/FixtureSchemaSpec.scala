package graft

import org.apache.spark.sql.types._

/** Fixture-schema tripwire (VERDICT r6 item 2).
  *
  * The driver regenerates /root/testdata between rounds; in round 6 the
  * physical type of `events.ts` silently changed (INT64 TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, isAdjustedToUTC=false)) and surfaced as 56 scattered
  * analysis errors. This spec pins the resolved Spark type of every column
  * the engine depends on, so the NEXT regeneration fails here with a
  * one-line diagnosis instead.
  *
  * Acceptance is a SET per column: types the loaders are known to handle.
  * `events.ts` accepts nanos-long (pre-r6 fixture), micros TIMESTAMP_NTZ
  * (r6+ fixture), and plain TIMESTAMP — the three shapes
  * [[Tables.events]] normalizes. Date-like TPC-H columns accept
  * DATE or either timestamp flavor for the same reason.
  */
class FixtureSchemaSpec extends SparkTestBase {

  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val dateLike: Set[DataType] = tsLike + DateType
  private def exact(t: DataType): Set[DataType] = Set(t)

  // table -> (column -> acceptable resolved types). Only columns the
  // engine actually reads are pinned; extra fixture columns are ignored.
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> exact(IntegerType), "r_name" -> exact(StringType)),
    "nation" -> Map(
      "n_nationkey" -> exact(IntegerType), "n_name" -> exact(StringType),
      "n_regionkey" -> exact(IntegerType)),
    "customer" -> Map(
      "c_custkey" -> exact(LongType), "c_name" -> exact(StringType),
      "c_nationkey" -> exact(IntegerType), "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> exact(LongType), "s_name" -> exact(StringType),
      "s_nationkey" -> exact(IntegerType), "s_acctbal" -> exact(DoubleType)),
    "part" -> Map(
      "p_partkey" -> exact(LongType), "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> exact(IntegerType), "p_retailprice" -> exact(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> exact(LongType), "o_custkey" -> exact(LongType),
      "o_orderstatus" -> exact(StringType), "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> dateLike, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> exact(LongType), "l_partkey" -> exact(LongType),
      "l_suppkey" -> exact(LongType), "l_linenumber" -> exact(IntegerType),
      "l_quantity" -> exact(DoubleType), "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType), "l_linestatus" -> exact(StringType),
      "l_shipdate" -> dateLike),
    "events" -> Map(
      "event_id" -> exact(LongType), "ts" -> (tsLike + LongType),
      "user_id" -> exact(LongType), "event_type" -> exact(StringType),
      "value" -> exact(DoubleType), "props" -> exact(StringType)),
    "documents" -> Map(
      "doc_id" -> exact(LongType), "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> exact(LongType)),
    "embeddings" -> Map(
      "vec_id" -> exact(LongType),
      "embedding" -> Set(ArrayType(FloatType, true), ArrayType(FloatType, false)),
      "label" -> exact(IntegerType)))

  /** Schema inference for the pin. `events` infers with
    * `nanosAsLong` set (set-infer-restore, mirroring [[Tables.events]]):
    * without it an INT64 TIMESTAMP(NANOS) fixture makes spark.read.parquet
    * throw during footer inference, degrading the one-line drift diagnosis
    * to a raw reader exception and leaving the LongType accept unreachable.
    * Any residual read failure becomes a drift diagnostic, not a crash. */
  private def inferSchema(table: String): Either[String, StructType] =
    try {
      if (table == "events") {
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "true")
        try Right(Tables.table(spark, sfDir, table).schema)
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      } else Right(Tables.table(spark, sfDir, table).schema)
    } catch {
      case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
    }

  test("fixture tables resolve to types the engine's loaders handle") {
    val diags = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      inferSchema(table) match {
        case Left(err) =>
          Seq(s"$table: UNREADABLE ($err) — fixture regenerated with a physical " +
            "type Spark's reader rejects; update the loader (Q.scala) and this pin together")
        case Right(schema) =>
          cols.toSeq.sortBy(_._1).flatMap { case (name, ok) =>
            schema.find(_.name == name) match {
              case None =>
                Some(s"$table.$name: MISSING (fixture dropped/renamed a column the engine reads)")
              case Some(f) if !ok.contains(f.dataType) =>
                Some(s"$table.$name: resolved ${f.dataType.simpleString}, engine handles " +
                  s"{${ok.map(_.simpleString).mkString(", ")}} — fixture regenerated with a new " +
                  "physical type; update the loader (Tables.scala) and this pin together")
              case _ => None
            }
          }
      }
    }
    assert(diags.isEmpty, "\nFIXTURE SCHEMA DRIFT:\n" + diags.mkString("\n"))
  }

  test("Tables.events normalizes every physical ts variant to the nanos contract") {
    val ev = Tables.events(spark, sfDir)
    val byName = ev.schema.map(f => f.name -> f.dataType).toMap
    assert(byName("ts") == LongType, s"ts must normalize to nanos long, got ${byName("ts")}")
    assert(byName("ts_ms") == LongType)
    assert(byName("ts_t") == TimestampType)
    // order-stable contract: both loader branches must emit the same
    // column ORDER (fixture order, ts in place, ts_ms/ts_t appended) so
    // positional consumers can't diverge across fixture generations
    assert(ev.columns.takeRight(2).toSeq == Seq("ts_ms", "ts_t"),
      s"ts_ms/ts_t must be the trailing appended columns, got ${ev.columns.mkString(",")}")
    assert(ev.columns.count(Set("ts", "ts_ms", "ts_t")) == 3)
    // value-level sanity: the three representations agree and sit in a
    // plausible epoch range (2000-01-01 .. 2100-01-01 in ms)
    val row = ev.selectExpr(
      "sum(cast(ts div 1000000 <> ts_ms as int)) as bad_ms",
      "sum(cast(unix_micros(ts_t) <> ts div 1000 as int)) as bad_t",
      "min(ts_ms) as lo", "max(ts_ms) as hi").collect()(0)
    assert(row.getLong(0) == 0L, "ts/ts_ms disagree")
    assert(row.getLong(1) == 0L, "ts/ts_t disagree")
    assert(row.getLong(2) > 946684800000L && row.getLong(3) < 4102444800000L,
      s"ts_ms outside plausible epoch-ms range: [${row.getLong(2)}, ${row.getLong(3)}]")
  }
}
