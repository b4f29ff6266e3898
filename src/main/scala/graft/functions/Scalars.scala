package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar function suites (SURVEY.md §2B): string / date / math / array /
  * json. All Spark built-ins (whole-stage codegen'd, no UDFs). Integer-ish
  * results are cast to BIGINT to match DuckDB's wider default types;
  * doubles round to 4dp.
  */
object Scalars {

  private val qStringFuncs = Q(
    "q_string_funcs",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 10).as("sub"),
          length(col("p_name")).cast("long").as("len"),
          regexp_replace(col("p_name"), " ", "_").as("rep"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_tok"),
          size(split(col("p_name"), " ")).cast("long").as("ntok"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 10) AS sub,
              length(p_name) AS len, replace(p_name, ' ', '_') AS rep,
              regexp_extract(p_name, '^(\w+)', 1) AS first_tok,
              len(string_split(p_name, ' ')) AS ntok
            FROM part ORDER BY p_partkey""")
  )

  private val qDateFuncs = Q(
    "q_date_funcs",
    (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_format(col("o_orderdate"), "yyyy-MM-01").as("mon_trunc"),
          datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mon,
              day(o_orderdate) AS dom, strftime(o_orderdate, '%Y-%m-01') AS mon_trunc,
              date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since
            FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""")
  )

  private val qMathFuncs = Q(
    "q_math_funcs",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 101 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_extendedprice") - 1000), 4).as("a"),
          ceil(col("l_quantity")).cast("long").as("c"),
          floor(col("l_discount") * 100).cast("long").as("f"),
          round(pow(lit(1) + col("l_discount"), 2), 4).as("p"),
          round(log(col("l_extendedprice")), 4).as("lnp"),
          round(sqrt(col("l_quantity")), 4).as("sq"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
              round(abs(l_extendedprice - 1000), 4) AS a,
              CAST(ceil(l_quantity) AS BIGINT) AS c,
              CAST(floor(l_discount * 100) AS BIGINT) AS f,
              round(pow(1 + l_discount, 2), 4) AS p,
              round(ln(l_extendedprice), 4) AS lnp,
              round(sqrt(l_quantity), 4) AS sq
            FROM lineitem WHERE l_orderkey % 101 = 0
            ORDER BY l_orderkey, l_linenumber""")
  )

  /** Array ops over the embedding column (ArrayType(FloatType)) incl. an
    * L2 norm via the higher-order aggregate() — left-fold order matches
    * DuckDB's list_sum, so doubles agree bit-exactly before rounding. */
  private val qArrayFuncs = Q(
    "q_array_funcs",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
          round(element_at(col("embedding"), 64).cast("double"), 4).as("last_val"),
          round(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id, len(embedding) AS dim,
              round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
              round(CAST(embedding[64] AS DOUBLE), 4) AS last_val,
              round(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2
            FROM embeddings ORDER BY vec_id""")
  )

  private val qJsonFuncs = Q(
    "q_json_funcs",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy("event_id"),
    Some("""SELECT event_id, CAST(props ->> '$.k' AS BIGINT) AS k_val
            FROM events ORDER BY event_id""")
  )

  val all: Seq[Q] = Seq(qStringFuncs, qDateFuncs, qMathFuncs, qArrayFuncs, qJsonFuncs)
}
