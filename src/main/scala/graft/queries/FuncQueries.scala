package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 — scalar function families (F1-F7), the HiveQL built-in
  * surface served through the reference's ObjectInspector bridge
  * (reference: HiveKuduBridgeUtils.java:70-97). All Spark built-ins
  * (whole-stage codegen), no UDFs.
  */
object FuncQueries {

  val defs: Seq[QDef] = Seq(

    QDef("f1_string_funcs",
      (s, dir) => Tables.parallel(Tables.load(s, dir, "customer"))
        .select(
          col("c_custkey"),
          concat(col("c_name"), lit("-"), col("c_mktsegment")).as("tagged"),
          upper(col("c_mktsegment")).as("seg_up"),
          lower(col("c_name")).as("name_lo"),
          substring(col("c_name"), 10, 4).as("name_mid"),
          length(col("c_name")).as("name_len"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          instr(col("c_name"), "9").as("pos9"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
          element_at(split(col("c_name"), "#"), 2).as("num_part"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  c_name || '-' || c_mktsegment AS tagged,
             |  upper(c_mktsegment) AS seg_up,
             |  lower(c_name) AS name_lo,
             |  substring(c_name, 10, 4) AS name_mid,
             |  CAST(length(c_name) AS INTEGER) AS name_len,
             |  trim('  ' || c_mktsegment || '  ') AS trimmed,
             |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
             |  CAST(instr(c_name, '9') AS INTEGER) AS pos9,
             |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             |  regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
             |  string_split(c_name, '#')[2] AS num_part
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    QDef("f2_datetime_funcs",
      (s, dir) => Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          expr("datediff(cast(o_orderdate as date), DATE '1995-01-01')").as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_day"),
          expr("unix_timestamp(cast(o_orderdate as timestamp))").as("epoch_s"),
          expr("unix_millis(cast(o_orderdate as timestamp))").as("epoch_ms"),
          col("o_orderdate").cast("date").as("as_date"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS yr,
             |  CAST(month(o_orderdate) AS INTEGER) AS mo,
             |  CAST(day(o_orderdate) AS INTEGER) AS dom,
             |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
             |  CAST(o_orderdate AS DATE) + 30 AS due_day,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  epoch_ms(o_orderdate) AS epoch_ms,
             |  CAST(o_orderdate AS DATE) AS as_date
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QDef("f3_math_funcs",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          dec4(abs(col("l_discount") - 0.05)).as("abs_dev"),
          dec4(round(sqrt(col("l_extendedprice")), 2)).as("root_price"),
          floor(col("l_extendedprice")).as("floor_price"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          dec4(pow(col("l_quantity"), 2)).as("qty_sq"),
          dec4(log(col("l_extendedprice"))).as("ln_price"),
          dec4(exp(col("l_discount"))).as("exp_disc"),
          pmod(col("l_orderkey") - 7, lit(5)).as("pm"),
          signum(col("l_quantity") - 25.0).cast("int").as("sgn"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(abs(l_discount - 0.05) AS DECIMAL(38,4)) AS abs_dev,
             |  CAST(round(sqrt(l_extendedprice), 2) AS DECIMAL(38,4)) AS root_price,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
             |  CAST(pow(l_quantity, 2) AS DECIMAL(38,4)) AS qty_sq,
             |  CAST(ln(l_extendedprice) AS DECIMAL(38,4)) AS ln_price,
             |  CAST(exp(l_discount) AS DECIMAL(38,4)) AS exp_disc,
             |  ((l_orderkey - 7) % 5 + 5) % 5 AS pm,
             |  CAST(sign(l_quantity - 25.0) AS INTEGER) AS sgn
             |FROM lineitem WHERE l_orderkey < 200
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QDef("f4_conditional_funcs",
      (s, dir) => Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          coalesce(expr("nullif(o_orderstatus, 'O')"), lit("open")).as("status_or_open"),
          d182(greatest(col("o_totalprice"), lit(250000.0))).as("hi"),
          d182(least(col("o_totalprice"), lit(250000.0))).as("lo"),
          when(col("o_totalprice") > 250000.0, "big").otherwise("small").as("size_tag"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
             |  CAST(greatest(o_totalprice, 250000.0) AS DECIMAL(18,2)) AS hi,
             |  CAST(least(o_totalprice, 250000.0) AS DECIMAL(18,2)) AS lo,
             |  CASE WHEN o_totalprice > 250000.0 THEN 'big' ELSE 'small' END AS size_tag
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Array HOFs over embeddings; fold order pinned (see VectorFunctions).
    QDef("f5_array_funcs",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          dec4(element_at(col("embedding"), 1).cast("double")).as("first_elem"),
          dec4(aggregate(transform(col("embedding"), x => x.cast("double")),
            lit(0.0), (acc, v) => acc + v)).as("elem_sum"),
          dec4(array_min(transform(col("embedding"), x => x.cast("double")))).as("elem_min"),
          dec4(array_max(transform(col("embedding"), x => x.cast("double")))).as("elem_max"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS INTEGER) AS dim,
             |  CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(38,4)) AS first_elem,
             |  CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(embedding, x -> CAST(x AS DOUBLE))),
             |       (acc, v) -> acc + v) AS DECIMAL(38,4)) AS elem_sum,
             |  CAST(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DECIMAL(38,4)) AS elem_min,
             |  CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DECIMAL(38,4)) AS elem_max
             |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin)),

    // Array set algebra (F5 extension). Sorted + serialized because DuckDB's
    // list_intersect does not preserve order.
    QDef("f5_array_setops",
      (s, dir) => {
        val a = sequence(lit(1), col("c_custkey") % 5 + 3)
        val b = sequence(col("c_custkey") % 3 + 1, lit(6))
        def ser(arr: org.apache.spark.sql.Column) =
          array_join(transform(array_sort(arr), x => x.cast("string")), ",")
        Tables.load(s, dir, "customer").filter(col("c_custkey") < 50)
          .select(
            col("c_custkey"),
            ser(array_intersect(a, b)).as("inter"),
            ser(array_union(a, b)).as("uni"),
            ser(array_except(a, b)).as("diff"))
          .orderBy("c_custkey")
      },
      Some("""WITH t AS (
             |  SELECT c_custkey,
             |    range(1, c_custkey % 5 + 4) AS a,
             |    range(c_custkey % 3 + 1, 7) AS b
             |  FROM customer WHERE c_custkey < 50)
             |SELECT c_custkey,
             |  coalesce(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS inter,
             |  coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS uni,
             |  coalesce(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '') AS diff
             |FROM t ORDER BY c_custkey""".stripMargin)),

    // Generator / LATERAL VIEW explode (§2.10 UDTF surface → built-in posexplode).
    QDef("f5_explode",
      (s, dir) => Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos"), dec4(col("col").cast("double")).as("val"))
        .orderBy("vec_id", "pos"),
      Some("""SELECT vec_id, i - 1 AS pos, CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,4)) AS val
             |FROM embeddings, generate_series(1, 64) t(i)
             |WHERE vec_id < 5 ORDER BY vec_id, pos""".stripMargin)),

    QDef("f6_json_funcs",
      (s, dir) => Tables.load(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"),
          (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
             |FROM events ORDER BY event_id""".stripMargin)),

    // F2 extension: calendar arithmetic beyond extraction.
    QDef("f2_date_arith",
      (s, dir) => Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          add_months(col("o_orderdate").cast("date"), 2).as("plus_2mo"),
          last_day(col("o_orderdate")).cast("date").as("month_end"),
          weekday(col("o_orderdate")).as("dow_mon0"),
          quarter(col("o_orderdate")).as("qtr"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  CAST(isodow(o_orderdate) - 1 AS INTEGER) AS dow_mon0,
             |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // F6 extension: JSON to typed MAP and key introspection (the Hive
    // map_keys / LATERAL VIEW surface over the reference's string columns).
    QDef("f6_json_map",
      (s, dir) => Tables.load(s, dir, "events")
        .select(
          col("event_id"),
          element_at(map_keys(from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))), 1).as("first_key"),
          element_at(from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")), "k").as("k_val"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  json_keys(props)[1] AS first_key,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
             |FROM events ORDER BY event_id""".stripMargin)),

    // Hash functions — also the substrate of dedup D1/D2.
    QDef("f7_hash_funcs",
      (s, dir) => Tables.parallel(Tables.load(s, dir, "documents"))
        .select(
          col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"),
          length(col("text")).as("n"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
             |  CAST(length(text) AS INTEGER) AS n
             |FROM documents ORDER BY doc_id""".stripMargin)),
  )
}
