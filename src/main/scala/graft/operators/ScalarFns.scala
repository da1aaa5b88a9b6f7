package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Scalar function families (SURVEY.md §2.8) — one representative query per
  * family, exercising several functions.
  *
  * All functions here are builtin `org.apache.spark.sql.functions._`
  * Column expressions: codegen'd, null-safe, and fully inside whole-stage
  * codegen — the hot-path discipline that keeps per-row cost at nanoseconds
  * across 100 TB. No UDFs.
  *
  * Cross-engine drift notes (the silent hash-match killers):
  *  - day-of-week numbering differs (Spark dayofweek: 1=Sunday; DuckDB dow:
  *    0=Sunday) → use Spark `weekday` (0=Monday) vs DuckDB `isodow - 1`.
  *  - natural log: Spark `log` == DuckDB `ln` (DuckDB `log` is base 10).
  *  - round() on raw doubles is HALF_UP vs banker's in edge cases — only
  *    round values that are already exact or aggregate outputs (§5.4.3).
  */
object ScalarFns extends OpModule {

  private val eventsCte =
    """WITH ev AS (
      |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |         user_id, event_type, value, props
      |  FROM events)""".stripMargin

  /** String family over part names/types/brands. */
  def fnString(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      lower(col("p_brand")).as("brand_lower"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 7).as("type_prefix"),
      split(col("p_type"), " ").getItem(0).as("type_first_word"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devoweled"),
      lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
      instr(col("p_type"), "ED").as("ed_pos"))

  /** Date/time family over order dates. */
  def fnDate(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      weekday(col("o_orderdate")).as("wd_mon0"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
        .as("days_to_2002"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))

  /** Math family over lineitem numerics. */
  def fnMath(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice"), 1).as("price_round"),
      floor(col("l_extendedprice")).as("price_floor"),
      ceil(col("l_extendedprice")).as("price_ceil"),
      abs(col("l_discount") - 0.05).as("disc_dev"),
      round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
      round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
      round(log(col("l_extendedprice") + 1), 4).as("price_ln"),
      pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
      greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
      least(col("l_tax"), col("l_discount")).as("le"),
      when(col("l_quantity") > 25, "bulk")
        .when(col("l_quantity") > 10, "mid")
        .otherwise("small").as("qty_band"))

  /** Array family: higher-order functions over embedding vectors.
    * Accumulation is forced to double *in order* on both engines so the
    * fold is bit-identical (float32 order-sensitivity, SURVEY.md §5.4.3). */
  def fnArray(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      // + 0.0 kills IEEE -0.0 (sums/maxima near zero round to -0.0 vs
      // 0.0 across engines otherwise)
      (round(expr(
        "aggregate(transform(embedding, x -> cast(x as double)), 0D, (a, x) -> a + x)"),
        4) + lit(0.0)).as("vec_sum"),
      round(expr(
        "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), 0D, (a, x) -> a + x)"),
        4).as("vec_sq_sum"),
      size(expr("filter(embedding, x -> x > 0)")).as("n_positive"),
      (round(expr("cast(array_max(embedding) as double)"), 4) + lit(0.0))
        .as("vec_max"))

  /** Map family: crack events.props JSON into a typed map. */
  def fnMap(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"), lit("map<string,int>")))
      .select(
        col("event_id"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("prop_keys"),
        element_at(col("m"), "k").as("k_value"),
        size(col("m")).as("n_props"))

  /** JSON family: path extraction without full parse. */
  def fnJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k_via_path"),
      to_json(struct(col("event_type"), col("user_id"))).as("packed"))

  /** Spark 4's VARIANT surface — the open-schema semi-structured type
    * the engine parses ONCE into a binary-encoded value and then path-
    * extracts without re-parsing (vs fn_json's per-call string walk):
    * parse_json → variant_get with a target type, a missing-path probe
    * (NULL, not error), try_parse_json's null-on-garbage posture, and
    * is_variant_null. Outputs are extracted PLAIN columns (the variant
    * itself stays inside the plan — parquet-portable and oracle-
    * comparable; DuckDB replays via json_extract). At 100 TB variant
    * columns shred into parquet typed subcolumns, so the same
    * variant_get paths prune and push down like real columns. */
  def fnVariant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_long"),
      expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
      expr("variant_get(parse_json(props), '$.missing', 'bigint')")
        .as("missing_path"),
      expr("try_parse_json('not json') is null").as("garbage_is_null"),
      expr("is_variant_null(parse_json('null'))").as("json_null_detected"))

  /** Built-in data masking (`mask()` — the column-level PII redaction
    * primitive beside llm_pii_scrub's regex scrubbing: scrubbing
    * REMOVES matched spans, masking preserves FORMAT — upper → X,
    * lower → x, digit → n — so masked data still joins, sorts, and
    * length-validates downstream): default mask, custom replacement
    * chars, digit-only masking with letters kept, and a format-survival
    * length check. Oracle replays via character-class translation. */
  def fnMask(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      expr("mask(c_name)").as("masked_default"),
      expr("mask(c_name, '#', '*', '9', 'o')").as("masked_custom"),
      expr("mask(c_name, NULL, NULL, '0')").as("digits_zeroed"),
      (length(expr("mask(c_name)")) === length(col("c_name")))
        .as("format_survives"))

  /** Spark 4 COLLATION surface — string comparison semantics as a TYPE
    * property (`collate(s, 'UTF8_LCASE')`), so case-insensitive
    * grouping/joins/comparisons run inside codegen instead of wrapping
    * every reference in lower() (and, at scale, collation-aware
    * ordering feeds sort-merge joins and range partitioning directly).
    * A deterministic mixed-case column (odd keys keep the fixture's
    * upper case, even keys lower) groups under UTF8_LCASE: the case
    * variants MERGE, counted per merged class. Output keys normalize
    * through lower() so the group representative (engine-arbitrary
    * under a case-insensitive collation) never reaches the gate; the
    * oracle replays with lower()-grouping, which coincides for ASCII. */
  def fnCollation(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("seg_mixed",
        when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")))
      .groupBy(expr("collate(seg_mixed, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("seg_mixed")).as("n_case_variants"),
        min(col("c_custkey")).as("min_key"))
      .select(expr("cast(lower(k) as string)").as("segment"),
        col("n_rows"), col("n_case_variants"), col("min_key"))

  /** Spark 4 SQL PIPE syntax (`|>`) — the linear query form where each
    * stage reads top-down like the DataFrame API (FROM → WHERE →
    * EXTEND → AGGREGATE), compiled to the identical Catalyst plan as
    * the nested-SELECT equivalent; this registers a real multi-stage
    * pipe query so the surface stays covered. Exact BIGINT cents. */
  def sqlPipe(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_pipe_li")
    s.sql(
      """FROM graft_pipe_li
        ||> WHERE l_quantity >= 30
        ||> EXTEND cast(round(l_extendedprice * 100) as bigint)
        |     * (100 - cast(round(l_discount * 100) as bigint)) AS cents
        ||> AGGREGATE count(*) AS n_lines,
        |     cast(sum(cents) as bigint) AS revenue_cents
        |   GROUP BY l_returnflag
        ||> SELECT l_returnflag, n_lines, revenue_cents""".stripMargin)
  }

  /** WITH RECURSIVE (Spark 4's recursive CTE — the last §2.8 SQL-surface
    * gap after VARIANT/collation/pipe/listagg): an ancestor-chain walk,
    * parent(k) = k div 2, from every nation key down to the root 0,
    * reduced per key to chain length, step count, and the exact sum of
    * visited ids. Same WITH RECURSIVE shape on both engines (only the
    * integer-division operator differs: Spark `div`, DuckDB `//`).
    *
    * At-scale: Spark executes a recursive CTE as a driver-coordinated
    * UnionLoop — one distributed step per recursion level, each a plain
    * join/project over the previous level's output, so the scale knob is
    * DEPTH, not width: halving chains are log₂(maxkey) levels, and each
    * level's frontier shuffles on its own keys like any batch query. For
    * unbounded-depth fixpoints (connected components at 100 TB) the
    * checkpointed O(log n) contraction loop in StarContraction.scala is
    * the production shape; a recursive CTE is right when depth is small
    * and known (org charts, BOM explosions, path unrolling). The default
    * spark.sql.cteRecursionLevelLimit=100 guards runaway recursion.
    * Measured (SCALE.md r11 depth probe, 20 k-row frontier, depth
    * 8→256): wall time linear in depth with a converged ~0.095-0.10 s
    * per-level barrier floor — the number that decides CTE vs
    * contraction for a given depth. */
  def sqlRecursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("graft_rec_nation")
    s.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |         CAST(n_nationkey AS BIGINT) AS cur,
        |         CAST(0 AS BIGINT) AS depth
        |  FROM graft_rec_nation
        |  UNION ALL
        |  SELECT nk, cur div 2 AS cur, depth + 1
        |  FROM chain WHERE cur > 0)
        |SELECT nk AS n_nationkey,
        |  CAST(max(depth) AS BIGINT) AS chain_len,
        |  CAST(count(*) AS BIGINT) AS n_steps,
        |  CAST(sum(cur) AS BIGINT) AS sum_ids
        |FROM chain
        |GROUP BY nk""".stripMargin)
  }

  /** Calendar arithmetic beyond fn_date's field extraction — the
    * billing/retention/reporting date algebra: month-clamped shifts
    * (`add_months` on Jan 31 lands on Feb 28/29 — both engines clamp),
    * month-end, next-weekday (no DuckDB builtin: the oracle replays it
    * as isodow modular arithmetic), quarter/ISO-week labels, a
    * formatted year-month bucket, day-of-year, and the quarter start.
    * Deliberately EXCLUDED as cross-engine traps: `months_between`
    * (fractional, engine-specific day weighting) and
    * `timestampdiff(MONTH/WEEK)` (Spark counts full elapsed periods,
    * DuckDB's date_diff counts boundary crossings — same name, different
    * number). Per-row, codegen'd, zero-shuffle. */
  def fnDatetimeAdvanced(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("od", col("o_orderdate").cast("date"))
      .select(
        col("o_orderkey"),
        add_months(col("od"), 3).as("plus_3mo"),
        last_day(col("od")).as("month_end"),
        next_day(col("od"), "Monday").as("next_monday"),
        quarter(col("od")).as("qtr"),
        weekofyear(col("od")).as("iso_week"),
        date_format(col("od"), "yyyy-MM").as("ym"),
        dayofyear(col("od")).as("doy"),
        date_trunc("quarter", col("od")).cast("date").as("quarter_start"))

  /** Regex family beyond the single extract/replace in fn_string:
    * rlike predicate, group-2 extraction, extract-ALL (every match,
    * array-joined in match order), match counting, backreference
    * replace (Spark spells groups $1, DuckDB \\1 — each engine its own
    * dialect, same semantics), and regex-delimiter splitting. Patterns
    * stay in the RE2-compatible subset both engines agree on (no
    * lookaround, no lazy quantifiers) — the portability discipline that
    * also keeps them linear-time safe on adversarial 100 TB input. */
  def fnRegex(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      col("p_name").rlike("^[a-z]+ ").as("starts_word"),
      regexp_extract(col("p_type"), "^(\\w+) (\\w+)", 2).as("second_word"),
      expr("array_join(regexp_extract_all(p_name, '([a-z]{5,})', 1), ',')")
        .as("long_words"),
      expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
      regexp_replace(col("p_type"), "(\\w+)ED", "$1_ed").as("ed_rewritten"),
      size(split(col("p_name"), "[ -]")).as("n_fields"))

  /** Binary/codec family — the byte-level surface every export path
    * touches (content hashing for dedup manifests, base64/hex
    * transport encodings, multibyte-aware lengths): utf-8 encode →
    * base64/hex, the decode round-trip as a checked boolean, md5 +
    * sha2-256 content digests, and octet_length vs char_length on a
    * multibyte-augmented string (™ is 3 UTF-8 bytes — byte budgets and
    * character budgets diverge exactly here). Per-row, codegen'd,
    * zero-shuffle. */
  def fnBinaryCodec(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("uni", concat(col("c_name"), lit("™")))
      .select(
        col("c_custkey"),
        base64(encode(col("c_name"), "utf-8")).as("b64"),
        lower(hex(encode(col("c_name"), "utf-8"))).as("hexed"),
        (decode(unbase64(base64(encode(col("c_name"), "utf-8"))), "utf-8")
          === col("c_name")).as("b64_roundtrip"),
        md5(encode(col("c_name"), "utf-8")).as("md5_hex"),
        sha2(encode(col("c_name"), "utf-8"), 256).as("sha256_hex"),
        length(col("uni")).as("n_chars"),
        octet_length(col("uni")).as("n_bytes"))


  /** EXECUTE IMMEDIATE (Spark 4 dynamic SQL): a query held as a STRING
    * executes with positional USING parameters — the stored-procedure /
    * query-template surface (a governed platform keeps vetted SQL
    * templates as data and binds runtime arguments without string
    * splicing, which is also the injection-safe form). The inner
    * statement plans exactly like the static query — Catalyst sees the
    * final SQL, so pushdown/pruning are unaffected. */
  def sqlExecImmediate(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_ei_li")
    s.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT l_returnflag, count(*) AS n_lines,
        |     CAST(round(sum(l_quantity)) AS BIGINT) AS qty
        |   FROM graft_ei_li WHERE l_quantity >= ? GROUP BY l_returnflag'
        |  USING 30""".stripMargin)
  }

  /** Declarative SQL UDF (Spark 4 `CREATE FUNCTION … RETURN expr`) —
    * the governed way to share business logic on this engine: unlike a
    * Scala/Python UDF (an opaque black box Catalyst cannot see into),
    * a SQL UDF INLINES its body into the calling plan, so codegen,
    * constant folding, and pushdown all apply as if the analyst had
    * written the expression by hand — ScalarFnsSpec asserts the plan
    * contains no UDF invocation node. The function computes exact
    * integer discounted value (cents × discount-complement percent —
    * the price-arithmetic discipline every money oracle here uses), and
    * the query is the q1-style per-flag rollup a shared metric
    * definition exists for. TEMPORARY scope: session-local, no catalog
    * pollution, OR REPLACE idempotent per session. */
  def sqlUdf(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_udf_li")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_cp(p DOUBLE, disc DOUBLE)
        |RETURNS BIGINT
        |RETURN CAST(round(p * 100) AS BIGINT)
        |       * CAST(round((1.0 - disc) * 100) AS BIGINT)""".stripMargin)
    s.sql(
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(sum(graft_disc_cp(l_extendedprice, l_discount)) AS BIGINT)
        |    AS net_cp
        |FROM graft_udf_li GROUP BY l_returnflag""".stripMargin)
  }

  /** Declarative SQL TABLE function (Spark 4 `CREATE FUNCTION …
    * RETURNS TABLE … RETURN SELECT`) — the governed twin of a
    * parameterized view: per-customer top-2 orders exposed as a named
    * relation and consumed through correlated LATERAL. The body
    * inlines like the scalar sql_udf, and the correlated rank
    * DECORRELATES to the window + equi-join plan the hand-written
    * join_lateral op gets — a named function costs nothing over
    * inline SQL.
    *
    * ENGINE PITFALL (measured on Spark 4.1.2, pinned in
    * ScalarFnsSpec): the NATURAL body — `… ORDER BY price DESC
    * LIMIT 2` — applies the LIMIT GLOBALLY after decorrelation when
    * the function is invoked with a correlated LATERAL argument: the
    * call returns the global top-k across ALL correlation keys
    * instead of top-k per key, silently (keys outside the global
    * top-k get zero rows, no error — a plain LATERAL subquery with
    * the same LIMIT decorrelates correctly; only the SQL-function
    * inlining path mis-scopes it). The row_number-in-body form below
    * is semantically identical and decorrelates correctly — use it
    * until the upstream bug is fixed; the spec asserts BOTH facts so
    * an engine upgrade that fixes the LIMIT path surfaces as a
    * conscious spec update. */
  def sqlUdtf(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_tf_orders")
    Tables.customer(s, d).createOrReplaceTempView("graft_tf_cust")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_top_orders(ck BIGINT)
        |RETURNS TABLE(o_orderkey BIGINT, cents BIGINT)
        |RETURN SELECT o_orderkey, cents FROM (
        |  SELECT o_orderkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
        |           AS rn
        |  FROM graft_tf_orders WHERE o_custkey = ck)
        |WHERE rn <= 2""".stripMargin)
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.cents
        |FROM graft_tf_cust c, LATERAL graft_top_orders(c.c_custkey) t
        |WHERE c.c_custkey < 500""".stripMargin)
  }

  /** Named-parameter SQL (spark.sql(text, args) — the :param marker
    * API): the safe bind-variable path for programmatic SQL. Markers
    * are typed literals at plan time, so constant folding and filter
    * pushdown see the bound values exactly as if inlined. */
  def sqlParameterized(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_pp_orders")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(round(sum(o_totalprice)) AS BIGINT) AS gross
        |FROM graft_pp_orders
        |WHERE o_totalprice BETWEEN :lo AND :hi
        |GROUP BY o_orderstatus""".stripMargin,
      Map("lo" -> 1000.0, "hi" -> 200000.0))
  }

  /** IDENTIFIER() templating (Spark 4) — the injection-safe DYNAMIC
    * NAME surface completing the parameter family: sql_parameterized
    * binds VALUES, this binds the table AND the grouping column from
    * parameters (`FROM IDENTIFIER(:tbl) GROUP BY IDENTIFIER(:col)`),
    * the shape every multi-tenant / per-snapshot job template needs
    * (same vetted SQL text, different physical table per run — string
    * splicing is how SQL injection happens; IDENTIFIER resolves the
    * name through the parser as a single identifier, nothing else).
    * Names resolve at plan time, so the final plan is byte-identical
    * to the static query. */
  def sqlIdentifier(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_idf_orders")
    s.sql(
      """SELECT IDENTIFIER(:col) AS grp, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(round(sum(o_totalprice)) AS BIGINT) AS gross
        |FROM IDENTIFIER(:tbl)
        |GROUP BY IDENTIFIER(:col)""".stripMargin,
      Map("tbl" -> "graft_idf_orders", "col" -> "o_orderpriority"))
  }

  /** SQL SCRIPTING (Spark 4 BEGIN…END with session variables): a
    * multi-statement block DECLAREs a variable, derives the cutoff with
    * arithmetic SET statements, and the final SELECT — the block's
    * result — filters on it. This is the procedural-warehouse surface
    * (parameter staging, guarded maintenance scripts) executing on the
    * same engine as the declarative plan; each statement inside is a
    * normal Catalyst plan over the session state. */
  def sqlScripting(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_sc_orders")
    s.sql(
      """BEGIN
        |  DECLARE cutoff DOUBLE DEFAULT 100000.0;
        |  SET cutoff = cutoff * 3;
        |  SELECT o_orderpriority, count(*) AS n_big,
        |    CAST(round(max(o_totalprice)) AS BIGINT) AS top_price
        |  FROM graft_sc_orders
        |  WHERE o_totalprice > cutoff
        |  GROUP BY o_orderpriority;
        |END
        |""".stripMargin)
  }

  /** AES column encryption (aes_encrypt/aes_decrypt — the at-rest
    * field-level protection path for exported datasets): ECB keeps the
    * demo deterministic (same plaintext+key → same ciphertext; a real
    * deployment uses the default GCM with a random IV and accepts
    * nondeterminism). DuckDB has no AES twin, so the oracle checks the
    * derivable facts: the decrypt∘encrypt round-trip, ciphertext size =
    * PKCS#7 block count × 16, and ECB's determinism (two independent
    * encryptions byte-equal) — the property that also makes ECB leak
    * equality patterns, which is WHY production prefers GCM. */
  def fnAes(s: SparkSession, d: String): DataFrame = {
    val k = "'graftkey01234567'"
    Tables.customer(s, d).select(
      col("c_custkey"),
      expr(s"cast(aes_decrypt(aes_encrypt(c_name, $k, 'ECB'), $k, 'ECB') as string) = c_name")
        .as("roundtrip_ok"),
      expr(s"octet_length(aes_encrypt(c_name, $k, 'ECB'))").as("ct_bytes"),
      expr(s"aes_encrypt(c_name, $k, 'ECB') = aes_encrypt(c_name, $k, 'ECB')")
        .as("ecb_deterministic"),
      octet_length(col("c_name")).as("pt_bytes"))
  }

  /** Decimal money math under explicit precision/scale. Every output is
    * cast to a pinned DECIMAL type — engines widen intermediate precision
    * differently, so the declared result type must be forced on both
    * sides for the schema gate. The double fixture column is converted to
    * decimal via an exact integer-cents derivation (round(x*100) is never
    * near a .5 edge because the source is 2-decimal money), because a
    * direct double→DECIMAL(12,2) cast rounds .xx5 edge values HALF_UP in
    * Spark but half-even in DuckDB and the sums drift by a cent. */
  def fnCastDecimal(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      .withColumn("price_dec",
        (col("cents").cast(DecimalType(20, 0)) * expr("CAST(0.01 AS DECIMAL(3,2))"))
          .cast(DecimalType(12, 2)))
      .groupBy(col("o_orderstatus"))
      .agg(
        // aggregation stays exact decimal; only the FINAL projection is
        // cast to double. The gate's two readers disagree on decimal
        // stringification (pyarrow keeps Decimal('x.x0'), DuckDB's pandas
        // path floats it), so decimal-typed OUTPUT columns hash-mismatch
        // even when values are identical — observed r2/r3. Scale ≤4
        // decimals convert to the same nearest double on both engines.
        sum(col("price_dec")).cast(DecimalType(18, 2))
          .cast("double").as("sum_dec"),
        max(col("price_dec")).cast(DecimalType(12, 2))
          .cast("double").as("max_dec"),
        (sum(col("price_dec")) * expr("CAST(0.07 AS DECIMAL(3,2))"))
          .cast(DecimalType(18, 4)).cast("double").as("tax_dec"))
      .orderBy(col("o_orderstatus"))

  /** Error-tolerant function family: try_cast / try_divide return null
    * instead of failing the job — the at-scale ingestion posture, where
    * one malformed record must not kill a 100 TB pass. (DuckDB's plain
    * division already yields NULL on zero, matching try_divide.) */
  def fnTry(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      expr("try_cast(p_brand AS INT)").as("bad_cast"),          // null
      expr("try_cast(regexp_extract(p_brand, '(\\\\d+)', 1) AS INT)")
        .as("good_cast"),
      expr("try_divide(p_retailprice, p_size - p_size)").as("div_zero"), // null
      expr("try_divide(p_retailprice, p_size)").as("unit_price_raw"))
      .withColumn("unit_price", round(col("unit_price_raw"), 4))
      .drop("unit_price_raw")

  /** Bitwise family: and/or/xor/shifts/bit_count over the key space —
    * the primitives behind bitmap indexes and bloom-style membership
    * words. Spark's bit_count returns INT and DuckDB's BIGINT, so the
    * Spark side casts to long (schema gate). */
  def fnBitwise(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
      col("o_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
      col("o_orderkey").bitwiseXOR(col("o_custkey")).as("k_xor"),
      shiftleft(col("o_orderkey"), 3).as("k_shl"),
      shiftright(col("o_orderkey"), 2).as("k_shr"),
      bit_count(col("o_orderkey")).cast("long").as("k_bits"))

  /** URL family: parse_url over deterministic synthetic URLs built from
    * fixture columns (host from the market segment, path from the key,
    * query from the account balance) — the log-ingestion prelude to any
    * per-domain aggregation. DuckDB has no parse_url; the oracle
    * re-derives the same parts from ITS copy of the constructed string
    * with regexp_extract, which is exact because the inputs are
    * well-formed by construction. */
  def fnUrl(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("url", concat(
        lit("https://"), lower(col("c_mktsegment")), lit(".example.com/cust/"),
        col("c_custkey").cast("string"),
        lit("?bal="), round(col("c_acctbal") * 100, 0).cast("long").cast("string"),
        lit("&seg="), lower(col("c_mktsegment"))))
      .select(
        col("c_custkey"),
        col("url"),
        callUDF("parse_url", col("url"), lit("HOST")).as("host"),
        callUDF("parse_url", col("url"), lit("PATH")).as("path"),
        callUDF("parse_url", col("url"), lit("QUERY")).as("query"),
        callUDF("parse_url", col("url"), lit("QUERY"), lit("seg")).as("seg"))

  /** Struct family: build (named fields), nested build, dotted field
    * access through two levels, struct→JSON serialization, and whole-
    * struct equality (positional in both engines). Fields stay
    * BIGINT/VARCHAR so the JSON rendering is byte-identical cross-engine
    * (a DOUBLE field would format differently). Per-row, zero-shuffle,
    * fully codegen'd — the envelope-manipulation surface every typed
    * event pipeline leans on. */
  def fnStruct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        struct(col("o_custkey").as("ck"),
          col("o_orderstatus").as("st")).as("info"),
        struct(struct(col("o_custkey").as("k")).as("o"),
          round(col("o_totalprice") * 100, 0).cast("long").as("c"))
          .as("nested"))
      .select(
        col("o_orderkey"),
        col("info.ck").as("ck"),
        col("info.st").as("st"),
        col("nested.o.k").as("nested_k"),
        col("nested.c").as("cents"),
        to_json(col("info")).as("info_json"),
        (col("info") === struct(col("nested.o.k"),
          col("info.st"))).as("eq_rebuild"),
        (col("info") === struct(col("info.ck") + 1,
          col("info.st"))).as("eq_shifted"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_url" -> fnUrl _,
    "fn_bitwise" -> fnBitwise _,
    "fn_try" -> fnTry _,
    "fn_string" -> fnString _,
    "fn_date" -> fnDate _,
    "fn_math" -> fnMath _,
    "fn_array" -> fnArray _,
    "fn_map" -> fnMap _,
    "fn_struct" -> fnStruct _,
    "fn_json" -> fnJson _,
    "fn_variant" -> fnVariant _,
    "fn_collation" -> fnCollation _,
    "fn_mask" -> fnMask _,
    "sql_pipe" -> sqlPipe _,
    "sql_recursive_cte" -> sqlRecursiveCte _,
    "fn_regex" -> fnRegex _,
    "fn_datetime_advanced" -> fnDatetimeAdvanced _,
    "fn_binary_codec" -> fnBinaryCodec _,
    "sql_exec_immediate" -> sqlExecImmediate _,
    "sql_udf" -> sqlUdf _,
    "sql_udtf" -> sqlUdtf _,
    "sql_identifier" -> sqlIdentifier _,
    "sql_parameterized" -> sqlParameterized _,
    "sql_scripting" -> sqlScripting _,
    "fn_aes" -> fnAes _,
    "fn_cast_decimal" -> fnCastDecimal _
  )

  def oracle: Map[String, String] = Map(
    "sql_exec_immediate" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(round(sum(l_quantity)) AS BIGINT) AS qty
        |FROM lineitem WHERE l_quantity >= 30 GROUP BY l_returnflag""".stripMargin,
    // the SQL UDF body, inlined — the point of the feature
    "sql_udf" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * CAST(round((1.0 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS net_cp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // the table-function body inlined + decorrelated: per-customer
    // top-2 by (price DESC, key ASC) — DuckDB replays with QUALIFY
    "sql_udtf" ->
      """SELECT c.c_custkey, o.o_orderkey,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |FROM customer c JOIN (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) o
        |  ON o.o_custkey = c.c_custkey AND o.rn <= 2
        |WHERE c.c_custkey < 500""".stripMargin,
    // names resolved → the static query
    "sql_identifier" ->
      """SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(round(sum(o_totalprice)) AS BIGINT) AS gross
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "sql_parameterized" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(round(sum(o_totalprice)) AS BIGINT) AS gross
        |FROM orders WHERE o_totalprice BETWEEN 1000.0 AND 200000.0
        |GROUP BY o_orderstatus""".stripMargin,
    "sql_scripting" ->
      """SELECT o_orderpriority, count(*) AS n_big,
        |  CAST(round(max(o_totalprice)) AS BIGINT) AS top_price
        |FROM orders WHERE o_totalprice > 300000.0
        |GROUP BY o_orderpriority""".stripMargin,
    // AES has no DuckDB twin; the oracle checks the derivable facts
    // (round-trip TRUE, PKCS#7 padded size, ECB determinism TRUE)
    "fn_aes" ->
      """SELECT c_custkey, TRUE AS roundtrip_ok,
        |  CAST((octet_length(encode(c_name)) // 16 + 1) * 16 AS INT)
        |    AS ct_bytes,
        |  TRUE AS ecb_deterministic,
        |  CAST(octet_length(encode(c_name)) AS INT) AS pt_bytes
        |FROM customer""".stripMargin,
    "fn_datetime_advanced" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
        |  FROM orders)
        |SELECT o_orderkey,
        |  CAST(od + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
        |  last_day(od) AS month_end,
        |  CAST(od + CAST(((7 - isodow(od)) % 7 + 1) || ' days' AS INTERVAL)
        |    AS DATE) AS next_monday,
        |  CAST(quarter(od) AS INT) AS qtr,
        |  CAST(weekofyear(od) AS INT) AS iso_week,
        |  strftime(od, '%Y-%m') AS ym,
        |  CAST(dayofyear(od) AS INT) AS doy,
        |  CAST(date_trunc('quarter', od) AS DATE) AS quarter_start
        |FROM o""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
        |  regexp_extract(p_type, '^(\w+) (\w+)', 2) AS second_word,
        |  COALESCE(array_to_string(
        |    regexp_extract_all(p_name, '([a-z]{5,})', 1), ','), '')
        |    AS long_words,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
        |  regexp_replace(p_type, '(\w+)ED', '\1_ed', 'g') AS ed_rewritten,
        |  CAST(len(regexp_split_to_array(p_name, '[ -]')) AS INT) AS n_fields
        |FROM part""".stripMargin,
    "fn_binary_codec" ->
      """SELECT c_custkey,
        |  to_base64(encode(c_name)) AS b64,
        |  lower(hex(encode(c_name))) AS hexed,
        |  decode(from_base64(to_base64(encode(c_name)))) = c_name
        |    AS b64_roundtrip,
        |  md5(c_name) AS md5_hex,
        |  sha256(c_name) AS sha256_hex,
        |  CAST(length(c_name || chr(8482)) AS INT) AS n_chars,
        |  CAST(octet_length(encode(c_name || chr(8482))) AS INT) AS n_bytes
        |FROM customer""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE chain AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |         CAST(n_nationkey AS BIGINT) AS cur,
        |         CAST(0 AS BIGINT) AS depth
        |  FROM nation
        |  UNION ALL
        |  SELECT nk, cur // 2 AS cur, depth + 1
        |  FROM chain WHERE cur > 0)
        |SELECT nk AS n_nationkey,
        |  CAST(max(depth) AS BIGINT) AS chain_len,
        |  CAST(count(*) AS BIGINT) AS n_steps,
        |  CAST(sum(cur) AS BIGINT) AS sum_ids
        |FROM chain
        |GROUP BY nk""".stripMargin,
    "fn_struct" ->
      """WITH st AS (
        |  SELECT o_orderkey,
        |    struct_pack(ck := o_custkey, st := o_orderstatus) AS info,
        |    struct_pack(o := struct_pack(k := o_custkey),
        |      c := CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS nested
        |  FROM orders)
        |SELECT o_orderkey,
        |  (info).ck AS ck,
        |  (info).st AS st,
        |  (nested).o.k AS nested_k,
        |  (nested).c AS cents,
        |  to_json(info)::VARCHAR AS info_json,
        |  info = struct_pack(ck := (nested).o.k, st := (info).st)
        |    AS eq_rebuild,
        |  info = struct_pack(ck := (info).ck + 1, st := (info).st)
        |    AS eq_shifted
        |FROM st""".stripMargin,
    "fn_url" ->
      """WITH u AS (
        |  SELECT c_custkey,
        |    'https://' || lower(c_mktsegment) || '.example.com/cust/' ||
        |    c_custkey::VARCHAR || '?bal=' ||
        |    CAST(round(c_acctbal * 100) AS BIGINT)::VARCHAR ||
        |    '&seg=' || lower(c_mktsegment) AS url
        |  FROM customer)
        |SELECT c_custkey, url,
        |  regexp_extract(url, '^https://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query,
        |  regexp_extract(url, '[?&]seg=([^&]*)', 1) AS seg
        |FROM u""".stripMargin,
    "fn_bitwise" ->
      """SELECT o_orderkey,
        | o_orderkey & 255 AS k_and,
        | o_orderkey | 4096 AS k_or,
        | xor(o_orderkey, o_custkey) AS k_xor,
        | o_orderkey << 3 AS k_shl,
        | o_orderkey >> 2 AS k_shr,
        | bit_count(o_orderkey) AS k_bits
        |FROM orders""".stripMargin,
    "fn_try" ->
      """SELECT p_partkey,
        | TRY_CAST(p_brand AS INT) AS bad_cast,
        | TRY_CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS good_cast,
        | CAST(p_retailprice AS DOUBLE) / (p_size - p_size) AS div_zero,
        | round(CAST(p_retailprice AS DOUBLE) / p_size, 4) AS unit_price
        |FROM part""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        | upper(p_name) AS name_upper,
        | lower(p_brand) AS brand_lower,
        | length(p_name) AS name_len,
        | substring(p_type, 1, 7) AS type_prefix,
        | split_part(p_type, ' ', 1) AS type_first_word,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
        | lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
        | instr(p_type, 'ED') AS ed_pos
        |FROM part""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS y,
        | month(o_orderdate) AS m,
        | dayofmonth(o_orderdate) AS dom,
        | isodow(o_orderdate) - 1 AS wd_mon0,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS due_date,
        | datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |   AS days_to_2002,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice, 1) AS price_round,
        | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        | abs(l_discount - 0.05) AS disc_dev,
        | round(pow(l_quantity, 2), 4) AS qty_sq,
        | round(sqrt(l_extendedprice), 4) AS price_sqrt,
        | round(ln(l_extendedprice + 1), 4) AS price_ln,
        | l_orderkey % 7 AS key_mod7,
        | greatest(l_quantity, l_discount * 100) AS gr,
        | least(l_tax, l_discount) AS le,
        | CASE WHEN l_quantity > 25 THEN 'bulk'
        |      WHEN l_quantity > 10 THEN 'mid'
        |      ELSE 'small' END AS qty_band
        |FROM lineitem""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        | len(embedding) AS dim,
        | round(list_reduce(list_prepend(0.0::DOUBLE,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |   (a, x) -> a + x), 4) + 0.0 AS vec_sum,
        | round(list_reduce(list_prepend(0.0::DOUBLE,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |   (a, x) -> a + x), 4) AS vec_sq_sum,
        | len(list_filter(embedding, x -> x > 0)) AS n_positive,
        | round(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0 AS vec_max
        |FROM embeddings""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        | array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
        | CAST(json_extract(props, '$.k') AS INT) AS k_value,
        | len(json_keys(props)) AS n_props
        |FROM events""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        | CAST(json_extract(props, '$.k') AS INT) AS k_via_path,
        | json_object('event_type', event_type, 'user_id', user_id)::VARCHAR
        |   AS packed
        |FROM events""".stripMargin,
    // per-char CASE translation replays mask()'s class rules exactly
    // (regexp chains would re-hit replacement chars)
    "fn_mask" ->
      """WITH ch AS (
        |  SELECT c_custkey, c_name, string_split(c_name, '') AS cs
        |  FROM customer)
        |SELECT c_custkey,
        |  array_to_string([CASE
        |    WHEN x BETWEEN 'A' AND 'Z' THEN 'X'
        |    WHEN x BETWEEN 'a' AND 'z' THEN 'x'
        |    WHEN x BETWEEN '0' AND '9' THEN 'n'
        |    ELSE x END for x in cs], '') AS masked_default,
        |  array_to_string([CASE
        |    WHEN x BETWEEN 'A' AND 'Z' THEN '#'
        |    WHEN x BETWEEN 'a' AND 'z' THEN '*'
        |    WHEN x BETWEEN '0' AND '9' THEN '9'
        |    ELSE 'o' END for x in cs], '') AS masked_custom,
        |  array_to_string([CASE
        |    WHEN x BETWEEN '0' AND '9' THEN '0'
        |    ELSE x END for x in cs], '') AS digits_zeroed,
        |  TRUE AS format_survives
        |FROM ch""".stripMargin,
    "fn_collation" ->
      """WITH m AS (
        |  SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
        |              ELSE c_mktsegment END AS seg_mixed, c_custkey
        |  FROM customer)
        |SELECT lower(seg_mixed) AS segment,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT seg_mixed) AS BIGINT) AS n_case_variants,
        |  CAST(min(c_custkey) AS BIGINT) AS min_key
        |FROM m GROUP BY lower(seg_mixed)""".stripMargin,
    "sql_pipe" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE l_quantity >= 30
        |GROUP BY l_returnflag""".stripMargin,
    "fn_variant" ->
      """SELECT event_id,
        | CAST(json_extract(props, '$.k') AS BIGINT) AS k_long,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_path,
        | TRUE AS garbage_is_null,
        | TRUE AS json_null_detected
        |FROM events""".stripMargin,
    "fn_cast_decimal" ->
      """WITH p AS (
        | SELECT o_orderstatus,
        |   CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(20,0))
        |     * CAST(0.01 AS DECIMAL(3,2)) AS price_dec
        | FROM orders)
        |SELECT o_orderstatus,
        | CAST(CAST(sum(price_dec) AS DECIMAL(18,2)) AS DOUBLE) AS sum_dec,
        | CAST(CAST(max(CAST(price_dec AS DECIMAL(12,2))) AS DECIMAL(12,2))
        |   AS DOUBLE) AS max_dec,
        | CAST(CAST(sum(price_dec) * CAST(0.07 AS DECIMAL(3,2)) AS DECIMAL(18,4))
        |   AS DOUBLE) AS tax_dec
        |FROM p GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
