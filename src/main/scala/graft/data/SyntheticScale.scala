package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic testdata-shaped table generator at ARBITRARY scale — the
 * round-5 decade-scaling experiment's data source (VERDICT r4 next #1:
 * "measure, don't argue, the scale story"). The driver's parquet testdata
 * tops out at sf0.1; every 100× claim in the suite was structural until
 * this generator let the expensive query family run at 10× that size on
 * the same box.
 *
 * Same construction discipline as [[CorpusGenerator]]: `spark.range` →
 * `xxhash64` → closed-form transforms, no UDFs, no RNG state — row i is a
 * pure function of i, so generation is itself an embarrassingly parallel
 * codegen scan and any slice re-generates identically anywhere.
 *
 * Shapes mirror `/root/testdata/sf*` (TESTDATA.md): `documents`
 * (doc_id, text, lang, source, n_chars — ~31-word vocabulary, 10–100
 * words/doc, 20 source blocks, 5-language mix) with PLANTED near-duplicate
 * pairs (~0.2% of docs append one word to their predecessor — Jaccard
 * ≈ 0.97, found by both MinHash-LSH and the exact joins), `embeddings`
 * (vec_id, 64-dim float list, 10 labels — per-label centers + noise, so
 * IVF lists are non-degenerate), and the `orders`/`lineitem` columns the
 * reroute gates consume. Scale 1 ≈ sf0.1 row counts; scale 10 = one decade
 * up.
 */
object SyntheticScale {

  /** The testdata documents vocabulary family (~31 distinct words). */
  private val Vocab = Array("spark", "column", "line", "part", "scan",
    "fast", "query", "agg", "table", "hash", "slow", "value", "filter",
    "customer", "stream", "key", "group", "the", "order", "window", "join",
    "small", "vector", "batch", "sort", "a", "or", "plan", "shuffle",
    "cache", "row")

  private val Langs = Array("en", "zh", "es", "fr", "de")

  /** u(cols) ~ Uniform[0,1), a pure function of the hashed columns. */
  private def u(cols: Column*): Column =
    (xxhash64(cols: _*).cast("double") / lit(1.8446744073709552E19)) + lit(0.5)

  /** documents: `n` rows shaped like testdata's table. Every doc_id with
    * id % 500 == 1 is a planted near-dup of id − 1 (same word sequence
    * plus one appended word). */
  def documents(spark: SparkSession, n: Long, parts: Int): DataFrame = {
    val vocabLit = lit(Vocab)
    // zipf-ish word index via |V|^u (the CorpusGenerator skew family)
    def wordAt(bid: Column, j: Column): Column = element_at(vocabLit,
      least(lit(Vocab.length),
        pow(lit(Vocab.length.toDouble), u(bid, j, lit(13))).cast("int")))
    spark.range(0L, n, 1L, parts)
      .withColumn("bid",
        when(pmod(col("id"), lit(500)) === 1, col("id") - 1)
          .otherwise(col("id")))
      .withColumn("nw",
        (pmod(xxhash64(col("bid"), lit(11)), lit(91)) + 10).cast("int"))
      .withColumn("base_text",
        array_join(transform(sequence(lit(1), col("nw")),
          j => wordAt(col("bid"), j)), " "))
      .withColumn("text",
        when(pmod(col("id"), lit(500)) === 1,
          concat(col("base_text"), lit(" spark")))
          .otherwise(col("base_text")))
      .select(
        col("id").as("doc_id"),
        col("text"),
        element_at(lit(Langs), (least(lit(4),
          floor(-log(u(col("id"), lit(17))) / lit(0.9))) + 1).cast("int"))
          .as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  /** embeddings: `n` rows, 64-dim float lists over 10 label clusters —
    * per-label deterministic center + hash noise, so nearest-neighbor
    * structure (and IVF list occupancy) is real, not isotropic. */
  def embeddings(spark: SparkSession, n: Long, parts: Int): DataFrame =
    spark.range(0L, n, 1L, parts)
      .withColumn("label", pmod(xxhash64(col("id"), lit(21)), lit(10)).cast("int"))
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (sin((col("label") + 1).cast("double") * (d + 1).cast("double") * lit(0.7))
            * lit(0.4)
            + (u(col("id"), d, lit(23)) - lit(0.5)) * lit(0.6)).cast("float"))
          .as("embedding"),
        col("label"))

  /** orders: the columns q62 consumes (key arithmetic + totalprice) plus
    * the priority/date columns the relational joins (q102/q103) filter on.
    * The pre-existing columns keep their exact round-6 derivations so the
    * committed decade measurements stay comparable. */
  def orders(spark: SparkSession, n: Long, parts: Int): DataFrame = {
    val prios = typedLit(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW"))
    val t0 = lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
    val spanUs = 2500L * 24 * 3600 * 1000000 // the lineitem shipdate span
    spark.range(0L, n, 1L, parts)
      .select(
        col("id").as("o_orderkey"),
        pmod(xxhash64(col("id"), lit(31)), lit(1000000)).as("o_custkey"),
        (pmod(xxhash64(col("id"), lit(32)), lit(9000000)).cast("double")
          / lit(100.0) + lit(1000.0)).as("o_totalprice"),
        element_at(prios,
          (pmod(xxhash64(col("id"), lit(33)), lit(5)) + 1).cast("int"))
          .as("o_orderpriority"),
        element_at(typedLit(Seq("F", "O", "P")),
          (pmod(xxhash64(col("id"), lit(36)), lit(3)) + 1).cast("int"))
          .as("o_orderstatus"),
        timestamp_micros(unix_micros(t0) +
          pmod(xxhash64(col("id"), lit(34)), lit(spanUs))).as("o_orderdate"))
  }

  /** customer: the dimension side of the Q3-shaped joins. FIXED size — a
    * dense c_custkey covering orders' whole o_custkey domain — because at
    * 100 TB the fact tables decade up while dimension cardinality barely
    * moves; the measured exponents then read the fact-side cost, which is
    * the term that matters. */
  def customer(spark: SparkSession, parts: Int): DataFrame = {
    val segs = typedLit(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY"))
    spark.range(0L, 1000000L, 1L, parts)
      .select(
        col("id").as("c_custkey"),
        element_at(segs,
          (pmod(xxhash64(col("id"), lit(35)), lit(5)) + 1).cast("int"))
          .as("c_mktsegment"),
        pmod(xxhash64(col("id"), lit(37)), lit(25)).as("c_nationkey"))
  }

  /** region/nation/supplier: the snowflake dimensions q116 walks — fixed
    * size like [[customer]] (dims don't decade with facts); supplier
    * covers lineitem's whole l_suppkey domain. */
  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0L, "AFRICA"), (1L, "AMERICA"), (2L, "ASIA"), (3L, "EUROPE"),
      (4L, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame =
    spark.range(0L, 25L)
      .select(col("id").as("n_nationkey"),
        concat(lit("NATION_"), col("id")).as("n_name"),
        (col("id") % 5).as("n_regionkey"))

  def supplier(spark: SparkSession, parts: Int): DataFrame =
    spark.range(0L, 10000L, 1L, parts)
      .select(col("id").as("s_suppkey"),
        pmod(xxhash64(col("id"), lit(38)), lit(25)).as("s_nationkey"))

  /** lineitem: the columns q63/q90/q100 consume. ~4 lines per order; the
    * TPC-H detail columns (quantity/discount/tax/flags/shipdate) follow
    * the testdata shapes so the Q1 rollup's group structure survives the
    * decade. */
  def lineitem(spark: SparkSession, n: Long, parts: Int): DataFrame = {
    val flags = typedLit(Seq("A", "N", "R"))
    val stats = typedLit(Seq("F", "O"))
    val t0 = lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
    val spanUs = 2500L * 24 * 3600 * 1000000 // ~1995→2001, the testdata span
    spark.range(0L, n, 1L, parts)
      .select(
        pmod(xxhash64(col("id"), lit(41)), lit(math.max(1L, n / 4))).as("l_orderkey"),
        (pmod(xxhash64(col("id"), lit(42)), lit(7)) + 1).as("l_linenumber"),
        pmod(xxhash64(col("id"), lit(43)), lit(10000)).as("l_suppkey"),
        pmod(xxhash64(col("id"), lit(44)), lit(200000)).as("l_partkey"),
        (pmod(xxhash64(col("id"), lit(45)), lit(9000000)).cast("double")
          / lit(100.0) + lit(900.0)).as("l_extendedprice"),
        (pmod(xxhash64(col("id"), lit(46)), lit(50)) + 1).cast("double")
          .as("l_quantity"),
        (pmod(xxhash64(col("id"), lit(47)), lit(11)).cast("double")
          / lit(100.0)).as("l_discount"),
        (pmod(xxhash64(col("id"), lit(48)), lit(9)).cast("double")
          / lit(100.0)).as("l_tax"),
        element_at(flags,
          (pmod(xxhash64(col("id"), lit(49)), lit(3)) + 1).cast("int"))
          .as("l_returnflag"),
        element_at(stats,
          (pmod(xxhash64(col("id"), lit(50)), lit(2)) + 1).cast("int"))
          .as("l_linestatus"),
        timestamp_micros(unix_micros(t0) +
          pmod(xxhash64(col("id"), lit(55)), lit(spanUs))).as("l_shipdate"))
  }

  /** events: the columns the sessionize family (q54/q57/q75) and the
    * attribution join (q93) consume — testdata shape (sf0.1 ≈ 100k rows /
    * 1500 users / a 30-day span / 5 uniform event types), so the 10× table
    * holds the 30-day span and users·density both grow (sessions-per-user
    * and per-user click→purchase rates stay realistic while state size
    * scales). */
  def events(spark: SparkSession, n: Long, users: Long, parts: Int): DataFrame = {
    val spanUs = 30L * 24 * 3600 * 1000000
    val t0 = lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val types = typedLit(Seq("view", "click", "purchase", "signup", "error"))
    spark.range(0L, n, 1L, parts)
      .select(
        col("id").as("event_id"),
        timestamp_micros(unix_micros(t0) +
          pmod(xxhash64(col("id"), lit(51)), lit(spanUs))).as("ts"),
        pmod(xxhash64(col("id"), lit(52)), lit(users)).as("user_id"),
        element_at(types,
          (pmod(xxhash64(col("id"), lit(53)), lit(5)) + 1).cast("int"))
          .as("event_type"),
        (pmod(xxhash64(col("id"), lit(54)), lit(10000)).cast("double")
          / lit(100.0)).as("value"))
  }

  /** Generate the full table set for `scale` (1 ≈ sf0.1 shape) under
    * `dir`, skipping tables that already exist (idempotent re-runs). */
  def writeAll(spark: SparkSession, dir: String, scale: Int): Unit = {
    val parts = spark.sparkContext.defaultParallelism
    val tables: Seq[(String, () => DataFrame)] = Seq(
      "documents" -> (() => documents(spark, 5000L * scale, parts)),
      "embeddings" -> (() => embeddings(spark, 2000L * scale, parts)),
      "orders" -> (() => orders(spark, 150000L * scale, parts)),
      "customer" -> (() => customer(spark, parts)),
      "region" -> (() => region(spark)),
      "nation" -> (() => nation(spark)),
      "supplier" -> (() => supplier(spark, parts)),
      "lineitem" -> (() => lineitem(spark, 600000L * scale, parts)),
      "events" -> (() => events(spark, 100000L * scale, 1500L * scale, parts)))
    tables.foreach { case (name, build) =>
      val path = s"$dir/$name.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists())
        build().write.mode("overwrite").parquet(path)
    }
  }
}
