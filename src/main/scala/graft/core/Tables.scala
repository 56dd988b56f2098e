package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All tables are plain parquet under `<sfDir>/<name>.parquet`. Loading is
  * always lazy/declarative — filters and projections applied downstream are
  * pushed into the parquet scan by Catalyst, so these loaders impose zero
  * overhead regardless of scale factor (sf0.001 locally, 100 TB on a real
  * cluster).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Schema-adaptive events loader. The driver has generated `events.ts` as
    * both parquet TIMESTAMP(NANOS) (older testdata) and TIMESTAMP(MICROS)
    * (current testdata, loads as TIMESTAMP_NTZ) — so the loader branches on
    * the dtype it actually finds and exposes ONE canonical time contract
    * that every downstream consumer must use instead of touching `ts` raw:
    *
    *   - `t_us: Long`       — microseconds since epoch (exact-integer time
    *                          arithmetic, engine-independent: DuckDB's
    *                          `epoch_us(ts)` truncates ns→µs identically);
    *   - `ts_micros`        — proper TIMESTAMP for window/watermark ops.
    *
    * Nanos layout: Spark 4 rejects TIMESTAMP(NANOS) by default
    * (PARQUET_TYPE_ILLEGAL); `spark.sql.legacy.parquet.nanosAsLong` reads it
    * as a raw long (ordering on the long == DuckDB's ns ordering), then
    * `div 1000` truncates toward the same µs DuckDB's epoch_us produces.
    * Micros layout: the NTZ→TIMESTAMP cast is the identity instant because
    * every session here pins `spark.sql.session.timeZone=UTC`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    canonicalEventTime(load(s, d, "events"))
  }

  /** Applies the canonical time contract to a raw events-shaped frame.
    * Works on batch AND streaming frames (pure column derivation, no
    * action), so file-source streaming tests reuse the exact batch logic.
    */
  def canonicalEventTime(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>                       // nanos-as-long layout
        raw.withColumn("t_us", expr("ts div 1000"))
          .withColumn("ts_micros", timestamp_micros(col("t_us")))
      case TimestampType | TimestampNTZType => // micros-timestamp layout
        val m = col("ts").cast(TimestampType)
        raw.withColumn("t_us", unix_micros(m))
          .withColumn("ts_micros", m)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected LongType nanos " +
            "or Timestamp[NTZ] micros) — testdata schema drifted again; " +
            "extend Tables.canonicalEventTime for the new layout")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Local session used by tests and ad-hoc mains. Mirrors the builder
    * prompt's local[32] contract: shuffle partitions sized to cores, AQE on
    * (skew-join + coalesce shuffle partitions come free at real scale).
    */
  def localSession(appName: String, cores: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bounded-state aggregates (CollectTopK top-k heaps: ≤k tiny rows
      // per key) must stay in the hash path — the default threshold
      // (128 KEYS) would flip ObjectHashAggregate to sort-based
      // aggregation on any real group count, re-paying the full-input
      // sort the aggregate exists to avoid. Per-partition state here is
      // keys × k × ~100 B — megabytes at millions of keys — so a high
      // key threshold is safe; a 100 TB deployment sets the same conf.
      // Session-wide, this also disables the valve for every OTHER
      // ObjectHashAggregate; audited safe: every collect_list in the
      // suite is bounded per key by construction (vector dim,
      // paragraphs-per-doc, events-per-session) and every `percentile`
      // groups by ≤ tens of keys — no unbounded-per-key object-hash
      // aggregate runs at high key counts in these sessions.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
