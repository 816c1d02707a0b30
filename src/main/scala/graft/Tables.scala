package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * per-table parquet from it. Reads are plain `spark.read.parquet` so that
  * Catalyst handles column pruning + predicate pushdown into the scan — at
  * 100 TB the scan is the dominant cost and must only read the referenced
  * columns / row groups.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` arrives in one of two layouts depending on how the driver
    * generated the parquet, so the loader is SCHEMA-ADAPTIVE:
    *
    *  - parquet TIMESTAMP(MICROS/MILLIS) → Spark reads `TimestampType`
    *    directly; use the column as-is (current testdata layout).
    *  - parquet TIMESTAMP(NANOS) → Spark's vectorized reader rejects it
    *    unless `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    *    [[Sessions.builder]]), under which the column arrives as epoch-nanos
    *    `LongType`; convert to microsecond TimestampType with *floor*
    *    integer division — epoch-nanos exceeds 2^53 (float math would
    *    corrupt it) and `div` truncates toward zero, which mis-rounds
    *    pre-1970 values.
    *
    * Branching on the arriving type (not a config flag) means a future
    * regeneration in either layout keeps every events consumer working;
    * any other type fails loudly here rather than as a confusing
    * DATATYPE_MISMATCH deep inside a query. TablesSpec covers both
    * branches via a committed nanos-layout fixture.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", tsTimestamp(df.schema))
    }
  }

  /** Expression normalizing the raw `ts` field of an events-shaped schema
    * (ANY supported layout) to a `TimestampType` column. Shared by the
    * batch loader above and the streaming readers in
    * [[graft.streaming.StreamingQueries]] / StatefulSession, whose
    * `readStream.schema(...)` sources see the same raw layouts.
    */
  def tsTimestamp(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    schema("ts").dataType match {
      case TimestampType => col("ts")
      case TimestampNTZType =>
        // session TZ is pinned UTC, so NTZ micros == UTC instant micros
        col("ts").cast(TimestampType)
      case LongType => timestamp_micros(tsMicros(schema))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected TIMESTAMP " +
          "(micros/ntz) or legacy nanos-as-long")
    }
  }

  /** Same, to epoch-MICROS long (q42's typed session state keys on it). */
  def tsMicros(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    schema("ts").dataType match {
      case TimestampType => unix_micros(col("ts"))
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case LongType =>
        // exact floor division on longs: floor(ns / 1000) — epoch-nanos
        // exceeds 2^53 (float math would corrupt it) and `div` truncates
        // toward zero, which mis-rounds pre-1970 values
        when(col("ts") >= 0, expr("ts div 1000"))
          .otherwise(expr("(ts - 999) div 1000"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected TIMESTAMP " +
          "(micros/ntz) or legacy nanos-as-long")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Shared determinism helpers for the DuckDB-oracle contract (SURVEY §2.3):
  * every query totally ordered, double aggregates rounded to 4 decimals,
  * timestamps rendered as strings.
  *
  * Double SUM/AVG over many rows is order-sensitive; at sf0.1 the float
  * accumulation error can exceed the 1e-4 round granularity. We therefore
  * sum through DECIMAL(38,10) (exact, associative — identical in Spark and
  * DuckDB regardless of partial-aggregation order) and cast back to double
  * only at the end. This also keeps map-side partial aggregation safe at
  * cluster scale.
  */
object Q {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{DecimalType, DoubleType}

  /** Exact decimal-backed SUM of a double column, rounded to 4 IN THE
    * DECIMAL DOMAIN, then cast to double. Rounding the exact decimal is
    * half-away-from-zero in both engines; rounding the double cast
    * instead would hit the engine-divergent double-round path (Spark
    * rounds the shortest decimal repr, DuckDB the binary value) whenever
    * the sum's 10-decimal tail lands exactly on a 4dp half-way point.
    */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(38, 10))), 4).cast(DoubleType)

  /** Exact decimal-backed AVG (sum/count) rounded HALF-AWAY-FROM-ZERO to
    * 4dp, computed entirely in integer arithmetic so the result is
    * bit-portable across engines. A double division (the previous form)
    * risks the engine-divergent double-round path whenever the true
    * quotient lands on/near a 4dp half-way point; decimal division can't
    * fix it because the engines' decimal-division scale rules differ.
    * Instead, with S the exact decimal sum (scale 10) and n the count:
    *
    *   round(S/n, 4) = sign(S) * floor(|S|*10^4/n + 1/2) / 10^4
    *                 = sign(S) * ((2*|S|*10^10 + n*10^6) div (2n*10^6)) / 10^4
    *
    * where every operand of the `div` is an exact integer (|S|*10^10 is
    * integral because S has scale 10). Integer division is identical in
    * both engines, and the final /10000.0 is the SAME IEEE long→double
    * divide on the SAME integer in both engines (not exact — 2.3333 has
    * no exact binary form — but bit-identical by construction); no
    * engine-specific decimal-rounding step remains.
    *
    * Domain: |mean| < 9.2e14 (the 4dp quotient must fit the BIGINT that
    * Spark's `div` returns) and |S| < 1e17 (DECIMAL(27,10)). Both cliffs
    * fail LOUDLY (DavgDomainSpec pins them): the |S| bound throws via the
    * ANSI decimal cast, and the |mean| bound is guarded with raise_error
    * below — without the guard, `div`'s long conversion WRAPS silently
    * and a larger-scale run would surface the corruption as an oracle
    * hash mismatch instead of an error naming the contract. DuckDB's
    * HUGEINT path computes past both bounds, so "loud" is the only safe
    * divergence mode. Far outside any real aggregate here (values
    * ~1e0..1e5, rows ≤ 1e7 at the 10× stress scale).
    */
  def davg(c: Column): Column = {
    // DECIMAL(27,10) keeps |S|*10^10 inside precision 38 in BOTH engines
    // (DuckDB converts to DOUBLE past 38 — exactness would be lost);
    // bounds |S| < 10^17, ample for every davg consumer.
    val s = sum(c.cast(DecimalType(38, 10))).cast(DecimalType(27, 10))
    val n = count(c).cast(DecimalType(20, 0))
    val a = abs(s) * lit(10000000000L) // |S|*10^10 — exact integer value
    val r = call_function("div", a * 2 + n * lit(1000000L), n * lit(2000000L))
    val rg = when(abs(s) <= n * lit(920000000000000L), r).otherwise(
      call_function("raise_error",
        lit("davg domain overflow: |mean| >= 9.2e14 — the 4dp quotient " +
          "exceeds BIGINT; widen the davg contract before trusting results"))
        .cast("long"))
    (when(s < 0, -rg).otherwise(rg).cast(DoubleType) / 10000.0d)
  }

  /** DuckDB-side equivalents of dsum/davg (string SQL fragments). */
  def sqlDsum(expr: String): String =
    s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,10))), 4) AS DOUBLE)"
  def sqlDavg(expr: String): String = {
    val s = s"CAST(SUM(CAST(($expr) AS DECIMAL(38,10))) AS DECIMAL(27,10))"
    val a = s"CAST(abs($s) * CAST(10000000000 AS DECIMAL(11,0)) AS HUGEINT)"
    val n = s"CAST(COUNT($expr) AS HUGEINT)"
    s"(CASE WHEN $s < 0 THEN -1 ELSE 1 END * " +
      s"((2 * $a + $n * 1000000) // ($n * 2000000))) / 10000.0"
  }

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' string (session TZ pinned UTC). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
  /** Timestamp → 'yyyy-MM-dd' date string. */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
