package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per SURVEY §2.3 item
  * plus the training-data pipeline operators); `oracleSql` carries the
  * DuckDB-equivalent SQL for every hash-checkable query. Column names and
  * row order match between the two by construction (total ORDER BY,
  * identical aliases).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_agg_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Pipeline.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.TextOps.queries ++ operators.Multimodal.queries ++
      operators.Ingest.queries ++ streaming.StreamingQueries.queries ++
      streaming.StatefulSession.queries ++ operators.Bucketed.queries ++
      operators.Sampling.queries ++ operators.Sketches.queries ++
      operators.Layout.queries ++ operators.Retrieval.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++ operators.Pipeline.oracleSql ++
      operators.Dedup.oracleSql ++ operators.Similarity.oracleSql ++
      operators.TextOps.oracleSql ++ operators.Multimodal.oracleSql ++
      operators.Ingest.oracleSql ++ streaming.StreamingQueries.oracleSql ++
      streaming.StatefulSession.oracleSql ++ operators.Bucketed.oracleSql ++
      operators.Sampling.oracleSql ++ operators.Sketches.oracleSql ++
      operators.Layout.oracleSql ++ operators.Retrieval.oracleSql
}
