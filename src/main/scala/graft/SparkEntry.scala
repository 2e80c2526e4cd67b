package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query surface lives in [[Queries]]; this object only
  * adapts it to the driver's Map-based interface.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The fact_media_engagement aggregate (SURVEY §3.3 step 4 /
    * §7.2 minimum slice). */
  def entry(spark: SparkSession): DataFrame =
    Queries.all.find(_.name == "fact_engagement").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — EVERY query has one. The five ops whose
    * output is engine-specific (xxhash64 MinHash/SimHash pair sets,
    * LSH/IVF candidate sets, LSH recall) are deterministic for the
    * fixed sf0.01 corpus, so their oracles are frozen VALUES tables;
    * their semantic invariants stay gated separately as constant-0
    * oracle rows (dedup_minhash_precision, dedup_simhash_invariants,
    * sim_score_check, the coverage floors and the recall gate). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
