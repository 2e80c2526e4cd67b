package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Expression-throughput micro-benchmark — the harness behind the
  * SCALE.md numbers for the custom Catalyst expressions, where the
  * registered sf0.1 queries are too overhead-dominated to resolve a
  * per-row-loop change (a 5k×64-dim corpus scores in milliseconds;
  * plan/shuffle setup is the measurement).
  *
  * Builds a deterministic wide synthetic scan (`--rows N --dims D`,
  * default 2M×256: arrays derived from the row id, no data files, no
  * shuffle) and times `sum(cosine_sim)` + `sum(dot_long)` full scans,
  * min-of-3 with GC settling (the [[Bench]] discipline). Usage:
  * `scripts/run_class.sh graft.Microbench [rows] [dims]`. */
object Microbench {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(2L * 1000 * 1000)
    val dims = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic per-row arrays: a_i = ((id*dims+i) % 97) / 10.0
    val base = spark.range(rows).select(col("id"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "i -> cast((id * " + dims + " + i) % 97 as double) / 10.0)")
        .as("a"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "i -> cast((id * " + dims + " + i * 7) % 89 as double) / 10.0)")
        .as("b"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "i -> cast((id + i) % 1000 as bigint))").as("qa"),
      expr(s"transform(sequence(0, ${dims - 1}), " +
        "i -> cast((id + i * 3) % 1000 as bigint))").as("qb"))
    // materialize the arrays BEFORE timing — transform(sequence(...))
    // is an interpreted HOF whose generation cost would otherwise
    // swamp the scoring loop under measure
    base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    def time(label: String, run: () => Unit): Unit = {
      val t = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(100)
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-12s $t%.3f s  (${rows / t / 1e6}%.1f M rows/s)")
    }
    import graft.functions.HashExprs
    time("cosine_sim", () => base
      .agg(sum(HashExprs.cosineF(col("a"), col("b")))).collect())
    time("dot_long", () => base
      .agg(sum(HashExprs.dotLong(col("qa"), col("qb")))).collect())
    spark.stop()
  }
}
