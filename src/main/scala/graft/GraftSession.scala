package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's recommended configuration: UTC session
  * time, AQE with skew handling, shuffle parallelism sized to the
  * environment, and all graft extensions (native functions + planner
  * strategy) installed.
  *
  * At cluster scale the same settings apply — only `master` and the
  * shuffle-partition count change (rule of thumb: 2–3× total cores, or
  * let AQE coalesce from a higher initial number).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      // INT96 (the Spark default) is deprecated and reads back as ns in
      // arrow-based tooling; int64 micros is the portable representation
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Factory sessions get planning-time scale screening out of the box:
      // error-severity PlanLint findings (partition-less corpus windows,
      // unhinted cartesians, repartition(1) funnels) log once per distinct
      // plan. Escape hatch: `.config("spark.graft.lint", "off")` after
      // this builder (or at runtime via spark.conf.set) — later wins.
      // `enforce` stays opt-in.
      .config("spark.graft.lint", "warn")
      // RocksDB-backed streaming state: bounded memory for large keyed
      // state (sessionization/dedup at 100 TB), incremental checkpoints.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")

  /** Build and finish wiring (extension injection needs the config path;
    * runtime registration covers externally-built sessions too). */
  def create(master: String, shufflePartitions: Int): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    plans.GraftFunctions.register(spark)
    plans.TopKPerGroup.install(spark)
    spark
  }
}
