package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * These play the role of the reference's statement/lexicon relations as the
  * raw relational surface (reference: SPORelation,
  * bigdata-rdf/src/java/com/bigdata/rdf/spo/SPORelation.java:128): a columnar
  * scan with Catalyst predicate pushdown replaces the B+Tree covering-index
  * key-range scan (AccessPath.java:114).
  *
  * Scale posture: each table is a plain parquet directory; at 100 TB the same
  * call reads a partitioned/bucketed layout — no code change, since all
  * downstream operators are declarative DataFrame plans.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config required to read the driver's parquet: `events.ts` is
    * TIMESTAMP(NANOS), which Spark only reads as a long (nanos since epoch).
    * `load` converts it back to a timestamp column.
    */
  val requiredConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer division keeps full precision (double math would lose
      // bits on ~1e18-ns epoch values)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (for spark.sql surfaces/tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
