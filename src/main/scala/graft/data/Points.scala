package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark side of the deterministic lineitem→point derivation. Twin of
  * [[graft.oracle.OracleSql.pointsCte]]: integer arithmetic then a single
  * exact double division — bit-identical in both engines.
  */
object Points {
  def apply(spark: SparkSession, dir: String): DataFrame =
    derive(spark.read.parquet(s"$dir/lineitem.parquet"))

  /** The derivation itself, applicable to ANY lineitem-shaped frame —
    * batch reads and streaming sources share this one definition so the
    * magic constants exist exactly once. */
  def derive(li: DataFrame): DataFrame =
    li.select(
      (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
      (((col("l_orderkey") * 7919 + col("l_linenumber") * 104729) % 180000L) / lit(1000.0) - 90.0).as("lat"),
      (((col("l_partkey") * 7919 + col("l_suppkey") * 337 + col("l_orderkey")) % 360000L) / lit(1000.0) - 180.0).as("lon"))
}
