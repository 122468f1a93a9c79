package graft.substrait

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import model.Plan

/** SQL / DataFrame ↔ Substrait protobuf bytes ↔ file.
  *
  * Rebuild of the reference serializer (src/serializer.rs:12-33): SQL string →
  * host-engine plan → Substrait → encoded bytes on disk, and back. Both
  * `spark.sql` and DataFrame-API queries serialize identically because both
  * yield the same analyzed Catalyst plan (SURVEY.md §3, entry point 3).
  */
object Serializer {

  def serialize(sql: String, spark: SparkSession, path: String): Unit =
    serializeDf(spark.sql(sql), path)

  def serializeDf(df: DataFrame, path: String): Unit =
    Files.write(Paths.get(path), toBytes(df))

  def toBytes(df: DataFrame): Array[Byte] = Wire.encode(Producer.produce(df))

  def deserialize(path: String): Plan =
    Wire.decode(Files.readAllBytes(Paths.get(path)))

  def fromBytes(bytes: Array[Byte]): Plan = Wire.decode(bytes)

  /** Full round-trip: DataFrame → Substrait bytes → DataFrame. The returned
    * frame is rebuilt purely from the wire representation; Catalyst
    * re-optimizes and re-plans it from scratch.
    */
  def roundtrip(spark: SparkSession, df: DataFrame): DataFrame =
    Consumer.consume(spark, fromBytes(toBytes(df)))
}
