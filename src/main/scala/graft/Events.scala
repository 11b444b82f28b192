package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The one reader for the events table, tolerant of the timestamp physical
  * type the generator happened to use (it has shipped both TIMESTAMP(NANOS)
  * and TIMESTAMP(MICROS, isAdjustedToUTC=false) across data drops):
  *
  *  - nanos → read as long (`nanosAsLong`), truncate with integer `div`
  *    (double division of epoch-nanos ≈ 1.7e18 would lose precision > 2^53)
  *    and rebuild a micro timestamp;
  *  - micros NTZ → cast TIMESTAMP_NTZ → TIMESTAMP (sessions run UTC, so the
  *    wall-clock instant is unchanged and `unix_micros`/watermarks work);
  *  - already TIMESTAMP → pass through.
  *
  * The `nanosAsLong` switch is SESSION-GLOBAL and consulted during schema
  * inference at `spark.read` time; with suites sharing one session across
  * threads, a set-then-restore in one thread can land mid-inference in
  * another. So set → infer → restore is a critical section and every
  * events read goes through this lock.
  */
object Events {
  private val lock = new Object

  /** Any OTHER parquet read, routed through the same lock: schema
    * inference in a sibling thread must never land inside an events
    * read's set → infer → restore window and see `nanosAsLong=true`
    * (r7 advice — latent only while no other table ships nanos, but the
    * lock closes the window outright and costs one uncontended monitor
    * acquisition per table open).
    */
  def readTable(s: SparkSession, path: String): DataFrame =
    lock.synchronized(s.read.parquet(path))

  def read(s: SparkSession, dir: String): DataFrame = lock.synchronized {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }
}
