package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Shared parquet table loader for the testdata star schema. */
object Tables {

  /** The store family's path-keying hash: an 8-byte md5 fragment of the
    * data dir (NOT `hashCode` — see DedupIndex.root's collision note).
    * One definition so the keying scheme has one place to change. */
  private[graft] def dirHash(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** Projection normalizing generation-dependent timestamp physical types
    * to session-local TIMESTAMP, or None when the schema is already clean
    * (the common case — avoid inserting a no-op Project over every scan).
    *
    * Two generator variants exist in the wild:
    *  - TIMESTAMP(NANOS), which Spark only reads as raw longs (sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong=true`); converted via
    *    integer division — a double round-trip would lose precision at
    *    1e18 nanos, and the testdata's nanos are exact multiples of 1000
    *    so micros are lossless.
    *  - TIMESTAMP(MICROS) without the isAdjustedToUTC annotation, which
    *    Spark reads as TIMESTAMP_NTZ. NTZ is rejected by event-time
    *    watermarks, `unix_micros`, and the as-of operators' long-backed
    *    key contract, so it is cast to TIMESTAMP here. Sessions run with
    *    `spark.sql.session.timeZone=UTC`, making the cast a pure
    *    re-annotation of the same wall-clock instant — the DuckDB oracle
    *    (naive timestamps throughout) sees identical values either way.
    */
  private def tsFixup(schema: StructType): Option[Seq[Column]] = {
    val needsFix = schema.fields.exists(f =>
      f.dataType == TimestampNTZType || (f.name == "ts" && f.dataType == LongType))
    if (!needsFix) None
    else Some(schema.fields.toSeq.map { f =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          timestamp_micros(expr(s"${f.name} div 1000")).as(f.name)
        case TimestampNTZType => col(f.name).cast(TimestampType).as(f.name)
        case _ => col(f.name)
      }
    })
  }

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    tsFixup(df.schema).map(df.select(_: _*)).getOrElse(df)
  }

  /** The same fixup for a streaming DataFrame (schema known up front). */
  def streamTsFixup(df: DataFrame): DataFrame =
    tsFixup(df.schema).map(df.select(_: _*)).getOrElse(df)
}
