package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Density / tile aggregation — the reference's DensityIterator +
 * SurfaceAggregatingIterator (geomesa-core/.../iterators/DensityIterator
 * .scala:45-228, GridSnap.scala:29-107) re-expressed as a partial/final
 * hash aggregation: snap every row to a WxH grid cell over a bbox, count
 * (or max) per cell. Spark's map-side combine IS the reference's
 * per-tablet partial aggregation.
 */
object Density {

  /** Snap expressions use only IEEE-exact ops (+, /, *, floor) so the
   *  DuckDB oracle reproduces cell assignment bit-for-bit. */
  def snapX(lon: Column, xmin: Double, xmax: Double, w: Int): Column =
    floor((lon - xmin) / (xmax - xmin) * w).cast("long")
  def snapY(lat: Column, ymin: Double, ymax: Double, h: Int): Column =
    floor((lat - ymin) / (ymax - ymin) * h).cast("long")

  /** 2-D heat grid: count per (cellX, cellY) for rows inside the bbox
   *  (reference A1). */
  def grid(df: DataFrame, lon: Column, lat: Column,
           xmin: Double, ymin: Double, xmax: Double, ymax: Double,
           w: Int, h: Int): DataFrame =
    df.filter(lon >= xmin && lon < xmax && lat >= ymin && lat < ymax)
      .groupBy(
        snapX(lon, xmin, xmax, w).as("cell_x"),
        snapY(lat, ymin, ymax, h).as("cell_y"))
      .agg(count(lit(1)).as("n"))

  /** Temporal density (reference A2, TemporalDensityIterator/TimeSnap):
   *  count per time bucket. */
  def temporal(df: DataFrame, ts: Column, bucket: String): DataFrame =
    df.groupBy(date_trunc(bucket, ts).as("bucket")).agg(count(lit(1)).as("n"))

  /** Surface tile (reference A8, SurfaceAggregatingIterator): max of a
   *  value per grid cell — the WMS-tile aggregation. */
  def surface(df: DataFrame, lon: Column, lat: Column, value: Column,
              xmin: Double, ymin: Double, xmax: Double, ymax: Double,
              w: Int, h: Int): DataFrame =
    df.filter(lon >= xmin && lon < xmax && lat >= ymin && lat < ymax)
      .groupBy(
        snapX(lon, xmin, xmax, w).as("cell_x"),
        snapY(lat, ymin, ymax, h).as("cell_y"))
      .agg(max(value).as("v"))
}
