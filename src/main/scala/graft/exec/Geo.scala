package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo point predicates — the LatLonPoint query surface
  * (`core/document/LatLonPoint.java:220` newBoxQuery, `:296`
  * newDistanceQuery) over plain lat/lon double columns.
  *
  * The reference indexes points in a BKD tree and prunes by cell; the
  * Spark-native analogue is lat/lon as leading parquet sort/partition
  * columns so row-group min/max stats prune box comparisons at the scan
  * (the comparisons are ordinary pushable predicates). Distance is the
  * haversine formula on the mean earth radius 6 371 008.7714 m — the
  * same constant as the reference (`core/util/SloppyMath.java:209`
  * TO_METERS); the reference evaluates it with table-driven sloppy
  * sin/cos approximations where this uses exact libm (a declared,
  * strictly-more-precise divergence).
  *
  * Distance expressions are built from codegen'd Catalyst functions
  * (radians/sin/cos/asin/sqrt) — no UDF in the hot path — and rank on
  * integer-rounded meters (+ key asc) so a cross-engine oracle
  * reproduces every cutoff exactly.
  */
object Geo {
  /** Mean earth radius in meters (`SloppyMath.java:209` TO_METERS). */
  val EarthRadiusMeters = 6371008.7714d

  /** Haversine distance in meters between a point column pair and a
    * fixed query point, as one deterministic double expression.
    */
  def haversineMeters(lat: Column, lon: Column, qLat: Double, qLon: Double): Column = {
    val dLat = radians(lat - lit(qLat)) / 2d
    val dLon = radians(lon - lit(qLon)) / 2d
    val h = sin(dLat) * sin(dLat) +
      cos(radians(lit(qLat))) * cos(radians(lat)) * sin(dLon) * sin(dLon)
    lit(2d * EarthRadiusMeters) * asin(sqrt(h))
  }

  /** `LatLonPoint.newBoxQuery` semantics: inclusive bounds; a box whose
    * minLon > maxLon crosses the dateline and matches the UNION of the
    * two longitude ranges (`LatLonPoint.java:240-254` splits the same
    * way).
    */
  def boxFilter(df: DataFrame, lat: Column, lon: Column,
      minLat: Double, maxLat: Double, minLon: Double, maxLon: Double): DataFrame = {
    val latIn = lat >= minLat && lat <= maxLat
    val lonIn =
      if (minLon <= maxLon) lon >= minLon && lon <= maxLon
      else lon >= minLon || lon <= maxLon // dateline crossing
    df.filter(latIn && lonIn)
  }

  /** `LatLonPoint.newDistanceQuery`: points within `radiusMeters` of
    * (qLat, qLon), haversine-inclusive.
    */
  def distanceFilter(df: DataFrame, lat: Column, lon: Column,
      qLat: Double, qLon: Double, radiusMeters: Double): DataFrame =
    df.filter(haversineMeters(lat, lon, qLat, qLon) <= radiusMeters)

  /** Nearest-k (`LatLonDocValuesField.newDistanceSort` /
    * `LatLonPointPrototypeQueries.nearest`): ranked by whole-meter
    * rounded distance asc then `key` asc — the rounding makes the
    * cutoff reproducible across engines; per-partition partial top-k
    * (TakeOrderedAndProject), k rows to the driver.
    */
  def nearestK(df: DataFrame, lat: Column, lon: Column, key: Column,
      qLat: Double, qLon: Double, k: Int): DataFrame = {
    val meters = floor(haversineMeters(lat, lon, qLat, qLon) + 0.5d).cast("long")
    df.select(key.as("key"), meters.as("meters"))
      .orderBy(asc("meters"), asc("key"))
      .limit(k)
  }
}
