package graft

import graft.exec.Geo

/** LatLonPoint analogue: box semantics (inclusive bounds, dateline
  * split), distance filter and nearest-k vs an independent JVM
  * haversine evaluation.
  */
class GeoSpec extends SparkTest {
  import spark.implicits._

  private lazy val pts: Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(33)
    (0L until 500L).map(i =>
      (i, rnd.nextDouble() * 180d - 90d, rnd.nextDouble() * 360d - 180d))
  }
  private lazy val df = spark.createDataset(pts).toDF("id", "lat", "lon")

  private def naiveMeters(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lon2 - lon1) / 2
    val h = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon) * math.sin(dLon)
    2 * Geo.EarthRadiusMeters * math.asin(math.sqrt(h))
  }

  test("boxFilter: inclusive bounds; dateline-crossing box unions the ranges") {
    val fixed = spark.createDataset(Seq(
      (1L, 10d, -20d), (2L, 40d, 30d), (3L, 25d, 0d), // on-bound + interior
      (4L, 9.99, 0d), (5L, 40.01, 0d), (6L, 25d, 30.01), // just outside
      (7L, 0d, 170d), (8L, 0d, -170d), (9L, 0d, 0d) // dateline cases
    )).toDF("id", "lat", "lon")
    val in = Geo.boxFilter(fixed, $"lat", $"lon", 10, 40, -20, 30)
      .select($"id").as[Long].collect().toSet
    assert(in == Set(1L, 2L, 3L))
    // minLon > maxLon crosses the dateline: lon >= 150 OR lon <= -150
    val cross = Geo.boxFilter(fixed, $"lat", $"lon", -10, 10, 150, -150)
      .select($"id").as[Long].collect().toSet
    assert(cross == Set(7L, 8L))
  }

  test("distanceFilter == naive haversine radius") {
    val (qLat, qLon, r) = (48.8566, 2.3522, 3.0e6)
    val exp = pts.filter { case (_, la, lo) => naiveMeters(qLat, qLon, la, lo) <= r }
      .map(_._1).toSet
    val got = Geo.distanceFilter(df, $"lat", $"lon", qLat, qLon, r)
      .select($"id").as[Long].collect().toSet
    assert(got == exp && got.nonEmpty)
  }

  test("nearestK == naive ranking on rounded meters, id tie-break") {
    val (qLat, qLon) = (-12.5, 130.9)
    val exp = pts.map { case (id, la, lo) =>
      (id, math.floor(naiveMeters(qLat, qLon, la, lo) + 0.5).toLong)
    }.sortBy { case (id, m) => (m, id) }.take(10)
    val got = Geo.nearestK(df, $"lat", $"lon", $"id", qLat, qLon, 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == exp, s"\n got=$got\n exp=$exp")
  }
}
