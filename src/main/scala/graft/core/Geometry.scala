package graft.core

/** Axis-aligned bounding box over (possibly fractional) grid coordinates. */
final case class Bbox(xMin: Double, xMax: Double, yMin: Double, yMax: Double) {
  require(xMin <= xMax && yMin <= yMax, s"degenerate bbox $this")
  def intersects(o: Bbox): Boolean =
    !(o.xMax < xMin || o.xMin > xMax || o.yMax < yMin || o.yMin > yMax)
  def containsBox(o: Bbox): Boolean =
    o.xMin >= xMin && o.xMax <= xMax && o.yMin >= yMin && o.yMax <= yMax
  def contains(x: Double, y: Double): Boolean =
    x >= xMin && x <= xMax && y >= yMin && y <= yMax
}

final case class Circle(cx: Double, cy: Double, r: Double) {
  require(r >= 0, s"negative radius $r")
  /** Enclosing bbox (reference pipeline/retrieve_data.py:46-51). */
  def bbox: Bbox = Bbox(cx - r, cx + r, cy - r, cy + r)
  def contains(x: Double, y: Double): Boolean =
    (x - cx) * (x - cx) + (y - cy) * (y - cy) <= r * r
}

/** Polygon with optional interior rings (holes). Rings are packed
  * coordinate arrays [x0,y0,x1,y1,...]; first ring is the shell.
  * Containment is the even-odd (ray casting) rule over all rings, which
  * handles holes with no special casing — mirroring the intent of the
  * reference's ST_Within refinement (pipeline/retrieve_data.py:65-83).
  * Boundary semantics: points exactly on an edge are NOT guaranteed
  * either way (ST_Within excludes the boundary; test fixtures avoid
  * on-edge sample points, see FIXTURES.md).
  */
final case class Polygon(rings: Array[Array[Double]]) {
  require(rings.nonEmpty && rings.forall(r => r.length >= 6 && r.length % 2 == 0),
    "polygon needs >=1 ring of >=3 points")

  /** Enclosing bbox of the shell (reference retrieve_data.py:65-71
    * takes min/max of the exterior ring only). */
  def bbox: Bbox = {
    val shell = rings(0)
    var xMin = shell(0); var xMax = shell(0)
    var yMin = shell(1); var yMax = shell(1)
    var i = 2
    while (i < shell.length) {
      val x = shell(i); val y = shell(i + 1)
      if (x < xMin) xMin = x; if (x > xMax) xMax = x
      if (y < yMin) yMin = y; if (y > yMax) yMax = y
      i += 2
    }
    Bbox(xMin, xMax, yMin, yMax)
  }

  def contains(x: Double, y: Double): Boolean = Geometry.pointInRings(x, y, rings)
}

object Geometry {

  /** Even-odd ray cast across all rings (static so Catalyst-generated
    * code can call it directly; see graft.functions.PointInPolygon). */
  def pointInRings(x: Double, y: Double, rings: Array[Array[Double]]): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      var j = n - 1
      while (i < n) {
        val xi = ring(2 * i); val yi = ring(2 * i + 1)
        val xj = ring(2 * j); val yj = ring(2 * j + 1)
        if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
          inside = !inside
        j = i
        i += 1
      }
      r += 1
    }
    inside
  }

  /** Minimal WKT parser for LINESTRING (x y, x y, ...) — the shape the
    * query suites buffer into corridor selections (polyline-buffer
    * queries, scripts/query_210m.json / query_2201m.json). Returns
    * packed [x0,y0,x1,y1,...]. */
  def parseWktLinestring(wkt: String): Array[Double] = {
    val s = wkt.trim
    require(s.toUpperCase.startsWith("LINESTRING"),
      s"only LINESTRING WKT supported, got: ${s.take(30)}")
    val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')')).trim
    val pts = body.split(",").map(_.trim).filter(_.nonEmpty)
    require(pts.length >= 2, s"linestring needs >= 2 points: ${s.take(60)}")
    val packed = new Array[Double](pts.length * 2)
    var k = 0
    pts.foreach { p =>
      val xy = p.split("\\s+")
      require(xy.length >= 2, s"bad WKT coordinate '$p'")
      packed(k) = xy(0).toDouble
      packed(k + 1) = xy(1).toDouble
      k += 2
    }
    packed
  }

  /** Minimal WKT parser for POLYGON ((...)[, (...)...]) — the only
    * geometry the reference consumes (shapely loads of query-spec WKT,
    * pipeline/retrieve_data.py:5,67; suites use simple polygons and
    * polygons with 1-2 holes, scripts/query_210m.json). */
  def parseWktPolygon(wkt: String): Polygon = {
    val s = wkt.trim
    val upper = s.toUpperCase
    require(upper.startsWith("POLYGON"), s"only POLYGON WKT supported, got: ${s.take(30)}")
    val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')')).trim
    // body = "(x y, x y, ...), (x y, ...)" — split on ring boundaries
    val ringStrs = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = -1
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '(' => depth += 1; if (depth == 1) start = i + 1
        case ')' => depth -= 1; if (depth == 0) ringStrs += body.substring(start, i)
        case _ =>
      }
      i += 1
    }
    require(ringStrs.nonEmpty, s"no rings in WKT: ${s.take(60)}")
    val rings = ringStrs.map { rs =>
      val pts = rs.split(",").map(_.trim).filter(_.nonEmpty)
      val packed = new Array[Double](pts.length * 2)
      var k = 0
      pts.foreach { p =>
        val xy = p.split("\\s+")
        require(xy.length >= 2, s"bad WKT coordinate '$p'")
        packed(k) = xy(0).toDouble
        packed(k + 1) = xy(1).toDouble
        k += 2
      }
      packed
    }.toArray
    Polygon(rings)
  }
}
