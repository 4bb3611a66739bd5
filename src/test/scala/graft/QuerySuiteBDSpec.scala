package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geometry
import graft.functions.HashKernels
import graft.operators.{ImportSpec, PointCloud}

/** End-to-end drive of the reference's B suite (scripts/query_210m.json
  * B1-B12: the A shapes at scale plus XL-two-holes, polyline-buffer
  * polygon, and the maxz/minz rect refinements) and D suite
  * (scripts/query_23090m.json D1-D7, D15-D21: XL / EMPTY / narrow
  * rects, XL circle, and the three declared-but-never-implemented NN
  * queries) — the spec files are read VERBATIM and dispatched through
  * [[QueryRunner.runOne]], exactly the reference CLI path (X27).
  *
  * The cloud is a deterministic ~400k-point synthetic over the same
  * AHN2-coordinate domain the suites query (dense B window, sparse
  * D-wide scatter, a strip under D21's 1-unit-wide rect, and NOTHING
  * inside D16's rect so "empty" stays a real assertion). Every result
  * is compared against a DRIVER-SIDE brute force over the raw points:
  * plain arithmetic for rects/circles/z-refinements, the
  * property-tested Geometry kernel for polygons, k-smallest squared
  * distances for NN — multiset equality on (x, y, z), not just counts.
  */
class QuerySuiteBDSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val scriptsDir = "/root/reference/scripts"
  private def haveScripts =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(scriptsDir))

  private def h(i: Long, salt: Long): Long =
    HashKernels.lehmer3(i * 1000003L + salt)

  /** (x, y, z) raw points: dense B window + sparse D-domain scatter
    * (D16's rect excluded) + a strip under the D21 narrow rect. */
  private lazy val raw: Array[(Long, Long, Double)] = {
    val pts = Array.newBuilder[(Long, Long, Double)]
    var i = 0L
    while (i < 300000L) { // dense B window
      pts += ((84000L + h(i, 1) % 3200L, 445000L + h(i, 2) % 4200L,
        (h(i, 3) % 40L - 10L).toDouble))
      i += 1
    }
    while (i < 380000L) { // sparse D-wide scatter
      val x = 63000L + h(i, 1) % 35500L
      val y = 427000L + h(i, 2) % 46000L
      // keep D16_XL_RECT_EMPTY genuinely empty
      if (!(x >= 67195L && x <= 67538L && y >= 464486L && y <= 464887L))
        pts += ((x, y, (h(i, 3) % 40L - 10L).toDouble))
      i += 1
    }
    while (i < 383000L) { // D21 narrow-rect strip (x = 98000)
      pts += ((98000L, 448990L + h(i, 2) % 23630L,
        (h(i, 3) % 40L - 10L).toDouble))
      i += 1
    }
    pts.result()
  }

  private lazy val cloud = PointCloud.importPoints(
    raw.toSeq.toDF("x", "y", "z").selectExpr(
      "CAST(x AS DOUBLE) AS x", "CAST(y AS DOUBLE) AS y", "z"),
    ImportSpec(name = "bd", targetPointsPerBlock = Some(256)))

  /** Brute-force truth for one suite entry over the raw points. */
  private def bruteForce(spec: JsonNode): Array[(Long, Long, Double)] = {
    val g = spec.get("geometry")
    val base: Array[(Long, Long, Double)] = spec.get("mode").asText() match {
      case "bbox" =>
        val (x0, x1, y0, y1) =
          (g.get(0).asDouble(), g.get(1).asDouble(),
            g.get(2).asDouble(), g.get(3).asDouble())
        raw.filter(p => p._1 >= x0 && p._1 <= x1 && p._2 >= y0 && p._2 <= y1)
      case "circle" =>
        val (cx, cy, r) = (g.get(0).get(0).asDouble(),
          g.get(0).get(1).asDouble(), g.get(1).asDouble())
        raw.filter { p =>
          val dx = p._1 - cx; val dy = p._2 - cy
          dx * dx + dy * dy <= r * r
        }
      case "polygon" =>
        val poly = Geometry.parseWktPolygon(g.asText())
        val bb = poly.bbox
        raw.filter(p => p._1 >= bb.xMin && p._1 <= bb.xMax &&
          p._2 >= bb.yMin && p._2 <= bb.yMax &&
          poly.contains(p._1.toDouble, p._2.toDouble))
      case "nn" =>
        val (px, py) = (g.get(0).asDouble(), g.get(1).asDouble())
        val k = if (spec.has("k")) spec.get("k").asInt() else 1000
        raw.sortBy { p =>
          val dx = p._1 - px; val dy = p._2 - py
          (dx * dx + dy * dy, p._1, p._2, p._3)
        }.take(k)
    }
    val withMax = if (spec.has("maxz"))
      base.filter(_._3 <= spec.get("maxz").asDouble()) else base
    if (spec.has("minz")) withMax.filter(_._3 >= spec.get("minz").asDouble())
    else withMax
  }

  private def runSuite(file: String, expectNonEmpty: Set[String],
      expectEmpty: Set[String]): Unit = {
    val root = new ObjectMapper().readTree(new java.io.File(s"$scriptsDir/$file"))
    root.get("queries").properties().forEach { e =>
      val (name, spec) = (e.getKey, e.getValue)
      val truth = bruteForce(spec)
      val got = QueryRunner.runOne(cloud, spec)
        .select("x", "y", "z").collect()
        .map(r => (r.getDouble(0).toLong, r.getDouble(1).toLong, r.getDouble(2)))
      if (spec.get("mode").asText() == "nn") {
        // NN tie-break is engine-defined; compare the squared-distance
        // multiset (ties at the k-boundary swap freely)
        val g = spec.get("geometry")
        val (px, py) = (g.get(0).asDouble(), g.get(1).asDouble())
        def d2s(a: Array[(Long, Long, Double)]) = a.map { p =>
          val dx = p._1 - px; val dy = p._2 - py; dx * dx + dy * dy
        }.sorted.toSeq
        assert(got.length == truth.length, s"$name: ${got.length} rows")
        assert(d2s(got) == d2s(truth), s"$name: distance multiset mismatch")
      } else {
        assert(got.sorted.toSeq == truth.sorted.toSeq,
          s"$name: ${got.length} rows vs brute ${truth.length}")
      }
      if (expectNonEmpty(name))
        assert(got.nonEmpty, s"$name expected rows, fixture too sparse")
      if (expectEmpty(name))
        assert(got.isEmpty, s"$name expected EMPTY, got ${got.length}")
    }
  }

  test("B suite (query_210m.json B1-B12) verbatim, brute-force checked") {
    assume(haveScripts, "reference scripts not present")
    runSuite("query_210m.json",
      expectNonEmpty = Set("B1_S_RCT", "B2_L_RCT", "B3_S_CRC", "B4_M_CRC",
        "B5_S_SIMP_POLY", "B6_L_COMP_POLY_HOLE", "B7_M_DG_RCT",
        "B8_XL_POLYGON_2_HOLES", "B9_S_POLYLINE_BUFFER", "B10_S_RECT_MAXZ",
        "B11_S_RECT_MINZ", "B12_L_RECT_MINZ"),
      expectEmpty = Set.empty)
  }

  test("D suite (query_23090m.json D1-D21) verbatim, brute-force checked") {
    assume(haveScripts, "reference scripts not present")
    runSuite("query_23090m.json",
      expectNonEmpty = Set("D1_S_RCT", "D2_L_RCT", "D15_XL_RECT",
        "D17_XL_CIRC", "D18_NN_1000", "D19_NN_5000", "D20_NN_1000_river",
        "D21_L_NARROW_RECT"),
      expectEmpty = Set("D16_XL_RECT_EMPTY"))
  }

  test("C suite polyline-buffer shapes (query_2201m.json C13/C14) verbatim") {
    assume(haveScripts, "reference scripts not present")
    runSuite("query_2201m.json",
      expectNonEmpty = Set("C1_S_RCT", "C2_L_RCT"),
      expectEmpty = Set.empty)
  }
}
