package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Bbox, Circle}
import graft.operators.{BlockedCloud, ImportSpec, PointCloud}

/** The reference's query surface (suites A/B/C/D, scripts/query_*.json)
  * over a deterministic point cloud synthesized from lineitem so DuckDB
  * can run the same selection as plain arithmetic SQL (FIXTURES.md §A):
  * integer grid, no float boundary flakiness.
  */
object PointCloudQueries {

  /** Deterministic synthetic (x, y, z) — must stay textually in lockstep
    * with the `pts` CTE in [[ptsCte]]. */
  def rawPoints(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.table(spark, dir, "lineitem").select(
      ((col("l_orderkey") * 17 + col("l_linenumber") * 131) % 8192)
        .cast("double").as("x"),
      ((col("l_partkey") * 29 + col("l_suppkey") * 197) % 8192)
        .cast("double").as("y"),
      col("l_quantity").as("z"))

  private val ptsCte =
    "WITH pts AS (SELECT (l_orderkey * 17 + l_linenumber * 131) % 8192 AS x, " +
      "(l_partkey * 29 + l_suppkey * 197) % 8192 AS y, " +
      "ROUND(l_quantity, 2) AS z FROM lineitem)"

  /** Import once per test dir, persist sorted blocks + metadata to a
    * local cache, and reopen lazily — queries then scan stats-bearing
    * parquet exactly as a long-lived deployment would.
    *
    * Weakly keyed by session identity; `BlockedCloud` strongly holds
    * its session, so values are kept behind a `SoftReference` (else the
    * value chain would pin the weak key forever — the WeakHashMap
    * self-reference pitfall). One entry per source dir, replaced when
    * the source fingerprint changes. */
  private val openClouds =
    new java.util.WeakHashMap[SparkSession,
      java.util.HashMap[String, (String, java.lang.ref.SoftReference[BlockedCloud])]]()

  def cloud(spark: SparkSession, dir: String): BlockedCloud = synchronized {
    // the on-disk cache path fingerprints the source CONTENT (the
    // recursive part-file walk — a bare size+mtime of the path misses
    // in-place part rewrites of directory-shaped parquet) —
    // regenerated test data must never serve a stale cache
    val fp = DatasetFingerprint.of(s"$dir/lineitem.parquet")
    val cacheDir =
      s"/tmp/graft_pc_cache/${dir.replaceAll("[^A-Za-z0-9.]", "_")}_$fp"
    var m = openClouds.get(spark)
    if (m == null) {
      m = new java.util.HashMap[String, (String, java.lang.ref.SoftReference[BlockedCloud])]()
      openClouds.put(spark, m)
    }
    val cur = m.get(dir)
    if (cur != null && cur._1 == cacheDir) {
      val open = cur._2.get()
      if (open != null) return open
    }
    if (!Files.exists(Paths.get(s"$cacheDir/meta/_SUCCESS"))) {
      // head 12 / tail 14 on the 8192 grid: 4096 quadtree cells of
      // 128x128 — healthy block occupancy at bench scale (~150 pts/blk
      // at sf0.1) instead of the degenerate 1-pt blocks a 0.7 ratio
      // yields on sparse data; cell size 128 is pinned in the
      // pc_histogram oracle
      val c = PointCloud.importPoints(rawPoints(spark, dir),
        ImportSpec(name = "li_pts", ratio = 12.0 / 26))
      PointCloud.write(c, cacheDir)
    }
    val bc = PointCloud.read(spark, cacheDir)
    m.put(dir, (cacheDir, new java.lang.ref.SoftReference(bc)))
    bc
  }

  /** 3D-keyed cloud cache (same fingerprint discipline as [[cloud]]):
    * z participates in the Morton key, so height-selective queries
    * prune at the scan. */
  private val openClouds3 =
    new java.util.WeakHashMap[SparkSession,
      java.util.HashMap[String, (String, java.lang.ref.SoftReference[graft.operators.BlockedCloud3])]]()

  def cloud3(spark: SparkSession, dir: String): graft.operators.BlockedCloud3 =
    synchronized {
      val fp = DatasetFingerprint.of(s"$dir/lineitem.parquet")
      val cacheDir =
        s"/tmp/graft_pc3_cache/${dir.replaceAll("[^A-Za-z0-9.]", "_")}_$fp"
      var m = openClouds3.get(spark)
      if (m == null) {
        m = new java.util.HashMap[String, (String, java.lang.ref.SoftReference[graft.operators.BlockedCloud3])]()
        openClouds3.put(spark, m)
      }
      val cur = m.get(dir)
      if (cur != null && cur._1 == cacheDir) {
        val open = cur._2.get()
        if (open != null) return open
      }
      if (!Files.exists(Paths.get(s"$cacheDir/meta/_SUCCESS"))) {
        val c = graft.operators.PointCloud3.importPoints(
          rawPoints(spark, dir), name = "li_pts3", zDenom = 100.0, ratio = 0.5)
        graft.operators.PointCloud3.write(c, cacheDir)
      }
      val bc = graft.operators.PointCloud3.read(spark, cacheDir)
      m.put(dir, (cacheDir, new java.lang.ref.SoftReference(bc)))
      bc
    }

  /** Query results as (x: long, y: long, z: double) on the integer grid. */
  private def xyz(df: DataFrame): DataFrame =
    df.select(col("x").cast("long").as("x"), col("y").cast("long").as("y"), col("z"))

  // Geometry fixtures (FIXTURES.md §A; shapes mirror suite classes
  // small/large/empty/narrow rect, circle, polygon, polygon-with-hole,
  // maxz/minz, knn — scripts/query_20m.json A1-A7, query_210m.json B10-B12,
  // query_23090m.json D16/D18-D21)
  private val bboxSmall = Bbox(1000, 1300, 2000, 2300)
  private val bboxLarge = Bbox(512, 4096, 512, 4096)
  private val bboxEmpty = Bbox(9000, 9500, 9000, 9500)
  private val bboxNarrow = Bbox(4000, 4001, 0, 8191)
  private val circle = Circle(3000.5, 3000.5, 200.3)
  private val polySimpleWkt = // L-shaped: SQL-expressible as two rectangles
    "POLYGON ((500.5 500.5, 3000.5 500.5, 3000.5 1500.5, 1500.5 1500.5, " +
      "1500.5 3000.5, 500.5 3000.5, 500.5 500.5))"
  private val polyHoleWkt =
    "POLYGON ((1000.5 1000.5, 4000.5 1000.5, 4000.5 4000.5, 1000.5 4000.5, 1000.5 1000.5), " +
      "(2000.5 2000.5, 3000.5 2000.5, 3000.5 3000.5, 2000.5 3000.5, 2000.5 2000.5))"
  // B-suite XL shell with TWO holes (scripts/query_210m.json)
  private val poly2HolesWkt =
    "POLYGON ((500.5 500.5, 4500.5 500.5, 4500.5 4500.5, 500.5 4500.5, 500.5 500.5), " +
      "(1000.5 1000.5, 1800.5 1000.5, 1800.5 1800.5, 1000.5 1800.5, 1000.5 1000.5), " +
      "(2500.5 2500.5, 3500.5 2500.5, 3500.5 3500.5, 2500.5 3500.5, 2500.5 2500.5))"
  // A7's diagonal thin rectangle as a polygon: a 45-degree box whose
  // rotated axes u = x+y, v = x-y have half-integer bounds, so no
  // integer grid point can sit on an edge (boundary-exclusion safe) and
  // the oracle is two BETWEENs on u and v
  private val polyDiagWkt =
    "POLYGON ((1750 2250.5, 2050 2550.5, 2550.5 2050, 2250.5 1750, 1750 2250.5))"
  // C13/C14-style diagonal polyline corridor; round-cap exact distance
  private val polylineWkt =
    "LINESTRING (500.5 3500.5, 2000.5 2000.5, 3500.5 3000.5)"
  private val polylineR = 150.25

  /** Per-segment round-cap distance predicate, rendered token-parallel
    * to [[graft.operators.BlockedCloud.polylineBufferQuery]]'s Column
    * tree (same literals, same operation order) so DuckDB's IEEE
    * doubles round identically to Spark's. All fixture constants are
    * exactly representable (halves/quarters), so DuckDB's
    * decimal-literal -> double conversions are exact. */
  private def polylineBufferSql(line: Array[Double], r: Double): String = {
    val segs = (0 until line.length / 2 - 1).map { s =>
      (line(2 * s), line(2 * s + 1), line(2 * s + 2), line(2 * s + 3))
    }
    segs.map { case (ax, ay, bx, by) =>
      val dxc = bx - ax; val dyc = by - ay
      val len2 = dxc * dxc + dyc * dyc
      val t = s"GREATEST(0.0, LEAST(1.0, ((CAST(x AS DOUBLE) - $ax) * $dxc + " +
        s"(CAST(y AS DOUBLE) - $ay) * $dyc) / $len2))"
      s"((CAST(x AS DOUBLE) - ($t * $dxc + $ax)) * (CAST(x AS DOUBLE) - ($t * $dxc + $ax)) + " +
        s"(CAST(y AS DOUBLE) - ($t * $dyc + $ay)) * (CAST(y AS DOUBLE) - ($t * $dyc + $ay)) <= ${r * r})"
    }.mkString("(", " OR ", ")")
  }

  /** Batch-kNN probe set: spread across the grid (D18-D20 declare nn
    * queries at scattered points; the reference never implemented them). */
  private val knnBatchQueries: Seq[(Long, Double, Double)] = Seq(
    (1L, 3000.5, 3000.5), (2L, 1000.25, 5000.75), (3L, 7000.5, 500.5))

  private def bboxSql(b: Bbox): String =
    s"x BETWEEN ${b.xMin.toLong} AND ${b.xMax.toLong} AND y BETWEEN ${b.yMin.toLong} AND ${b.yMax.toLong}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pc_bbox_small" -> ((s, d) => xyz(cloud(s, d).bboxQuery(bboxSmall))),
    "pc_bbox_large" -> ((s, d) => xyz(cloud(s, d).bboxQuery(bboxLarge))),
    "pc_bbox_empty" -> ((s, d) => xyz(cloud(s, d).bboxQuery(bboxEmpty))),
    "pc_bbox_narrow" -> ((s, d) => xyz(cloud(s, d).bboxQuery(bboxNarrow))),
    "pc_circle" -> ((s, d) => xyz(cloud(s, d).circleQuery(circle))),
    "pc_poly_simple" -> ((s, d) => xyz(cloud(s, d).polygonQuery(polySimpleWkt))),
    "pc_poly_hole" -> ((s, d) => xyz(cloud(s, d).polygonQuery(polyHoleWkt))),
    "pc_poly_2holes" -> ((s, d) => xyz(cloud(s, d).polygonQuery(poly2HolesWkt))),
    "pc_poly_diag" -> ((s, d) => xyz(cloud(s, d).polygonQuery(polyDiagWkt))),
    "pc_polyline_buffer" -> ((s, d) =>
      xyz(cloud(s, d).polylineBufferQuery(polylineWkt, polylineR))),
    "pc_bbox_maxz" -> ((s, d) => {
      val c = cloud(s, d); xyz(c.withMaxZ(c.bboxQuery(bboxLarge), 25.0))
    }),
    "pc_bbox_minz" -> ((s, d) => {
      val c = cloud(s, d); xyz(c.withMinZ(c.bboxQuery(bboxLarge), 10.0))
    }),
    "pc_knn" -> ((s, d) => xyz(cloud(s, d).knn(3000.5, 3000.5, 100))),
    "pc_knn_batch" -> ((s, d) =>
      cloud(s, d).knnBatch(knnBatchQueries, 50)
        .select(col("qid"), col("x").cast("long").as("x"),
          col("y").cast("long").as("y"), col("z"))),
    "pc_histogram" -> ((s, d) => cloud(s, d).histogram),
    "pc_metadata" -> ((s, d) => {
      val m = cloud(s, d).metadataDf
      m.select(col("pointCount").as("point_count"),
        col("xMin").cast("long").as("x_min"), col("xMax").cast("long").as("x_max"),
        col("yMin").cast("long").as("y_min"), col("yMax").cast("long").as("y_max"),
        col("zMin").as("z_min"), col("zMax").as("z_max"))
    }),
    // LAS binary sink -> source roundtrip (S10 -> S2): export the
    // synthetic points to a .las file (pf3/v1.2/scale 0.1), read it
    // back distributed, emit the 0.1-grid integer coordinates
    "pc_las_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_las_rt_${d.replaceAll("[^A-Za-z0-9.]", "_")}.las"
      graft.sources.Las.writePoints(rawPoints(s, d), path)
      graft.sources.Las.readPoints(s, path)
        .select(round(col("x") * 10).cast("long").as("x10"),
          round(col("y") * 10).cast("long").as("y10"),
          round(col("z") * 10).cast("long").as("z10"))
    }),
    // LASzip binary sink -> source roundtrip: same contract through the
    // compressed container (chunked arithmetic coding, POINT10 v2) —
    // the format the reference reads via laspy+lazrs
    "pc_laz_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_laz_rt_${d.replaceAll("[^A-Za-z0-9.]", "_")}.laz"
      graft.sources.Laz.writePoints(rawPoints(s, d), path, chunkPoints = 10000)
      graft.sources.Laz.readPoints(s, path)
        .select(round(col("x") * 10).cast("long").as("x10"),
          round(col("y") * 10).cast("long").as("y10"),
          round(col("z") * 10).cast("long").as("z10"))
    }),
    // waveform pf5 roundtrip: every point carries a key-derived
    // 29-byte wavepacket descriptor through the WAVEPACKET13 codec
    // (offset classes same/adjacent/32-bit/raw-64 all occur in the
    // unordered key stream); readback surfaces the descriptor as
    // exact integers the oracle recomputes arithmetically
    "pc_laz_wave_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_laz_wv_${d.replaceAll("[^A-Za-z0-9.]", "_")}.laz"
      val li = graft.Tables.table(s, d, "lineitem")
      val withWave = li.select(
        ((col("l_orderkey") * 17 + col("l_linenumber") * 131) % 8192)
          .cast("double").as("x"),
        ((col("l_partkey") * 29 + col("l_suppkey") * 197) % 8192)
          .cast("double").as("y"),
        col("l_quantity").as("z"),
        (col("l_linenumber") % 4).cast("long").as("wp_index"),
        (col("l_orderkey") * 64 + 4096).cast("long").as("wp_offset"),
        (col("l_quantity").cast("long") * 16 + 800).as("wp_size"),
        (col("l_partkey") % 100000).cast("long").as("wp_ret"),
        (col("l_suppkey") % 65536).cast("long").as("wp_xt"),
        ((col("l_orderkey") * 3) % 65536).cast("long").as("wp_yt"),
        ((col("l_partkey") + col("l_suppkey")) % 65536).cast("long").as("wp_zt"))
      graft.sources.Laz.writePoints(withWave, path, chunkPoints = 10000, pointFormat = 5)
      graft.sources.Laz.readPoints(s, path)
        .select(round(col("x") * 10).cast("long").as("x10"),
          col("wp_index"), col("wp_offset"), col("wp_size"),
          col("wp_ret"), col("wp_xt"), col("wp_yt"), col("wp_zt"))
    }),
    // layered waveform pf9 roundtrip: the wavepacket rides as its own
    // LAYER (compressor 3), so unrequested scans skip its bytes; the
    // readback projects ONLY x + wavepacket columns, which also proves
    // the projection path decodes correctly
    "pc_laz14_wave_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_laz14_wv_${d.replaceAll("[^A-Za-z0-9.]", "_")}.laz"
      val li = graft.Tables.table(s, d, "lineitem")
      val withWave = li.select(
        ((col("l_orderkey") * 17 + col("l_linenumber") * 131) % 8192)
          .cast("double").as("x"),
        ((col("l_partkey") * 29 + col("l_suppkey") * 197) % 8192)
          .cast("double").as("y"),
        col("l_quantity").cast("double").as("z"),
        (col("l_linenumber") % 4).cast("long").as("wp_index"),
        (col("l_orderkey") * 64 + 8192).cast("long").as("wp_offset"),
        (col("l_quantity").cast("long") * 8 + 400).as("wp_size"),
        (col("l_partkey") % 100000).cast("long").as("wp_ret"),
        (col("l_suppkey") % 65536).cast("long").as("wp_xt"),
        ((col("l_orderkey") * 5) % 65536).cast("long").as("wp_yt"),
        ((col("l_partkey") * 3 + col("l_suppkey")) % 65536).cast("long").as("wp_zt"))
      graft.sources.Laz14.writePoints14(withWave, path,
        chunkPoints = 10000, pointFormat = 9)
      graft.sources.Laz14.readPoints14(s, path,
          columns = Seq("x", "wp_index", "wp_offset", "wp_size", "wp_ret",
            "wp_xt", "wp_yt", "wp_zt"))
        .select(round(col("x") * 10).cast("long").as("x10"),
          col("wp_index"), col("wp_offset"), col("wp_size"),
          col("wp_ret"), col("wp_xt"), col("wp_yt"), col("wp_zt"))
    }),
    // legacy compressor-1 (pre-2013 pointwise LASzip) roundtrip: the
    // v1 item-codec stream, single arithmetic stream, no chunk table —
    // the one LAZ family old archives hold that chunked v2 can't cover
    "pc_laz_v1_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_laz_v1_rt_${d.replaceAll("[^A-Za-z0-9.]", "_")}.laz"
      graft.sources.Laz.writePointsV1(rawPoints(s, d), path)
      graft.sources.Laz.readPoints(s, path)
        .select(round(col("x") * 10).cast("long").as("x10"),
          round(col("y") * 10).cast("long").as("y10"),
          round(col("z") * 10).cast("long").as("z10"))
    }),
    // LAZ extra-bytes (BYTE v2 item) roundtrip: three opaque lanes
    // derived from the grid keys ride through the codec as a binary
    // column; the oracle recomputes each lane arithmetically from
    // lineitem, so a single flipped byte anywhere fails the hash
    "pc_laz_extra" -> ((s, d) => {
      val path = s"/tmp/graft_laz_xb_${d.replaceAll("[^A-Za-z0-9.]", "_")}.laz"
      val src = rawPoints(s, d).withColumn("extra_bytes",
        expr("unhex(concat(" +
          "lpad(hex(cast(x as bigint) % 256), 2, '0'), " +
          "lpad(hex(cast(y as bigint) % 251), 2, '0'), " +
          "lpad(hex(cast(x + y as bigint) % 7), 2, '0')))"))
      graft.sources.Laz.writePoints(src, path, chunkPoints = 10000, extraBytes = 3)
      graft.sources.Laz.readPoints(s, path)
        .select(round(col("x") * 10).cast("long").as("x10"),
          conv(hex(expr("substring(extra_bytes, 1, 1)")), 16, 10).cast("long").as("e0"),
          conv(hex(expr("substring(extra_bytes, 2, 1)")), 16, 10).cast("long").as("e1"),
          conv(hex(expr("substring(extra_bytes, 3, 1)")), 16, 10).cast("long").as("e2"))
    }),
    // layered LASzip (compressor 3, LAS 1.4 pf8) roundtrip: every LAZ
    // layer — coords, returns, channel, classification, intensity,
    // angle, user, source, GPS time, RGB, NIR — carries a key-derived
    // value the oracle recomputes arithmetically
    "pc_laz14_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_laz14_rt_${d.replaceAll("[^A-Za-z0-9.]", "_")}.laz"
      val li = graft.Tables.table(s, d, "lineitem")
      val df = li.select(
        ((col("l_orderkey") * 17 + col("l_linenumber") * 131) % 8192)
          .cast("double").as("x"),
        ((col("l_partkey") * 29 + col("l_suppkey") * 197) % 8192)
          .cast("double").as("y"),
        col("l_quantity").as("z"),
        ((col("l_orderkey") * 7 + col("l_linenumber")) % 65536).cast("int").as("intensity"),
        (lit(1) + col("l_orderkey") % (lit(1) + col("l_linenumber") % 5))
          .cast("int").as("return_number"),
        (lit(1) + col("l_linenumber") % 5).cast("int").as("number_of_returns"),
        (col("l_suppkey") % 4).cast("int").as("scanner_channel"),
        (col("l_partkey") % 32).cast("int").as("classification"),
        (col("l_orderkey") % 601 - 300).cast("int").as("scan_angle"),
        (col("l_suppkey") % 256).cast("int").as("user_data"),
        (col("l_partkey") % 1024).cast("int").as("point_source"),
        (col("l_orderkey") % 1000000).cast("double").as("gps_time"),
        (col("l_partkey") % 65536).cast("int").as("r"),
        (col("l_suppkey") % 65536).cast("int").as("g"),
        (col("l_orderkey") % 65536).cast("int").as("b"),
        (col("l_linenumber") * 13 % 65536).cast("int").as("nir"))
      graft.sources.Laz14.writePoints14(df, path, chunkPoints = 10000, pointFormat = 8)
      graft.sources.Laz14.readPoints14(s, path)
        .select(round(col("x") * 10).cast("long").as("x10"),
          round(col("y") * 10).cast("long").as("y10"),
          round(col("z") * 10).cast("long").as("z10"),
          col("intensity").cast("long").as("intensity"),
          col("return_number").cast("long").as("return_number"),
          col("number_of_returns").cast("long").as("number_of_returns"),
          col("scanner_channel").cast("long").as("scanner_channel"),
          col("classification").cast("long").as("classification"),
          col("scan_angle").cast("long").as("scan_angle"),
          col("user_data").cast("long").as("user_data"),
          col("point_source").cast("long").as("point_source"),
          col("gps_time"),
          col("r").cast("long").as("r"), col("g").cast("long").as("g"),
          col("b").cast("long").as("b"), col("nir").cast("long").as("nir"))
    }),
    // voxel-grid raster: density + z extremes per 64-unit cell
    "pc_grid_agg" -> ((s, d) => cloud(s, d).gridAggregate(64.0)),
    // deterministic thinning: smallest (x, y, z) per 256-unit cell
    "pc_downsample" -> ((s, d) => {
      val r = cloud(s, d).gridDownsample(256.0)
      r.select(col("cell_x"), col("cell_y"),
        col("x").cast("long").as("x"), col("y").cast("long").as("y"), col("z"))
    }),
    // slope raster: max |mean-z step| to the 4-neighborhood per cell
    "pc_cell_slope" -> ((s, d) => cloud(s, d).gridSlope(64.0)),
    // per-cell least-squares plane fit: exact-integer normal equations
    // (cell-local coords), Cramer's rule, three correctly-rounded
    // divisions, fixed-order residual evaluation — a bit-reproducible
    // roughness raster
    "pc_cell_planarity" -> ((s, d) => cloud(s, d).gridPlanarity(64.0)),
    // exact discrete P95 per cell: k-th order statistic, k = ceil(.95n)
    "pc_cell_p95" -> ((s, d) => cloud(s, d).gridPercentile(64.0, 950)),
    // per-point height above the cell-min ground model; points join a
    // broadcast raster, never shuffle. x/y cast to the integer grid like
    // every other pc_* result — r7's only red row was this query hashing
    // a Spark DOUBLE x/y against the oracle's BIGINT x/y (values were
    // bit-identical; the driver hash is type-sensitive)
    "pc_hag" -> ((s, d) => cloud(s, d).heightAboveGround(64.0)
      .select(col("x").cast("long").as("x"), col("y").cast("long").as("y"),
        col("z"), col("hag"))),
    // progressive morphological ground filter (PMF / PDAL filters.pmf):
    // two opening stages (3x3 then 5x5) with growing thresholds; every
    // morphological pass is raster-sized, points never shuffle
    "pc_ground_pmf" -> ((s, d) => cloud(s, d)
      .morphologicalGround(64.0, Seq((1, 2.0), (2, 4.0)))
      .select(col("x").cast("long").as("x"), col("y").cast("long").as("y"),
        col("z"), col("is_ground"))),
    // radius outlier removal (PDAL filters.ror shape): keep points
    // whose 48-unit 3D neighborhood holds >= 4 identities-with-
    // multiplicity; cell-blocked equi self-join, never n^2. Candidate
    // volume is n x 9 x (points per radius-cell): on this synthetic
    // fixture density grows with sf (fixed 8192 grid), so the radius
    // is sized for bench health — real clouds have constant density
    // per area and the op scales linearly
    "pc_radius_outliers" -> ((s, d) =>
      xyz(cloud(s, d).radiusOutlierRemoval(48.0, 4L))),
    // 3D-keyed store: z pruned at the scan via octree ranges, not
    // post-filtered (the height-query scale path beyond B10-B12)
    "pc_bbox3d" -> ((s, d) =>
      xyz(cloud3(s, d).boxQuery(1000, 3000, 1000, 3000, 10.005, 25.005))),
    "pc_zslice" -> ((s, d) =>
      xyz(cloud3(s, d).boxQuery(0, 8191, 0, 8191, 20.005, 21.005))),
    // circle x height band in ONE pruned scan (B-circle + B10-12 fused)
    "pc_cylinder" -> ((s, d) =>
      xyz(cloud3(s, d).cylinderQuery(3000.5, 3000.5, 400.3, 10.005, 30.005))),
    // volumetric raster: 256x256x10-unit voxel occupancy
    "pc_voxel_counts" -> ((s, d) =>
      cloud3(s, d).voxelCounts(256.0, 10.0)),
    // polygon prism: the 2D L-shape crossed with a height band, all
    // three dimensions pruned by one octree decomposition
    "pc_poly_3d" -> ((s, d) =>
      xyz(cloud3(s, d).polygonQuery(polySimpleWkt, 10.005, 25.005))),
    // true-3D kNN (height-aware nearest neighbours)
    "pc_knn_3d" -> ((s, d) =>
      xyz(cloud3(s, d).knn(3000.5, 3000.5, 25.0, 100))),
    // naive full-scan control (no SFC pruning) — same answer as
    // pc_bbox_large; exists to demonstrate the layout win in BENCH
    "pc_bbox_naive" -> ((s, d) => xyz(rawPoints(s, d).filter(
      col("x") >= bboxLarge.xMin && col("x") <= bboxLarge.xMax &&
        col("y") >= bboxLarge.yMin && col("y") <= bboxLarge.yMax))))

  val oracleSql: Map[String, String] = Map(
    "pc_bbox_small" -> s"$ptsCte SELECT x, y, z FROM pts WHERE ${bboxSql(bboxSmall)}",
    "pc_bbox_large" -> s"$ptsCte SELECT x, y, z FROM pts WHERE ${bboxSql(bboxLarge)}",
    "pc_bbox_empty" -> s"$ptsCte SELECT x, y, z FROM pts WHERE ${bboxSql(bboxEmpty)}",
    "pc_bbox_narrow" -> s"$ptsCte SELECT x, y, z FROM pts WHERE ${bboxSql(bboxNarrow)}",
    "pc_circle" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "(x - 3000.5) * (x - 3000.5) + (y - 3000.5) * (y - 3000.5) <= 200.3 * 200.3"),
    "pc_poly_simple" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "(x BETWEEN 501 AND 3000 AND y BETWEEN 501 AND 1500) OR " +
      "(x BETWEEN 501 AND 1500 AND y BETWEEN 501 AND 3000)"),
    "pc_poly_hole" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "x BETWEEN 1001 AND 4000 AND y BETWEEN 1001 AND 4000 AND NOT " +
      "(x BETWEEN 2001 AND 3000 AND y BETWEEN 2001 AND 3000)"),
    "pc_poly_2holes" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "x BETWEEN 501 AND 4500 AND y BETWEEN 501 AND 4500 AND NOT " +
      "(x BETWEEN 1001 AND 1800 AND y BETWEEN 1001 AND 1800) AND NOT " +
      "(x BETWEEN 2501 AND 3500 AND y BETWEEN 2501 AND 3500)"),
    "pc_poly_diag" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "x + y BETWEEN 4000.5 AND 4600.5 AND x - y BETWEEN -500.5 AND 500.5"),
    "pc_polyline_buffer" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      polylineBufferSql(graft.core.Geometry.parseWktLinestring(polylineWkt), polylineR)),
    "pc_bbox_maxz" -> s"$ptsCte SELECT x, y, z FROM pts WHERE ${bboxSql(bboxLarge)} AND z <= 25.0",
    "pc_bbox_minz" -> s"$ptsCte SELECT x, y, z FROM pts WHERE ${bboxSql(bboxLarge)} AND z >= 10.0",
    "pc_knn" -> (s"$ptsCte SELECT x, y, z FROM pts ORDER BY " +
      "(x - 3000.5) * (x - 3000.5) + (y - 3000.5) * (y - 3000.5), x, y, z LIMIT 100"),
    "pc_knn_batch" -> (s"$ptsCte " + knnBatchQueries.map { case (qid, qx, qy) =>
      s"(SELECT CAST($qid AS BIGINT) AS qid, x, y, z FROM pts ORDER BY " +
        s"(x - $qx) * (x - $qx) + (y - $qy) * (y - $qy), x, y, z LIMIT 50)"
    }.mkString(" UNION ALL ")),
    "pc_histogram" -> (s"$ptsCte SELECT x // 128 AS cell_x, y // 128 AS cell_y, " +
      "count(*) AS n_points FROM pts GROUP BY 1, 2"),
    "pc_metadata" -> (s"$ptsCte SELECT count(*) AS point_count, " +
      "min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max, " +
      "min(z) AS z_min, max(z) AS z_max FROM pts"),
    "pc_radius_outliers" -> (s"$ptsCte, ids AS (" +
      "SELECT x, y, z, count(*) AS m, x // 48 AS cx, y // 48 AS cy " +
      "FROM pts GROUP BY 1, 2, 3), " +
      "probe AS (SELECT x, y, z, cx + a.dx AS ncx, cy + b.dy AS ncy FROM ids, " +
      "(VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)), " +
      "kept AS (SELECT p.x, p.y, p.z FROM probe p JOIN ids q " +
      "ON p.ncx = q.cx AND p.ncy = q.cy AND " +
      "(q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) + " +
      "(q.z - p.z) * (q.z - p.z) <= 48 * 48 " +
      "GROUP BY 1, 2, 3 HAVING sum(q.m) >= 4) " +
      "SELECT pts.x, pts.y, pts.z FROM pts JOIN kept USING (x, y, z)"),
    "pc_bbox3d" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "x BETWEEN 1000 AND 3000 AND y BETWEEN 1000 AND 3000 " +
      "AND z >= 10.005 AND z <= 25.005"),
    "pc_zslice" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "z >= 20.005 AND z <= 21.005"),
    "pc_cylinder" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "(x - 3000.5) * (x - 3000.5) + (y - 3000.5) * (y - 3000.5) <= 400.3 * 400.3 " +
      "AND z >= 10.005 AND z <= 30.005"),
    "pc_voxel_counts" -> (s"$ptsCte SELECT x // 256 AS cell_x, y // 256 AS cell_y, " +
      "CAST(floor(z / 10.0) AS BIGINT) AS cell_z, count(*) AS n_points " +
      "FROM pts GROUP BY 1, 2, 3"),
    "pc_grid_agg" -> (s"$ptsCte SELECT x // 64 AS cell_x, y // 64 AS cell_y, " +
      "count(*) AS n_points, min(z) AS min_z, max(z) AS max_z, " +
      "CAST(sum(CAST(round(z * 100, 0) AS BIGINT)) AS BIGINT) AS sum_z_centi " +
      "FROM pts GROUP BY 1, 2"),
    "pc_downsample" -> (s"$ptsCte, r AS (SELECT x // 256 AS cell_x, y // 256 AS cell_y, " +
      "x, y, z, row_number() OVER (PARTITION BY x // 256, y // 256 ORDER BY x, y, z) AS rn " +
      "FROM pts) SELECT cell_x, cell_y, x, y, z FROM r WHERE rn = 1"),
    "pc_hag" -> (s"$ptsCte, g AS (SELECT x // 64 AS cell_x, y // 64 AS cell_y, " +
      "min(z) AS gz FROM pts GROUP BY 1, 2) " +
      "SELECT p.x, p.y, p.z, p.z - g.gz AS hag FROM pts p " +
      "JOIN g ON p.x // 64 = g.cell_x AND p.y // 64 = g.cell_y"),
    "pc_ground_pmf" -> (s"$ptsCte, g AS (SELECT x // 64 AS cx, y // 64 AS cy, " +
      "min(z) AS s FROM pts GROUP BY 1, 2), " +
      "e1 AS (SELECT a.cx, a.cy, min(b.s) AS v FROM g a JOIN g b " +
      "ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 GROUP BY 1, 2), " +
      "o1 AS (SELECT a.cx, a.cy, max(b.v) AS v FROM g a JOIN e1 b " +
      "ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 GROUP BY 1, 2), " +
      "e2 AS (SELECT a.cx, a.cy, min(b.v) AS v FROM g a JOIN o1 b " +
      "ON b.cx BETWEEN a.cx - 2 AND a.cx + 2 AND b.cy BETWEEN a.cy - 2 AND a.cy + 2 GROUP BY 1, 2), " +
      "o2 AS (SELECT a.cx, a.cy, max(b.v) AS v FROM g a JOIN e2 b " +
      "ON b.cx BETWEEN a.cx - 2 AND a.cx + 2 AND b.cy BETWEEN a.cy - 2 AND a.cy + 2 GROUP BY 1, 2) " +
      "SELECT p.x, p.y, p.z, CASE WHEN p.z <= o1.v + 2.0 AND p.z <= o2.v + 4.0 " +
      "THEN 1 ELSE 0 END AS is_ground FROM pts p " +
      "JOIN o1 ON p.x // 64 = o1.cx AND p.y // 64 = o1.cy " +
      "JOIN o2 ON p.x // 64 = o2.cx AND p.y // 64 = o2.cy"),
    "pc_cell_slope" -> (s"$ptsCte, g AS (SELECT x // 64 AS cell_x, y // 64 AS cell_y, " +
      "count(*) AS n, sum(CAST(round(z * 100, 0) AS BIGINT)) AS sc FROM pts GROUP BY 1, 2), " +
      "mz AS (SELECT cell_x, cell_y, CAST(sc AS DOUBLE) / (100.0 * n) AS mean_z FROM g), " +
      "c AS (SELECT cell_x + dx AS cell_x, cell_y + dy AS cell_y, mean_z AS nb_mean " +
      "FROM mz, (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)) " +
      "SELECT mz.cell_x, mz.cell_y, count(*) AS n_neighbors, " +
      "max(abs(mz.mean_z - c.nb_mean)) AS max_dz " +
      "FROM mz JOIN c USING (cell_x, cell_y) GROUP BY 1, 2"),
    "pc_cell_p95" -> (s"$ptsCte, " +
      "p AS (SELECT x // 64 AS cell_x, y // 64 AS cell_y, " +
      "CAST(round(z * 100, 0) AS BIGINT) AS zc FROM pts), " +
      "r AS (SELECT cell_x, cell_y, zc, " +
      "row_number() OVER (PARTITION BY cell_x, cell_y ORDER BY zc) AS rk, " +
      "count(*) OVER (PARTITION BY cell_x, cell_y) AS n FROM p) " +
      "SELECT cell_x, cell_y, n AS n_points, zc AS p950_centi " +
      "FROM r WHERE rk = ((n * 950) + 999) // 1000"),
    "pc_cell_planarity" -> (s"$ptsCte, " +
      "p AS (SELECT x // 64 AS cell_x, y // 64 AS cell_y, x % 64 AS dx, y % 64 AS dy, " +
      "CAST(round(z * 100, 0) AS BIGINT) AS zc FROM pts), " +
      "g AS (SELECT cell_x, cell_y, count(*) AS n, " +
      "CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy, " +
      "CAST(sum(dx * dx) AS BIGINT) AS sxx, CAST(sum(dy * dy) AS BIGINT) AS syy, " +
      "CAST(sum(dx * dy) AS BIGINT) AS sxy, CAST(sum(dx * zc) AS BIGINT) AS sxz, " +
      "CAST(sum(dy * zc) AS BIGINT) AS syz, CAST(sum(zc) AS BIGINT) AS sz " +
      "FROM p GROUP BY 1, 2), " +
      // shared first-column minors, same factored forms as the Scala side
      "m AS (SELECT *, (syy * n) - (sy * sy) AS m11, (sxy * n) - (sx * sy) AS m21, " +
      "(sxy * sy) - (sx * syy) AS m31 FROM g), " +
      "f AS (SELECT *, (sxx * m11) - (sxy * m21) + (sx * m31) AS det FROM m), " +
      "fit AS (SELECT cell_x, cell_y, n AS n_points, " +
      "CAST((sxz * m11) - (syz * m21) + (sz * m31) AS DOUBLE) / CAST(det AS DOUBLE) AS slope_x, " +
      "CAST((sxx * ((syz * n) - (sy * sz))) - (sxy * ((sxz * n) - (sx * sz))) " +
      "+ (sx * ((sxz * sy) - (sx * syz))) AS DOUBLE) / CAST(det AS DOUBLE) AS slope_y, " +
      "CAST((sxx * ((syy * sz) - (syz * sy))) - (sxy * ((sxy * sz) - (sxz * sy))) " +
      "+ (sx * ((sxy * syz) - (sxz * syy))) AS DOUBLE) / CAST(det AS DOUBLE) AS icept_centi " +
      "FROM f WHERE det != 0) " +
      "SELECT p.cell_x, p.cell_y, max(fit.n_points) AS n_points, " +
      "max(fit.slope_x) AS slope_x, max(fit.slope_y) AS slope_y, " +
      "max(abs(CAST(zc AS DOUBLE) - (fit.slope_x * dx + fit.slope_y * dy + fit.icept_centi))) " +
      "AS max_resid_centi " +
      "FROM p JOIN fit USING (cell_x, cell_y) GROUP BY 1, 2"),
    "pc_poly_3d" -> (s"$ptsCte SELECT x, y, z FROM pts WHERE " +
      "((x BETWEEN 501 AND 3000 AND y BETWEEN 501 AND 1500) OR " +
      "(x BETWEEN 501 AND 1500 AND y BETWEEN 501 AND 3000)) " +
      "AND z >= 10.005 AND z <= 25.005"),
    "pc_knn_3d" -> (s"$ptsCte SELECT x, y, z FROM pts ORDER BY " +
      "(x - 3000.5) * (x - 3000.5) + (y - 3000.5) * (y - 3000.5) " +
      "+ (z - 25.0) * (z - 25.0), x, y, z LIMIT 100"),
    "pc_bbox_naive" -> s"$ptsCte SELECT x, y, z FROM pts WHERE ${bboxSql(bboxLarge)}",
    "pc_las_roundtrip" ->
      s"$ptsCte SELECT x * 10 AS x10, y * 10 AS y10, CAST(round(z * 10, 0) AS BIGINT) AS z10 FROM pts",
    "pc_laz_roundtrip" ->
      s"$ptsCte SELECT x * 10 AS x10, y * 10 AS y10, CAST(round(z * 10, 0) AS BIGINT) AS z10 FROM pts",
    "pc_laz_v1_roundtrip" ->
      s"$ptsCte SELECT x * 10 AS x10, y * 10 AS y10, CAST(round(z * 10, 0) AS BIGINT) AS z10 FROM pts",
    "pc_laz14_wave_roundtrip" ->
      """SELECT CAST(((l_orderkey * 17 + l_linenumber * 131) % 8192) * 10 AS BIGINT) AS x10,
           CAST(l_linenumber % 4 AS BIGINT) AS wp_index,
           CAST(l_orderkey * 64 + 8192 AS BIGINT) AS wp_offset,
           CAST(l_quantity AS BIGINT) * 8 + 400 AS wp_size,
           CAST(l_partkey % 100000 AS BIGINT) AS wp_ret,
           CAST(l_suppkey % 65536 AS BIGINT) AS wp_xt,
           CAST((l_orderkey * 5) % 65536 AS BIGINT) AS wp_yt,
           CAST((l_partkey * 3 + l_suppkey) % 65536 AS BIGINT) AS wp_zt
         FROM lineitem""",
    "pc_laz_wave_roundtrip" ->
      """SELECT CAST(((l_orderkey * 17 + l_linenumber * 131) % 8192) * 10 AS BIGINT) AS x10,
           CAST(l_linenumber % 4 AS BIGINT) AS wp_index,
           CAST(l_orderkey * 64 + 4096 AS BIGINT) AS wp_offset,
           CAST(l_quantity AS BIGINT) * 16 + 800 AS wp_size,
           CAST(l_partkey % 100000 AS BIGINT) AS wp_ret,
           CAST(l_suppkey % 65536 AS BIGINT) AS wp_xt,
           CAST((l_orderkey * 3) % 65536 AS BIGINT) AS wp_yt,
           CAST((l_partkey + l_suppkey) % 65536 AS BIGINT) AS wp_zt
         FROM lineitem""",
    "pc_laz_extra" ->
      (s"$ptsCte SELECT x * 10 AS x10, CAST(x AS BIGINT) % 256 AS e0, " +
        "CAST(y AS BIGINT) % 251 AS e1, CAST(x + y AS BIGINT) % 7 AS e2 FROM pts"),
    "pc_laz14_roundtrip" ->
      """WITH p14 AS (SELECT
           (l_orderkey * 17 + l_linenumber * 131) % 8192 AS x,
           (l_partkey * 29 + l_suppkey * 197) % 8192 AS y,
           ROUND(l_quantity, 2) AS z,
           (l_orderkey * 7 + l_linenumber) % 65536 AS intensity,
           1 + (l_orderkey % (1 + (l_linenumber % 5))) AS return_number,
           1 + (l_linenumber % 5) AS number_of_returns,
           l_suppkey % 4 AS scanner_channel,
           l_partkey % 32 AS classification,
           (l_orderkey % 601) - 300 AS scan_angle,
           l_suppkey % 256 AS user_data,
           l_partkey % 1024 AS point_source,
           CAST(l_orderkey % 1000000 AS DOUBLE) AS gps_time,
           l_partkey % 65536 AS r, l_suppkey % 65536 AS g,
           l_orderkey % 65536 AS b, (l_linenumber * 13) % 65536 AS nir
         FROM lineitem)
         SELECT x * 10 AS x10, y * 10 AS y10,
           CAST(round(z * 10, 0) AS BIGINT) AS z10, intensity, return_number,
           number_of_returns, scanner_channel, classification, scan_angle,
           user_data, point_source, gps_time, r, g, b, nir FROM p14""")
}
