package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.{Bbox, Circle, Geometry, Morton, MortonRange, Polygon}
import graft.functions.sfc

/** Import-time knobs, mirroring the reference's import JSON spec
  * (scripts/import_20m.json keys scales/offsets/ratio/srid;
  * pipeline/import_data.py:11-23). */
final case class ImportSpec(
    name: String = "cloud",
    srid: Int = 0,
    scaleX: Double = 1.0, scaleY: Double = 1.0, scaleZ: Double = 1.0,
    offX: Double = 0.0, offY: Double = 0.0, offZ: Double = 0.0,
    ratio: Double = 0.7,
    /** When set, override `ratio` with a density-derived split: pick
      * the even head length whose expected occupancy (point count /
      * 2^headLen) is closest to this target. The reference leaves the
      * ratio as a hand-tuned knob per dataset (scripts/import_*_s*.json
      * sweeps); at sparse densities a fixed ratio degenerates to
      * one-point blocks, losing the layout's purpose. */
    targetPointsPerBlock: Option[Int] = None,
    blockPartitions: Option[Int] = None)

/** Dataset catalog row — the Spark form of pc_metadata_<name>
  * (reference db/__init__.py:43-52). Unlike the reference's querier,
  * which hard-codes head/tail = 26/12 (query.py:27), queries here
  * always read the split from this metadata. */
final case class CloudMeta(
    name: String, srid: Int, pointCount: Long,
    headLen: Int, tailLen: Int,
    scaleX: Double, scaleY: Double, scaleZ: Double,
    offX: Double, offY: Double, offZ: Double,
    xMin: Double, xMax: Double, yMin: Double, yMax: Double,
    zMin: Double, zMax: Double)

/** One Morton-head block: parallel arrays sfc_tail(i) <-> z(i), sorted by
  * tail — the Spark form of pc_record_<name> (db/__init__.py:53-57),
  * with 64-bit heads (the reference's pg INT can overflow, SURVEY §1.3). */
final case class PointBlock(sfc_head: Long, sfc_tail: Array[Long], z: Array[Double])

/** One streamed micro-batch's ledger entry (count + extents) — written
  * idempotently per `__batch` partition by [[PointCloud.appendBatch]]. */
final case class BatchLedgerRow(__batch: Long, n: Long,
    x_min: Double, x_max: Double, y_min: Double, y_max: Double,
    z_min: Double, z_max: Double)

object PointCloud {
  private[operators] val tuple3Enc: Encoder[(Long, Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
  private[operators] val blockEnc: Encoder[PointBlock] = Encoders.product[PointBlock]
  private val metaEnc: Encoder[CloudMeta] = Encoders.product[CloudMeta]

  /** Import a point cloud from a DataFrame with double columns (x, y, z).
    *
    * Spark-first re-expression of the reference's import pipeline
    * (pipeline/import_data.py:25-56 + pcsfc/point_processor.py:41-81):
    * one stats pass, then quantize -> Morton encode -> head/tail split ->
    * range-shuffle on head -> in-partition sort -> streaming block pack.
    * The pack is a mapPartitions grouper over sorted input, NOT
    * collect_list, so a block never materializes more than one group —
    * the 100 TB-safe form (SURVEY §2.5 A1).
    *
    * Divergence from the reference: Python round() is banker's rounding;
    * Spark round() is HALF_UP. Identical on any grid where coordinates
    * don't land exactly on .5 after scaling (all fixtures use integer
    * grids).
    */
  def importPoints(points: DataFrame, spec: ImportSpec): BlockedCloud = {
    val spark = points.sparkSession
    val s = points.agg(
      count(lit(1)), min("x"), max("x"), min("y"), max("y"), min("z"), max("z")).head()
    require(!s.isNullAt(1), "cannot import an empty point cloud")
    val (n, xMin, xMax, yMin, yMax, zMin, zMax) =
      (s.getLong(0), s.getDouble(1), s.getDouble(2), s.getDouble(3), s.getDouble(4),
        s.getDouble(5), s.getDouble(6))
    // strict: round() is HALF_UP (away from zero), so a quantized -0.5
    // would become -1 and Morton.encode would silently mask the sign
    require((xMin - spec.offX) / spec.scaleX > -0.5 && (yMin - spec.offY) / spec.scaleY > -0.5,
      s"negative quantized coordinates: offsets ${(spec.offX, spec.offY)} exceed data min ${(xMin, yMin)}")
    val qxMax = math.round((xMax - spec.offX) / spec.scaleX)
    val qyMax = math.round((yMax - spec.offY) / spec.scaleY)
    val ratio = spec.targetPointsPerBlock match {
      case Some(target) =>
        val totalBits = { val s = Morton.splitLengths(qxMax, qyMax, 1.0); s._1 + s._2 }
        // even head length with ~n/2^h points per head closest to target
        val ideal = math.log(math.max(n.toDouble / target, 1.0)) / math.log(2.0)
        val headLen = math.max(2, math.min(totalBits - 2,
          2 * math.round(ideal / 2).toInt))
        headLen.toDouble / totalBits
      case None => spec.ratio
    }
    val (headLen, tailLen) = Morton.splitLengths(qxMax, qyMax, ratio)

    val mkey = sfc.morton_encode(
      quantize(col("x"), spec.offX, spec.scaleX),
      quantize(col("y"), spec.offY, spec.scaleY))
    val keyed = points.select(
      shiftright(mkey, tailLen).as("sfc_head"),
      mkey.bitwiseAND(lit((1L << tailLen) - 1)).as("sfc_tail"),
      round(col("z"), 2).as("z")) // z kept at 2 decimals (point_processor.py:47)

    val nParts = spec.blockPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val packed = keyed
      .repartitionByRange(nParts, col("sfc_head"))
      .sortWithinPartitions("sfc_head", "sfc_tail")
      .as[(Long, Long, Double)](tuple3Enc)
      .mapPartitions(packSortedPartition _)(blockEnc)
      .toDF()

    val meta = CloudMeta(spec.name, spec.srid, n, headLen, tailLen,
      spec.scaleX, spec.scaleY, spec.scaleZ, spec.offX, spec.offY, spec.offZ,
      xMin, xMax, yMin, yMax, zMin, zMax)
    new BlockedCloud(spark, packed, meta)
  }

  private def quantize(c: Column, off: Double, scale: Double): Column =
    round((c - lit(off)) / lit(scale)).cast(LongType)

  /** Entry point 1 of the reference (importer.py): import LAS file(s)
    * into the blocked-SFC layout. `path` may be one .las file or a
    * directory (DirLoader semantics, S3) — one distributed job either
    * way, not the reference's sequential per-file loop
    * (pipeline/import_data.py:109-136). */
  def importLas(spark: SparkSession, path: String, spec: ImportSpec): BlockedCloud = {
    val pts =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
        graft.sources.Las.readDir(spark, path)
      else graft.sources.Las.readPoints(spark, path)
    importPoints(pts, spec)
  }

  /** Group consecutive equal heads of a (head, tail)-sorted iterator into
    * blocks. Streaming: holds exactly one block in memory. */
  private[operators] def packSortedPartition(
      it: Iterator[(Long, Long, Double)]): Iterator[PointBlock] =
    new Iterator[PointBlock] {
      private var cur: (Long, Long, Double) = _
      private var has = it.hasNext
      if (has) cur = it.next()
      override def hasNext: Boolean = has
      override def next(): PointBlock = {
        val head = cur._1
        val tails = scala.collection.mutable.ArrayBuilder.make[Long]
        val zs = scala.collection.mutable.ArrayBuilder.make[Double]
        var continue = true
        while (continue) {
          tails += cur._2
          zs += cur._3
          if (it.hasNext) {
            cur = it.next()
            continue = cur._1 == head
          } else { has = false; continue = false }
        }
        PointBlock(head, tails.result(), zs.result())
      }
    }

  /** Persist blocks (sorted parquet — row-group min/max stats on sfc_head
    * replace the reference's B-tree, db/__init__.py:118-126) + metadata. */
  /** Output sizing for the block store (guide §6): the import's range
    * partitioning is CPU-count-sized, so without this a small cloud
    * lands as dozens of ~100 KB files whose per-file open cost +
    * per-split task scheduling dominate every later scan (measured at
    * sf0.1: a 3.2 MB store as 33 files made each scan a 32-task stage,
    * and 8-core runs beat 32-core runs 0.3:1 on pc_voxel_counts).
    * COALESCE — never repartition — so the sfc range clustering and
    * per-file min/max pruning survive; the ~128 MB target means a
    * cluster-scale cloud keeps ceil(bytes/128 MB) files and full write
    * parallelism, i.e. this is a no-op above laptop volumes. */
  private[operators] def sizedForWrite(blocks: org.apache.spark.sql.DataFrame,
      pointCount: Long, estBytesPerPoint: Long): org.apache.spark.sql.DataFrame = {
    val target = 128L << 20
    val nOut = math.max(1L,
      (pointCount * estBytesPerPoint + target - 1) / target)
    if (nOut < blocks.rdd.getNumPartitions) blocks.coalesce(nOut.toInt)
    else blocks
  }

  def write(cloud: BlockedCloud, dir: String): Unit = {
    sizedForWrite(cloud.blocks, cloud.meta.pointCount, estBytesPerPoint = 8L)
      .write.mode("overwrite").parquet(s"$dir/blocks")
    cloud.spark.createDataset(Seq(cloud.meta))(metaEnc)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Open a stored cloud. Blocks = the base import plus any streamed
    * delta partitions ([[appendBatch]]); the catalog row composes the
    * base meta with the per-batch ledger (count sum, extent
    * min/max-merge), so on-disk meta is never rewritten per micro-batch
    * and a replayed batch cannot double-count. */
  def read(spark: SparkSession, dir: String): BlockedCloud = {
    import java.nio.file.{Files, Paths}
    val meta0 = spark.read.parquet(s"$dir/meta").as[CloudMeta](metaEnc).head()
    val base = spark.read.parquet(s"$dir/blocks")
    val blocks = if (Files.exists(Paths.get(s"$dir/blocks_delta")))
      base.unionByName(spark.read.parquet(s"$dir/blocks_delta")
        .select("sfc_head", "sfc_tail", "z"))
    else base
    val meta = if (Files.exists(Paths.get(s"$dir/counts"))) {
      val l = spark.read.parquet(s"$dir/counts").agg(
        sum(col("n")), min(col("x_min")), max(col("x_max")),
        min(col("y_min")), max(col("y_max")),
        min(col("z_min")), max(col("z_max"))).head()
      meta0.copy(pointCount = meta0.pointCount + l.getLong(0),
        xMin = math.min(meta0.xMin, l.getDouble(1)),
        xMax = math.max(meta0.xMax, l.getDouble(2)),
        yMin = math.min(meta0.yMin, l.getDouble(3)),
        yMax = math.max(meta0.yMax, l.getDouble(4)),
        zMin = math.min(meta0.zMin, l.getDouble(5)),
        zMax = math.max(meta0.zMax, l.getDouble(6)))
    } else meta0
    new BlockedCloud(spark, blocks, meta)
  }

  /** Exactly-once streaming ingest (the 2D mirror of
    * [[PointCloud3.appendBatch]]): the micro-batch packs UNDER THE
    * STORED GRID into its own `blocks_delta/__batch=<id>` partition
    * with dynamic partition overwrite, plus a one-row
    * `counts/__batch=<id>` ledger entry carrying the batch's count and
    * extents — an at-least-once replay overwrites exactly its own
    * partition and ledger row, so stream state composes to
    * exactly-once without rewriting the base metadata. Same grid and
    * key-space envelope guards as [[appendPoints]]. */
  def appendBatch(spark: SparkSession, dir: String, delta: DataFrame,
      batchId: Long): Unit = {
    val meta = spark.read.parquet(s"$dir/meta").as[CloudMeta](metaEnc).head()
    val s = delta.agg(count(lit(1)),
      min("x"), max("x"), min("y"), max("y"), min("z"), max("z")).head()
    if (s.getLong(0) == 0) return // empty micro-batch: nothing to land
    require((s.getDouble(1) - meta.offX) / meta.scaleX > -0.5 &&
      (s.getDouble(3) - meta.offY) / meta.scaleY > -0.5,
      "append batch falls below the stored grid offsets")
    val qxMaxD = math.round((s.getDouble(2) - meta.offX) / meta.scaleX)
    val qyMaxD = math.round((s.getDouble(4) - meta.offY) / meta.scaleY)
    require(Morton.bitLength(Morton.encode(qxMaxD, qyMaxD)) <= meta.headLen + meta.tailLen,
      s"append batch max quantized coords ($qxMaxD, $qyMaxD) exceed the stored " +
        s"${meta.headLen + meta.tailLen}-bit key space; queries could not see these points")
    val mkey = sfc.morton_encode(
      quantize(col("x"), meta.offX, meta.scaleX),
      quantize(col("y"), meta.offY, meta.scaleY))
    delta.select(
        shiftright(mkey, meta.tailLen).as("sfc_head"),
        mkey.bitwiseAND(lit((1L << meta.tailLen) - 1)).as("sfc_tail"),
        round(col("z"), 2).as("z"))
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("sfc_head"))
      .sortWithinPartitions("sfc_head", "sfc_tail")
      .as[(Long, Long, Double)](tuple3Enc)
      .mapPartitions(packSortedPartition _)(blockEnc)
      .toDF()
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(s"$dir/blocks_delta")
    spark.createDataset(Seq(BatchLedgerRow(batchId, s.getLong(0),
        s.getDouble(1), s.getDouble(2), s.getDouble(3), s.getDouble(4),
        s.getDouble(5), s.getDouble(6))))(Encoders.product[BatchLedgerRow])
      .toDF()
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(s"$dir/counts")
  }

  /** Incremental ingest: pack a delta batch into blocks UNDER THE
    * STORED GRID (same offsets/scales/key split — an append must never
    * re-derive the key space or every existing key changes meaning)
    * and land the files next to the existing ones. After an append a
    * head may span several files; every query stays CORRECT (the scan
    * prunes on head ranges and explodes blocks independently — nothing
    * assumes cross-file head uniqueness), what degrades is layout
    * quality, which [[compact]] restores. This is the production
    * lifecycle at 100 TB: cheap delta appends all day, one clustering
    * compaction when fragmentation warrants. */
  def appendPoints(spark: SparkSession, dir: String, delta: DataFrame): Unit = {
    val meta = spark.read.parquet(s"$dir/meta").as[CloudMeta](metaEnc).head()
    val s = delta.agg(count(lit(1)),
      min("x"), max("x"), min("y"), max("y"), min("z"), max("z")).head()
    require(!s.isNullAt(1), "empty append batch")
    require((s.getDouble(1) - meta.offX) / meta.scaleX > -0.5 &&
      (s.getDouble(3) - meta.offY) / meta.scaleY > -0.5,
      "append batch falls below the stored grid offsets")
    // upper bound: the stored key split covers exactly
    // [0, 2^(headLen+tailLen)) — a delta past that envelope would pack
    // into heads the range decomposer never emits, so every spatial
    // query would silently omit it. Reject instead (re-import, or
    // import with headroom, to widen the grid).
    val qxMaxD = math.round((s.getDouble(2) - meta.offX) / meta.scaleX)
    val qyMaxD = math.round((s.getDouble(4) - meta.offY) / meta.scaleY)
    require(Morton.bitLength(Morton.encode(qxMaxD, qyMaxD)) <= meta.headLen + meta.tailLen,
      s"append batch max quantized coords ($qxMaxD, $qyMaxD) exceed the stored " +
        s"${meta.headLen + meta.tailLen}-bit key space; queries could not see these points")
    val mkey = sfc.morton_encode(
      quantize(col("x"), meta.offX, meta.scaleX),
      quantize(col("y"), meta.offY, meta.scaleY))
    val keyed = delta.select(
      shiftright(mkey, meta.tailLen).as("sfc_head"),
      mkey.bitwiseAND(lit((1L << meta.tailLen) - 1)).as("sfc_tail"),
      round(col("z"), 2).as("z"))
    keyed
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("sfc_head"))
      .sortWithinPartitions("sfc_head", "sfc_tail")
      .as[(Long, Long, Double)](tuple3Enc)
      .mapPartitions(packSortedPartition _)(blockEnc)
      .toDF()
      .write.mode("append").parquet(s"$dir/blocks")
    val updated = meta.copy(pointCount = meta.pointCount + s.getLong(0),
      xMin = math.min(meta.xMin, s.getDouble(1)), xMax = math.max(meta.xMax, s.getDouble(2)),
      yMin = math.min(meta.yMin, s.getDouble(3)), yMax = math.max(meta.yMax, s.getDouble(4)),
      zMin = math.min(meta.zMin, s.getDouble(5)), zMax = math.max(meta.zMax, s.getDouble(6)))
    spark.createDataset(Seq(updated))(metaEnc)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Clustering compaction: merge fragmented blocks so every head is
    * again exactly one block inside one range-clustered file — the
    * post-append maintenance pass. Points stream through the same
    * range-shuffle + in-partition sort + one-block-in-memory pack as
    * the initial import (never a per-head collect), land in a staging
    * directory, and swap in with a directory rename (a real deployment
    * would delegate the swap to a table format's atomic commit). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val cloud = read(spark, dir) // base + delta union, ledger-composed meta
    val blocks = cloud.blocks
    val repacked = blocks
      .select(col("sfc_head"), posexplode(col("sfc_tail")).as(Seq("__i", "__t")),
        col("z"))
      .select(col("sfc_head"), col("__t").as("sfc_tail"),
        element_at(col("z"), col("__i") + 1).as("z"))
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions, col("sfc_head"))
      .sortWithinPartitions("sfc_head", "sfc_tail")
      .as[(Long, Long, Double)](tuple3Enc)
      .mapPartitions(packSortedPartition _)(blockEnc)
      .toDF()
    repacked.write.mode("overwrite").parquet(s"$dir/blocks_compacting")
    // swap via rename-aside: blocks -> blocks_old, staging -> blocks,
    // then delete blocks_old. A crash at any step leaves a recoverable
    // state (the data exists intact under exactly one of the three
    // names); a real deployment would delegate the swap to a table
    // format's atomic commit. Local-fs renames; not atomic on object
    // stores.
    import java.nio.file.{Files, Paths}
    def rmdir(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
    val live = Paths.get(s"$dir/blocks")
    val old = Paths.get(s"$dir/blocks_old")
    rmdir(old) // leftover from a previous crashed compact
    Files.move(live, old)
    Files.move(Paths.get(s"$dir/blocks_compacting"), live)
    // fold streamed delta partitions + their ledger into the base:
    // composed meta FIRST, delta/ledger deletion after — a crash
    // between the two leaves a consistent overcount (points and counts
    // both still carry the delta) instead of composed points under a
    // stale base-only pointCount
    spark.createDataset(Seq(cloud.meta))(metaEnc)
      .write.mode("overwrite").parquet(s"$dir/meta")
    rmdir(Paths.get(s"$dir/blocks_delta"))
    rmdir(Paths.get(s"$dir/counts"))
    rmdir(old)
  }

  /** CSV block sink in the reference's pg-COPY shape — arrays rendered
    * as `{a,b,c}` (point_processor.py:83-87). Distributed write (one
    * csv part per partition), header per the reference's to_csv. */
  def writeCsv(cloud: BlockedCloud, path: String): Unit =
    cloud.blocks.select(
      col("sfc_head"),
      concat(lit("{"), concat_ws(",", col("sfc_tail")), lit("}")).as("sfc_tail"),
      concat(lit("{"), concat_ws(",", col("z")), lit("}")).as("z"))
      .write.mode("overwrite").option("header", "true")
      .option("quote", "\"").csv(path)

  /** JDBC sink: blocks + metadata to a JDBC database — the reference's
    * storage target is PostgreSQL (db/__init__.py:36-107;
    * BASELINE.json's "ETL to PostgreSQL" shape).
    * `pc_record_<name>(sfc_head, sfc_tail, z)` plus a one-row
    * `pc_metadata_<name>`; callers add the sfc_head index DDL
    * (db/__init__.py:118-126) post-load.
    *
    * `arraysAsText = false` keeps native array columns (PostgreSQL
    * INT[]/DOUBLE PRECISION[] via the driver's setArray — the exact
    * db/__init__.py:53-57 schema). `arraysAsText = true` renders each
    * array in the pg-COPY literal form `{a,b,c}` for dialects without
    * array types — also what JdbcSpec exercises end-to-end against
    * embedded Derby (the only JDBC engine in this sandbox; the native-
    * array mapping itself needs a live PostgreSQL and remains untested
    * here). Writes are partition-parallel: one JDBC connection per
    * partition, batched inserts. */
  def writeJdbc(cloud: BlockedCloud, url: String,
      props: java.util.Properties, arraysAsText: Boolean = false): Unit = {
    def pgText(a: Column): Column =
      concat(lit("{"), concat_ws(",", a), lit("}"))
    val blocks =
      if (!arraysAsText) cloud.blocks
      else cloud.blocks.select(col("sfc_head"),
        pgText(col("sfc_tail")).as("sfc_tail"), pgText(col("z")).as("z"))
    blocks.write.mode("append")
      .jdbc(url, s"pc_record_${cloud.meta.name}", props)
    cloud.spark.createDataset(Seq(cloud.meta))(metaEnc).toDF()
      .write.mode("append").jdbc(url, s"pc_metadata_${cloud.meta.name}", props)
  }
}

/** A stored point cloud + its catalog row; all queries are lazy DataFrames
  * following the reference's filter-refine plan (retrieve_data.py:103-153):
  * driver-side Morton range decomposition -> pushed sfc_head predicate
  * (parquet row-group pruning) -> block explode + decode -> exact
  * geometric predicate. No mid-query materialization, no per-point driver
  * work (the reference's INSERT-per-point loop, retrieve_data.py:150-151,
  * is the anti-pattern this replaces).
  */
object BlockedCloud {
  private[operators] val fusedExplode: Boolean =
    sys.env.getOrElse("GRAFT_FUSED_EXPLODE",
      System.getProperty("graft.fusedExplode", "false")).toBoolean
}

final class BlockedCloud(
    val spark: SparkSession,
    val blocks: DataFrame,
    val meta: CloudMeta) {

  private def totalBits: Int = meta.headLen + meta.tailLen

  /** Translate an original-coordinate bbox to the quantized grid such
    * that grid coord q in [qMin..qMax] implies q*scale+off in [min..max]. */
  private def quantizedBbox(b: Bbox): Option[Bbox] = {
    val qxMin = math.max(0L, math.ceil((b.xMin - meta.offX) / meta.scaleX).toLong)
    val qxMax = math.floor((b.xMax - meta.offX) / meta.scaleX).toLong
    val qyMin = math.max(0L, math.ceil((b.yMin - meta.offY) / meta.scaleY).toLong)
    val qyMax = math.floor((b.yMax - meta.offY) / meta.scaleY).toLong
    if (qxMin > qxMax || qyMin > qyMax) None
    else Some(Bbox(qxMin.toDouble, qxMax.toDouble, qyMin.toDouble, qyMax.toDouble))
  }

  /** Pushed OR-of-BETWEEN + binary-search membership over the
    * decomposed ranges — see [[SfcPredicates.headIn]]. */
  private def headPredicate(ranges: Seq[(Long, Long)]): Column =
    SfcPredicates.headIn(col("sfc_head"), ranges)

  /** Unpack blocks to reconstructed points (x, y, z) — the reference's
    * explode-decode loop (retrieve_data.py:127-145) as a lazy plan.
    * Default: composed arrays_zip → explode → native decode expressions
    * (stays inside whole-stage codegen). GRAFT_FUSED_EXPLODE=true
    * selects the fused ExplodeBlock generator (no intermediate
    * zipped-struct array, but CodegenFallback); measured equal within
    * noise at sf0.1 — see PLANS.md. Both produce identical rows. */
  private def explodePoints(blk: DataFrame): DataFrame =
    if (BlockedCloud.fusedExplode) {
      blk.select(graft.functions.generators.explode_block(
          col("sfc_head"), col("sfc_tail"), col("z"), meta.tailLen))
        .select(
          (col("x_grid").cast("double") * meta.scaleX + meta.offX).as("x"),
          (col("y_grid").cast("double") * meta.scaleY + meta.offY).as("y"),
          col("z"))
    } else {
      val key = shiftleft(col("sfc_head"), meta.tailLen).bitwiseOR(col("p.sfc_tail"))
      blk
        .select(col("sfc_head"), explode(arrays_zip(col("sfc_tail"), col("z"))).as("p"))
        .select(
          (sfc.morton_x(key).cast("double") * meta.scaleX + meta.offX).as("x"),
          (sfc.morton_y(key).cast("double") * meta.scaleY + meta.offY).as("y"),
          col("p.z").as("z"))
    }

  private def emptyPoints: DataFrame = explodePoints(blocks.filter(lit(false)))

  /** Two-branch candidate plan: points from fully-contained blocks (no
    * exact bbox test needed) and points from boundary-straddling blocks
    * (exact test required) — the reference's two-tier refinement
    * (retrieve_data.py:128-145). */
  private def candidates(b: Bbox): (DataFrame, DataFrame) =
    quantizedBbox(b) match {
      case None => (emptyPoints, emptyPoints)
      case Some(qb) =>
        // 256-range budget: a coarser cover just shifts points from the
        // contained branch to the exact-tested partial branch — same
        // result, bounded predicate size at any data scale
        val hr = MortonRange.decompose(qb, totalBits, meta.tailLen, maxCells = 256)
        val c = if (hr.contained.nonEmpty)
          explodePoints(blocks.filter(headPredicate(hr.contained))) else emptyPoints
        val p = if (hr.partial.nonEmpty)
          explodePoints(blocks.filter(headPredicate(hr.partial))) else emptyPoints
        (c, p)
    }

  private def bboxFilter(b: Bbox): Column =
    col("x") >= b.xMin && col("x") <= b.xMax && col("y") >= b.yMin && col("y") <= b.yMax

  /** All points with x in [xMin, xMax] and y in [yMin, yMax] (inclusive). */
  def bboxQuery(b: Bbox): DataFrame = {
    val (contained, partial) = candidates(b)
    contained.unionAll(partial.filter(bboxFilter(b)))
  }

  /** 2D circle selection (z ignored — PostGIS ST_DWithin on 2D points,
    * retrieve_data.py:56-63); boundary inclusive (<= r). */
  def circleQuery(c: Circle): DataFrame = {
    val (contained, partial) = candidates(c.bbox)
    val d2 = (col("x") - c.cx) * (col("x") - c.cx) + (col("y") - c.cy) * (col("y") - c.cy)
    contained.unionAll(partial).filter(d2 <= lit(c.r * c.r))
  }

  /** Polygon (with holes) selection, even-odd rule, boundary excluded. */
  def polygonQuery(p: Polygon): DataFrame = {
    val (contained, partial) = candidates(p.bbox)
    contained.unionAll(partial)
      .filter(sfc.point_in_polygon(col("x"), col("y"), p))
  }

  def polygonQuery(wkt: String): DataFrame =
    polygonQuery(Geometry.parseWktPolygon(wkt))

  /** Points within distance `r` of a polyline — the buffered-polyline
    * selections of suites B/C (B9_S_POLYLINE_BUFFER in
    * scripts/query_210m.json; C13_L/C14_DIAG_POLYLINE_BUFFER in
    * scripts/query_2201m.json — the reference ships them pre-buffered
    * as polygon WKT, so [[polygonQuery]] also covers that form).
    * Exact round-cap/round-join semantics: distance to the nearest
    * segment <= r (what the reference's polygonized buffer
    * approximates), evaluated per segment as built-in arithmetic that
    * stays inside whole-stage codegen — no geometry library, no UDF.
    * SFC pruning uses the line's bbox grown by r; the exact predicate
    * then applies to both candidate branches (a block inside the grown
    * bbox is NOT necessarily inside the buffer, unlike the rectangle
    * case). Predicate size is linear in segment count — fine for query
    * shapes (tens of vertices); a million-vertex line would call for a
    * broadcast segment table + range join instead. */
  def polylineBufferQuery(line: Array[Double], r: Double): DataFrame = {
    require(line.length >= 4 && line.length % 2 == 0,
      "polyline needs >= 2 (x, y) points, packed [x0,y0,x1,y1,...]")
    require(r >= 0, s"negative buffer radius $r")
    var xMin = line(0); var xMax = line(0)
    var yMin = line(1); var yMax = line(1)
    var i = 2
    while (i < line.length) {
      xMin = math.min(xMin, line(i)); xMax = math.max(xMax, line(i))
      yMin = math.min(yMin, line(i + 1)); yMax = math.max(yMax, line(i + 1))
      i += 2
    }
    val (contained, partial) =
      candidates(Bbox(xMin - r, xMax + r, yMin - r, yMax + r))
    val segs = (0 until line.length / 2 - 1).map { s =>
      (line(2 * s), line(2 * s + 1), line(2 * s + 2), line(2 * s + 3))
    }.filter { case (ax, ay, bx, by) => ax != bx || ay != by }
    require(segs.nonEmpty, "polyline has no non-degenerate segment")
    // point-to-segment distance^2: project onto the segment, clamp the
    // parameter to [0,1], measure to the clamped foot. The expression
    // tree mirrors PointCloudQueries' oracle SQL token-for-token so
    // both engines round identically (all-double IEEE arithmetic).
    val pred = segs.map { case (ax, ay, bx, by) =>
      val dxc = bx - ax; val dyc = by - ay
      val len2 = dxc * dxc + dyc * dyc
      val t = greatest(lit(0.0), least(lit(1.0),
        ((col("x") - ax) * dxc + (col("y") - ay) * dyc) / len2))
      val fx = col("x") - (t * dxc + ax)
      val fy = col("y") - (t * dyc + ay)
      fx * fx + fy * fy <= lit(r * r)
    }.reduce(_ || _)
    contained.unionAll(partial).filter(pred)
  }

  def polylineBufferQuery(wkt: String, r: Double): DataFrame =
    polylineBufferQuery(Geometry.parseWktLinestring(wkt), r)

  /** Coarse occupancy histogram for kNN radius seeding: per-cell point
    * counts at a Morton prefix of at most 12 bits — <= 4096 cells
    * however large the cloud, so the driver holds a bounded summary,
    * never the block list. Collected once per open cloud (one pruned
    * aggregate job), then every kNN seed is a pure driver-side lookup. */
  private final case class KnnHist(
      cellX: Array[Long], cellY: Array[Long], n: Array[Long],
      sideX: Long, sideY: Long)

  private lazy val knnHist: KnnHist = {
    val prefixBits = math.min(meta.headLen, 12)
    val shift = meta.headLen - prefixBits
    val rem = totalBits - prefixBits
    val sideX = 1L << ((rem + 1) / 2) // even key bits (x) below the prefix
    val sideY = 1L << (rem / 2)
    val rows = blocks
      .groupBy(shiftright(col("sfc_head"), shift).as("c"))
      .agg(sum(size(col("sfc_tail"))).cast("long").as("n"))
      .collect()
    val (cx, cy, cn) = (new Array[Long](rows.length),
      new Array[Long](rows.length), new Array[Long](rows.length))
    var i = 0
    rows.foreach { r =>
      val key = r.getLong(0) << rem
      cx(i) = Morton.decodeX(key) / sideX
      cy(i) = Morton.decodeY(key) / sideY
      cn(i) = r.getLong(1)
      i += 1
    }
    KnnHist(cx, cy, cn, sideX, sideY)
  }

  /** Seed radius from the LOCAL occupancy around the query: grow a
    * histogram-cell window (driver-side, zero jobs) until it holds
    * >= k points, then return the query-to-farthest-window-corner
    * distance — a circle of that radius provably contains the window,
    * hence >= k points, so the first probe round succeeds with a scan
    * volume near the histogram resolution. A global-density seed
    * misjudges skewed clouds in both directions: in the dense corner
    * it overshoots (one probe scanning almost everything), in the
    * sparse rest it undershoots (log-many probe rounds). */
  private def knnSeedRadius(px: Double, py: Double, k: Int): Double = {
    val h = knnHist
    val qx = (px - meta.offX) / meta.scaleX
    val qy = (py - meta.offY) / meta.scaleY
    val cellX = math.floor(qx / h.sideX).toLong
    val cellY = math.floor(qy / h.sideY).toLong
    val need = math.min(k.toLong, meta.pointCount)
    val maxW = math.max(h.cellX.max - h.cellX.min,
      h.cellY.max - h.cellY.min) + 1
    var w = 0L
    var count = 0L
    var done = false
    while (!done) {
      count = 0L
      var i = 0
      while (i < h.n.length) {
        if (math.abs(h.cellX(i) - cellX) <= w && math.abs(h.cellY(i) - cellY) <= w)
          count += h.n(i)
        i += 1
      }
      if (count >= need || w >= maxW) done = true
      else w = math.max(1L, w * 2)
    }
    // window rect in original coordinates; its farthest corner bounds
    // the k-distance from (px, py)
    val ox0 = ((cellX - w) * h.sideX) * meta.scaleX + meta.offX
    val ox1 = ((cellX + w + 1) * h.sideX) * meta.scaleX + meta.offX
    val oy0 = ((cellY - w) * h.sideY) * meta.scaleY + meta.offY
    val oy1 = ((cellY + w + 1) * h.sideY) * meta.scaleY + meta.offY
    val dx = math.max(math.abs(px - ox0), math.abs(px - ox1))
    val dy = math.max(math.abs(py - oy0), math.abs(py - oy1))
    math.max(math.sqrt(dx * dx + dy * dy),
      2 * math.max(meta.scaleX, meta.scaleY))
  }

  /** k nearest neighbours of (px, py) by 2D distance — the reference
    * declares this mode but never implemented it (retrieve_data.py:40-41).
    * SFC-pruned: probe a circle seeded from the head histogram
    * ([[knnSeedRadius]] — local occupancy, so skewed clouds neither
    * over- nor under-shoot), expand until it holds >= k points (the
    * true kNN set is then inside it), then exact top-k. Driver loop is
    * O(log radius) *jobs* worst case and one job on the seeded path,
    * never per-point work. */
  def knn(px: Double, py: Double, k: Int): DataFrame =
    knnWithStats(px, py, k)._1

  /** [[knn]] plus (probe rounds, seed radius) — the spec pins the
    * job-count bound on adversarially skewed clouds. */
  private[operators] def knnWithStats(px: Double, py: Double,
      k: Int): (DataFrame, Int, Double) = {
    require(k > 0, "k must be positive")
    // a circle of radius >= distance to the farthest bbox corner covers
    // ALL data, wherever the query point lies (incl. outside the extent)
    val maxCornerDist = math.sqrt(
      math.pow(math.max(math.abs(px - meta.xMin), math.abs(px - meta.xMax)), 2) +
        math.pow(math.max(math.abs(py - meta.yMin), math.abs(py - meta.yMax)), 2))
    val seed = math.min(knnSeedRadius(px, py, k), maxCornerDist)
    var r = seed
    var rounds = 0
    var result: DataFrame = null
    while (result == null) {
      rounds += 1
      val covers = r >= maxCornerDist
      val cand = circleQuery(Circle(px, py, r))
      if (covers || cand.count() >= k) result = cand else r *= 2
    }
    val d2 = (col("x") - px) * (col("x") - px) + (col("y") - py) * (col("y") - py)
    (result.orderBy(d2.asc, col("x").asc, col("y").asc, col("z").asc).limit(k),
      rounds, seed)
  }

  /** Batch kNN: the k nearest neighbours of EVERY query point in one
    * plan — the production form of [[knn]] when a workload carries many
    * probes. One shared radius expands until every query's circle holds
    * >= k candidates (verified for all queries in a single aggregate
    * job per round, not one job per query); the final ranking is a
    * per-query window over the SFC-pruned candidate union, so the
    * shuffle carries only candidates (~Q * k * expansion), never the
    * cloud. Ties break on (d2, x, y, z) like [[knn]]. */
  def knnBatch(queries: Seq[(Long, Double, Double)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(queries.nonEmpty, "need at least one query point")
    val maxCornerDist = queries.map { case (_, px, py) =>
      math.sqrt(
        math.pow(math.max(math.abs(px - meta.xMin), math.abs(px - meta.xMax)), 2) +
          math.pow(math.max(math.abs(py - meta.yMin), math.abs(py - meta.yMax)), 2))
    }.max
    // shared radius: the largest per-query histogram seed guarantees
    // every query's circle holds >= k points on the first probe
    var r = math.min(
      queries.map { case (_, px, py) => knnSeedRadius(px, py, k) }.max,
      maxCornerDist)
    var result: DataFrame = null
    while (result == null) {
      val covers = r >= maxCornerDist
      val tagged = queries.map { case (qid, px, py) =>
        circleQuery(Circle(px, py, r)).select(
          lit(qid).as("qid"),
          ((col("x") - px) * (col("x") - px) +
            (col("y") - py) * (col("y") - py)).as("__d2"),
          col("x"), col("y"), col("z"))
      }.reduce(_ unionAll _)
      if (covers) result = tagged
      else {
        val counts = tagged.groupBy(col("qid")).count().collect()
          .map(row => row.getLong(0) -> row.getLong(1)).toMap
        if (queries.forall { case (qid, _, _) => counts.getOrElse(qid, 0L) >= k })
          result = tagged
        else r *= 2
      }
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("__d2").asc, col("x").asc, col("y").asc, col("z").asc)
    result.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("x"), col("y"), col("z"))
  }

  /** Height refinements (retrieve_data.py:85-101): keep z <= maxZ / z >= minZ.
    * Compose on any query result: cloud.bboxQuery(b).filter(...) — these are
    * the named forms. */
  def withMaxZ(df: DataFrame, maxZ: Double): DataFrame = df.filter(col("z") <= maxZ)
  def withMinZ(df: DataFrame, minZ: Double): DataFrame = df.filter(col("z") >= minZ)

  /** Per-block occupancy histogram by quadtree cell (reference's side CSV,
    * point_processor.py:77-79). With an even tail length the head IS the
    * Morton key of the cell (x >> tailLen/2, y >> tailLen/2), so the cell
    * coordinates are SQL-derivable for the oracle. */
  def histogram: DataFrame = {
    // the head is the Morton key of (x >> t/2, y >> t/2) only when the
    // tail length t is even — an odd tail garbles the decode silently
    require(meta.tailLen % 2 == 0,
      s"histogram needs an even tail length (cell decode invariant); got ${meta.tailLen}")
    blocks.select(
      sfc.morton_x(col("sfc_head")).as("cell_x"),
      sfc.morton_y(col("sfc_head")).as("cell_y"),
      size(col("sfc_tail")).cast(LongType).as("n_points"))
  }

  /** Voxel-grid statistics: per XY cell of `cell` original-coordinate
    * units, the point count and z extremes plus an exact centi-unit z
    * sum (z is stored at 2 decimals — point_processor.py:47 — so
    * round(z*100) is an integer and the sum is order-independent,
    * unlike a double sum). The shape LiDAR tooling calls a density /
    * elevation raster; the reference's histogram (S5) is the special
    * case cell == quadtree block size. One narrow projection + one
    * partially-aggregated shuffle of ~(extent/cell)^2 cells — scale is
    * bounded by the raster size, not the point count. */
  def gridAggregate(cell: Double): DataFrame = {
    require(cell > 0, s"non-positive cell size $cell")
    explodePoints(blocks)
      .groupBy(
        floor(col("x") / cell).cast(LongType).as("cell_x"),
        floor(col("y") / cell).cast(LongType).as("cell_y"))
      .agg(count(lit(1)).as("n_points"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"),
        sum(round(col("z") * 100).cast(LongType)).as("sum_z_centi"))
  }

  /** Deterministic grid thinning: one representative point per XY cell —
    * the lexicographically smallest (x, y, z), so the result is a pure
    * function of the point set (no RNG, no partition-order dependence).
    * `min` over a struct compares field-by-field and partial-aggregates
    * map-side: a single reduced shuffle of one point per cell, the
    * downsample shape that survives any corpus size. */
  def gridDownsample(cell: Double): DataFrame = {
    require(cell > 0, s"non-positive cell size $cell")
    explodePoints(blocks)
      .groupBy(
        floor(col("x") / cell).cast(LongType).as("cell_x"),
        floor(col("y") / cell).cast(LongType).as("cell_y"))
      .agg(min(struct(col("x"), col("y"), col("z"))).as("p"))
      .select(col("cell_x"), col("cell_y"),
        col("p.x").as("x"), col("p.y").as("y"), col("p.z").as("z"))
  }

  /** Cell-to-cell elevation gradient: for each raster cell, the maximum
    * |mean z difference| to its 4-neighborhood — the slope/discontinuity
    * raster terrain tooling derives from a density grid. Neighbor
    * lookup is an EQUI-join: each cell emits its mean under its four
    * neighbors' coordinates (a 4x explode of the raster, not of the
    * points) so the join shuffles raster-sized tables on cell keys —
    * never a non-equi neighbor predicate, which would plan as a
    * nested-loop. Mean z = exact centi sum / (100 * n): identical
    * IEEE division on both engines, so max|diff| is hash-comparable. */
  def gridSlope(cell: Double): DataFrame = {
    val m = gridAggregate(cell).select(col("cell_x"), col("cell_y"),
      (col("sum_z_centi").cast("double") / (lit(100.0) * col("n_points")))
        .as("mean_z"))
    val offsets = array(
      struct(lit(1L).as("dx"), lit(0L).as("dy")),
      struct(lit(-1L).as("dx"), lit(0L).as("dy")),
      struct(lit(0L).as("dx"), lit(1L).as("dy")),
      struct(lit(0L).as("dx"), lit(-1L).as("dy")))
    val contrib = m.select(explode(offsets).as("o"), col("cell_x"),
        col("cell_y"), col("mean_z").as("nb_mean"))
      .select((col("cell_x") + col("o.dx")).as("cell_x"),
        (col("cell_y") + col("o.dy")).as("cell_y"), col("nb_mean"))
    m.join(contrib, Seq("cell_x", "cell_y"))
      .groupBy(col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n_neighbors"),
        max(abs(col("mean_z") - col("nb_mean"))).as("max_dz"))
  }

  /** Exact per-cell ORDER STATISTIC of elevation: the k-th smallest
    * centi-z where k = ceil(permille/1000 * n) — the discrete
    * percentile canopy/height products use (P95 crown height etc.).
    * Discrete-by-construction: no interpolation arithmetic to match
    * across engines, the answer is a value that EXISTS in the cell, so
    * the oracle replays it with the same row_number/count recipe.
    * Ties in z are harmless: row order among equal zc is
    * nondeterministic but the VALUE at any rank is not. One shuffle on
    * the cell key; windows partition by cell (raster-keyed — bounded
    * population per the usual raster-sizing duty, never a global or
    * single-partition window). */
  def gridPercentile(cell: Double, permille: Int = 950): DataFrame = {
    require(cell > 0 && permille >= 1 && permille <= 1000)
    import org.apache.spark.sql.expressions.Window
    val p = explodePoints(blocks).select(
      floor(col("x") / cell).cast(LongType).as("cell_x"),
      floor(col("y") / cell).cast(LongType).as("cell_y"),
      round(col("z") * 100).cast(LongType).as("zc"))
    val w = Window.partitionBy(col("cell_x"), col("cell_y"))
    p.withColumn("rk", row_number().over(w.orderBy(col("zc").asc)))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("rk") === expr(s"(n * $permille + 999) div 1000"))
      .select(col("cell_x"), col("cell_y"), col("n").as("n_points"),
        col("zc").as(s"p${permille}_centi"))
  }

  /** Per-cell least-squares PLANE fit + roughness: fit z = a·x + b·y + c
    * over each raster cell's points and report the slope components and
    * the maximum |residual| — the planarity/roughness raster ground and
    * building classifiers consume (the plane-fit upgrade of
    * [[gridSlope]]'s mean-difference gradient).
    *
    * Exactness: coordinates are CELL-LOCAL integers (dx, dy < cell) and
    * z is centi-quantized, so the normal-equation sums are exact
    * BIGINTs and Cramer's rule runs in exact integer arithmetic down to
    * three final correctly-rounded divisions — a bit-reproducible plane
    * fit. The three 2x2 minors are shared between the determinant and
    * the a-numerator (same submatrix columns). Degenerate cells
    * (det == 0: fewer than 3 points or collinear layouts) are excluded
    * exactly. Residuals then evaluate per point in one fixed-order
    * double expression. Integer envelope: |terms| <= n·cell²·(n·cell² +
    * n·zMax·100) per product — for cell = 64, z <= 50 that holds to
    * ~5000 points per cell; size cells so the per-cell population stays
    * inside it (the same raster-sizing duty every grid op has).
    *
    * Scale shape: one narrow projection, ONE partially-aggregated
    * raster-sized shuffle for the sums, a raster-sized fit table, and
    * an equi-join of points back to their cell's fit (2 scans total —
    * the slope-raster join pattern, never a window over points). */
  def gridPlanarity(cell: Double): DataFrame = {
    require(cell > 0, s"non-positive cell size $cell")
    val p = explodePoints(blocks).select(
      floor(col("x") / cell).cast(LongType).as("cell_x"),
      floor(col("y") / cell).cast(LongType).as("cell_y"),
      (col("x") - floor(col("x") / cell) * cell).cast(LongType).as("dx"),
      (col("y") - floor(col("y") / cell) * cell).cast(LongType).as("dy"),
      round(col("z") * 100).cast(LongType).as("zc"))
    val s = p.groupBy(col("cell_x"), col("cell_y")).agg(
      count(lit(1)).as("n"),
      sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("zc")).as("sxz"),
      sum(col("dy") * col("zc")).as("syz"),
      sum(col("zc")).as("sz"))
    // shared first-column minors of [[sxx sxy sx][sxy syy sy][sx sy n]]
    val m11 = col("syy") * col("n") - col("sy") * col("sy")
    val m21 = col("sxy") * col("n") - col("sx") * col("sy")
    val m31 = col("sxy") * col("sy") - col("sx") * col("syy")
    val det = col("sxx") * m11 - col("sxy") * m21 + col("sx") * m31
    val detA = col("sxz") * m11 - col("syz") * m21 + col("sz") * m31
    val n11 = col("syz") * col("n") - col("sy") * col("sz")
    val n21 = col("sxz") * col("n") - col("sx") * col("sz")
    val n31 = col("sxz") * col("sy") - col("sx") * col("syz")
    val detB = col("sxx") * n11 - col("sxy") * n21 + col("sx") * n31
    val p11 = col("syy") * col("sz") - col("syz") * col("sy")
    val p21 = col("sxy") * col("sz") - col("sxz") * col("sy")
    val p31 = col("sxy") * col("syz") - col("sxz") * col("syy")
    val detC = col("sxx") * p11 - col("sxy") * p21 + col("sx") * p31
    val fit = s.withColumn("det", det)
      .filter(col("det") =!= 0L)
      .select(col("cell_x"), col("cell_y"), col("n").as("n_points"),
        (detA.cast("double") / col("det").cast("double")).as("slope_x"),
        (detB.cast("double") / col("det").cast("double")).as("slope_y"),
        (detC.cast("double") / col("det").cast("double")).as("icept_centi"))
    // fit is raster-sized however many points there are — pin it as the
    // broadcast side so the point pass never shuffles at any scale
    p.join(broadcast(fit), Seq("cell_x", "cell_y"))
      .groupBy(col("cell_x"), col("cell_y"))
      .agg(max(col("n_points")).as("n_points"),
        max(col("slope_x")).as("slope_x"), max(col("slope_y")).as("slope_y"),
        max(abs(col("zc").cast("double") -
          (col("slope_x") * col("dx") + col("slope_y") * col("dy") +
            col("icept_centi")))).as("max_resid_centi"))
  }

  /** Radius outlier removal (the PDAL `filters.ror` shape): keep the
    * points whose 3D neighborhood population within `radius` — the
    * point's own multiset identity included — reaches `minNeighbors`;
    * isolated noise returns drop. Count semantics are by (x, y, z)
    * IDENTITY with multiplicity, so duplicate points reinforce each
    * other and every surviving duplicate row is emitted.
    *
    * Scale shape: a cell-blocked spatial self-join — identities bucket
    * into radius-sized XY cells, one side explodes to its 3x3
    * neighborhood (a 9x explode of the DISTINCT identities, never the
    * point multiset), the join is an EQUI-join on cell keys, and the
    * exact squared-distance test runs on candidates only (local
    * density x 9, never n²). The dropped-identity set (outlier-sized
    * by contract) then broadcast-anti filters the exploded points.
    *
    * Identity is the (x, y, z) triple itself — every identity-keyed
    * stage (the multiplicity groupBy, the neighbor-count groupBy, the
    * final anti-join) groups or joins on the raw double triple, which
    * matches the oracle's GROUP BY verbatim, carries no hash-collision
    * semantics, and keeps every aggregation a partial-combined
    * HashAggregate (an earlier xxhash64 rekeying needed a
    * representative aggregation whose struct-max planned as
    * SortAggregate — measured slower, PLANS.md). Spark normalizes
    * -0.0 in group/join keys, so signed zeros agree with SQL
    * equality. */
  def radiusOutlierRemoval(radius: Double, minNeighbors: Long): DataFrame = {
    require(radius > 0 && minNeighbors >= 1)
    val pts = explodePoints(blocks)
    // identity IS the coordinate triple: grouping by (x, y, z)
    // directly replaces the earlier xxhash64 rekeying — no hash, so
    // no collision semantics at all (the collided-representative
    // question dissolves), the key matches the oracle's GROUP BY
    // 1,2,3 verbatim, and the aggregation stays a plain partial-
    // combined HashAggregate where the struct-max representative
    // forced SortAggregate (PLANS.md); the exchange carries
    // (24-byte key, count) vs the hash form's (8-byte id + 24-byte
    // representative, count) — strictly narrower.
    // MATERIALIZED once (r21): both the probe explode and the q side
    // consume this frame, and without a cut each side re-ran the
    // whole scan+decode+aggregate from the raw blocks (two identical
    // HashAggregate subtrees in the r20 plan). The blocks are freed
    // as soon as the (outlier-sized) dropped set is materialized.
    val ids = Frames.cutLocal(pts.groupBy(col("x"), col("y"), col("z"))
      .agg(count(lit(1)).as("__m")))
    def cellOf(c: Column) = floor(c / radius).cast(LongType)
    val q = ids.select(col("x").as("__qx"), col("y").as("__qy"),
      col("z").as("__qz"), col("__m"),
      cellOf(col("x")).as("__cx"), cellOf(col("y")).as("__cy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probe = ids.select(col("x"), col("y"), col("z"),
        cellOf(col("x")).as("__px"), cellOf(col("y")).as("__py"),
        explode(offsets).as("o"))
      .select(col("x"), col("y"), col("z"),
        (col("__px") + col("o.dx")).as("__cx"),
        (col("__py") + col("o.dy")).as("__cy"))
    val d2 = (col("__qx") - col("x")) * (col("__qx") - col("x")) +
      (col("__qy") - col("y")) * (col("__qy") - col("y")) +
      (col("__qz") - col("z")) * (col("__qz") - col("z"))
    // every identity self-pairs (same cell, d2 = 0), so the counts
    // cover ALL identities and the complement is exact: emit the
    // DROPPED set (outliers — rare by definition) and anti-join, so
    // the build side is outlier-sized and AQE broadcasts it; the point
    // multiset itself never shuffles. The semi-join formulation would
    // shuffle every point against a kept-set as big as the cloud.
    // The cell join is a SHUFFLED-HASH join built on the UN-exploded
    // q side (guide §3.1): Catalyst's static estimate for both sides
    // descends from the kilobyte-scale blocks scan, so it planned a
    // BroadcastHashJoin that built a hash relation over the 9x
    // neighbor EXPLODE of every distinct identity — a single-threaded
    // ~cloud-sized broadcast build (the r20 anti-scaling: 8 cores
    // beat 32 at 0.52 because the build dominates and never
    // parallelizes). Hash-partitioning both sides on the cell key
    // builds and probes in parallel, and cells are radius-sized so
    // no partition's build side can be skewed beyond local density.
    // Measured sf0.1: 3.4 s -> ~1.9 s and the broadcast disappears
    // from the plan.
    val dropped = Frames.materializeCut(
      probe.join(q.hint("SHUFFLE_HASH"), Seq("__cx", "__cy"))
        .filter(d2 <= lit(radius * radius))
        .groupBy(col("x"), col("y"), col("z"))
        .agg(sum(col("__m")).as("__cnt"))
        .filter(col("__cnt") < minNeighbors)
        .select(col("x"), col("y"), col("z")))
    Frames.free(ids)
    // EXPLICIT broadcast, not AQE-adaptive: depending on which side
    // AQE builds the cell join on, the count aggregation can inherit
    // the identity-key partitioning and reach the anti join with no
    // shuffle stage of its own — no runtime-stats point, no broadcast
    // conversion, and the anti join nondeterministically degrades to
    // a SortMergeJoin that re-shuffles the entire point multiset
    // (observed scheduling-dependent at local[4]; a repartition() on
    // the dropped set gets elided as redundant). The dropped set is
    // outlier-sized BY THE OPERATOR'S CONTRACT — that asymmetry is
    // why this is an anti join against DROPPED rather than a semi
    // join against a cloud-sized kept set — so the hint encodes the
    // documented cost model; parameters so loose that "outliers"
    // exceed the broadcast limit fail loudly rather than silently
    // shuffling the cloud.
    pts.join(broadcast(dropped), Seq("x", "y", "z"), "left_anti")
  }

  /** Height above ground per point: ground elevation = the minimum z of
    * the point's XY raster cell (the cheap ground model terrain tooling
    * starts from), hag = z - ground. The ground raster reduces through
    * one partial-agged groupBy (cell rows only in the exchange); points
    * then equi-join their cell's row — the ground side is raster-
    * bounded, so AQE broadcasts it and the POINTS never shuffle. Both
    * operands of the subtraction are the stored doubles, so hag is
    * bit-exact on any engine. */
  def heightAboveGround(cell: Double): DataFrame = {
    require(cell > 0, s"non-positive cell size $cell")
    def cellCols(df: DataFrame): DataFrame = df
      .withColumn("cell_x", floor(col("x") / cell).cast(LongType))
      .withColumn("cell_y", floor(col("y") / cell).cast(LongType))
    val ground = cellCols(explodePoints(blocks))
      .groupBy(col("cell_x"), col("cell_y"))
      .agg(min(col("z")).as("__gz"))
    cellCols(explodePoints(blocks))
      .join(ground, Seq("cell_x", "cell_y"))
      .select(col("x"), col("y"), col("z"), (col("z") - col("__gz")).as("hag"))
  }

  /** Progressive morphological ground filter (the PMF family — Zhang
    * et al. 2003; PDAL `filters.pmf`/`filters.smrf` shape): open the
    * min-z raster (erosion = window min, then dilation = window max)
    * with growing windows, and a point is ground iff it clears EVERY
    * stage's opened surface by at most that stage's threshold —
    * progressive rejection, expressed as one conjunction.
    *
    * `stages` = (windowRadiusCells, elevationThreshold) pairs; each
    * stage opens the PREVIOUS stage's surface (the PMF recipe).
    * Boundary semantics: windows see only existing cells (sparse
    * raster, no padding).
    *
    * Scale shape: every morphological pass is raster-sized — the
    * (2w+1)² neighborhood is an explode of raster ROWS + equi-join on
    * cell keys (the gridSlope recipe), never a non-equi window over
    * points. The per-stage surfaces join into one raster frame that
    * broadcasts to the points (heightAboveGround recipe), so the point
    * multiset never shuffles. Everything compared is a stored double
    * or a single IEEE add — exact on any engine. */
  def morphologicalGround(cell: Double, stages: Seq[(Int, Double)]): DataFrame = {
    require(cell > 0, s"non-positive cell size $cell")
    require(stages.nonEmpty && stages.forall(_._1 >= 1))
    def cellCols(df: DataFrame): DataFrame = df
      .withColumn("cell_x", floor(col("x") / cell).cast(LongType))
      .withColumn("cell_y", floor(col("y") / cell).cast(LongType))
    val pts = cellCols(explodePoints(blocks))

    // One morphological pass = ONE linear shuffle: every raster row
    // explodes to its (2w+1)² offsets, the (0,0) contribution marks
    // the target as an existing cell (so no join back to the cell
    // list — referencing the surface twice would replicate the whole
    // upstream lineage per pass, the plan blow-up the first version
    // of this operator had), and previously-computed stage surfaces
    // ride through as the self row's carried columns (exactly one
    // self contribution per surviving target, so max(when(self, c))
    // recovers them losslessly).
    def pass(surface: DataFrame, value: String, w: Int,
        f: Column => Column, out: String, carried: Seq[String]): DataFrame = {
      val offsets = array((for (dx <- -w to w; dy <- -w to w) yield
        struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
      val contrib = surface
        .select((col("cell_x") +: col("cell_y") +: col(value).as("__v") +:
          carried.map(col)): _*)
        .select((explode(offsets).as("o") +: col("cell_x") +: col("cell_y") +:
          col("__v") +: carried.map(col)): _*)
        .select((
          (col("cell_x") + col("o.dx")).as("cell_x") +:
          (col("cell_y") + col("o.dy")).as("cell_y") +:
          col("__v") +:
          (col("o.dx") === 0L && col("o.dy") === 0L).as("__self") +:
          carried.map(col)): _*)
      contrib.groupBy(col("cell_x"), col("cell_y"))
        .agg(f(col("__v")).as(out),
          (max(col("__self")).as("__exists") +:
            carried.map(c => max(when(col("__self"), col(c))).as(c))): _*)
        .filter(col("__exists")) // out-of-raster targets have no self row
        .drop("__exists")
    }

    var surface = pts.groupBy(col("cell_x"), col("cell_y"))
      .agg(min(col("z")).as("__s0"))
    var cur = "__s0"
    var carried = List.empty[String]
    stages.zipWithIndex.foreach { case ((w, _), i) =>
      val eroded = pass(surface, cur, w, min, s"__e$i", carried)
      surface = pass(eroded, s"__e$i", w, max, s"__o$i", carried)
      cur = s"__o$i"
      carried = s"__o$i" :: carried
    }
    val groundCond = stages.zipWithIndex
      .map { case ((_, t), i) => col("z") <= col(s"__o$i") + lit(t) }
      .reduce(_ && _)
    pts.join(surface.select((col("cell_x") +: col("cell_y") +:
        carried.map(col)): _*), Seq("cell_x", "cell_y"))
      .select(col("x"), col("y"), col("z"),
        when(groundCond, lit(1)).otherwise(lit(0)).as("is_ground"))
  }

  /** The catalog row as a DataFrame (pc_metadata equivalent). */
  def metadataDf: DataFrame =
    spark.createDataset(Seq(meta))(Encoders.product[CloudMeta]).toDF()

  /** Export any (x, y, z) query result to a LAS file with the
    * reference exporter's fixed header (exporter.py:76-89). */
  def exportLas(result: DataFrame, path: String): Unit =
    graft.sources.Las.writePoints(result, path)
}
