package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Bbox, Circle}
import graft.operators.{ImportSpec, PointCloud}

class QueryRunnerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val cloud = {
    val pts = for (x <- 0 until 50; y <- 0 until 50)
      yield (x.toDouble, y.toDouble, (x % 7).toDouble)
    PointCloud.importPoints(pts.toDF("x", "y", "z"), ImportSpec(name = "qr"))
  }

  private def parse(json: String) = new ObjectMapper().readTree(json)

  test("reference-format specs dispatch to the right queries") {
    val bbox = QueryRunner.runOne(cloud,
      parse("""{"mode": "bbox", "geometry": [10, 20, 10, 20]}"""))
    assert(bbox.count() == cloud.bboxQuery(Bbox(10, 20, 10, 20)).count())
    assert(bbox.count() == 121)

    val circle = QueryRunner.runOne(cloud,
      parse("""{"mode": "circle", "geometry": [[25, 25], 5]}"""))
    assert(circle.count() == cloud.circleQuery(Circle(25, 25, 5)).count())

    val poly = QueryRunner.runOne(cloud,
      parse("""{"mode": "polygon",
        "geometry": "POLYGON ((9.5 9.5, 20.5 9.5, 20.5 20.5, 9.5 20.5, 9.5 9.5))"}"""))
    assert(poly.count() == 121)

    val zChained = QueryRunner.runOne(cloud,
      parse("""{"mode": "bbox", "geometry": [0, 49, 0, 49], "maxz": 3, "minz": 2}"""))
    // z in {2, 3}: x % 7 in {2, 3} -> 14 columns of 50
    assert(zChained.count() == 700)

    val nn = QueryRunner.runOne(cloud,
      parse("""{"mode": "nn", "geometry": [25.2, 25.2], "k": 4}"""))
    assert(nn.count() == 4)
  }
}
