package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Sketch

class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .getOrCreate()

  import spark.implicits._

  private def gramsOf(seq: Seq[String]) = seq.toDF("gram")

  test("cms never under-counts; wide sketch is exact") {
    // 400 occurrences over 40 distinct grams
    val occs = (1 to 400).map(i => s"gram${i % 40}")
    val grams = gramsOf(occs)
    val exact = occs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((w, mustBeExact) <- Seq(16 -> false, 65536 -> true)) {
      val grid = Sketch.cmsBuild(grams, "gram", depth = 3, width = w)
      val est = Sketch.cmsEstimate(gramsOf(exact.keys.toSeq), "gram",
          grid, 3, w)
        .as[(String, Long)].collect().toMap
      for ((g, e) <- est) {
        assert(e >= exact(g), s"w=$w $g: est $e < exact ${exact(g)}")
        if (mustBeExact) assert(e == exact(g), s"w=$w $g: $e != ${exact(g)}")
      }
    }
  }

  test("grid is bounded by depth x width and deterministic") {
    val grams = gramsOf((1 to 1000).map(i => s"g$i"))
    val a = Sketch.cmsBuild(grams, "gram", 3, 32)
      .orderBy("r", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(a.size <= 3 * 32)
    assert(a.map(_._3).sum == 3000L) // every occurrence lands in each row
    val b = Sketch.cmsBuild(grams.repartition(7), "gram", 3, 32)
      .orderBy("r", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("unseen gram estimates 0 only when its cells are empty") {
    val grid = Sketch.cmsBuild(gramsOf(Seq("alpha")), "gram", 3, 65536)
    val est = Sketch.cmsEstimate(gramsOf(Seq("never-seen")), "gram",
        grid, 3, 65536)
      .as[(String, Long)].collect().head._2
    assert(est == 0L)
  }
}
