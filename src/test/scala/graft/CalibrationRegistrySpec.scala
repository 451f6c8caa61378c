package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the calibration-only registry: every annotated query exists, names
  * a production twin that also exists, and the sweep-tool mirror file
  * (`tools/calibration_only.json`, read by merge_scale_sweep.py to
  * adjudicate >20x scale ratios) cannot drift from
  * [[SparkEntry.calibrationOnly]]. */
class CalibrationRegistrySpec extends AnyFunSuite {

  test("calibration-only entries are registered queries with registered twins") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.calibrationOnly.foreach { case (name, reason) =>
      assert(qs.contains(name), s"$name not in queries")
      val twin = "production twin (\\w+)".r.findFirstMatchIn(reason)
      assert(twin.isDefined, s"$name reason must name its production twin")
      assert(qs.contains(twin.get.group(1)),
        s"$name's twin ${twin.get.group(1)} not in queries")
    }
  }

  test("tools/calibration_only.json mirrors SparkEntry.calibrationOnly") {
    assert(mirror("tools/calibration_only.json") == SparkEntry.calibrationOnly,
      "edit both SparkEntry.calibrationOnly and tools/calibration_only.json")
  }

  test("data-proportional entries are registered queries with per-unit evidence") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.dataProportional.nonEmpty)
    SparkEntry.dataProportional.foreach { case (name, reason) =>
      assert(qs.contains(name), s"$name not in queries")
      assert(reason.startsWith("per-unit metric: "),
        s"$name must lead with its measured per-unit evidence")
      assert(!SparkEntry.calibrationOnly.contains(name),
        s"$name cannot be both calibration-only and data-proportional")
    }
  }

  test("tools/data_proportional.json mirrors SparkEntry.dataProportional") {
    assert(mirror("tools/data_proportional.json") ==
      SparkEntry.dataProportional,
      "edit both SparkEntry.dataProportional and tools/data_proportional.json")
  }

  /** Parse a flat single-level JSON object with no escaped quotes. */
  private def mirror(path: String): Map[String, String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    "\"([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
  }
}
