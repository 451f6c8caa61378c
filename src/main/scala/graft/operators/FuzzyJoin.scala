package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance self-join — the entity-resolution primitive: all pairs of
  * rows whose key strings are within Levenshtein distance `d`.
  *
  * Blocking is the symmetric-deletion scheme (SymSpell): if
  * `ed(s, t) <= d` then deleting the edited positions from each side
  * yields a COMMON variant reachable by at most d single-character
  * deletions from both s and t — so the equi-join of deletion
  * neighborhoods is a complete candidate generator (no false negatives;
  * FuzzyJoinSpec checks against the naive quadratic join). Candidates are
  * then verified with the exact `levenshtein` builtin.
  *
  * Shape at scale: the neighborhood explode is a narrow Generate bounded
  * by O(len^2 / 2) variants per row for d=2 (~50 for a 10-char key); the
  * join shuffles on short variant strings; the quadratic cross product
  * never exists. Built for short keys (names, titles, codes) — for long
  * documents use the MinHash/SimHash paths, which bound work by token
  * sketches instead of character neighborhoods.
  */
object FuzzyJoin {

  /** All-pairs self-join. Returns (id_a, id_b, <strCol>_a, <strCol>_b,
    * distance) with id_a < id_b, each pair once. `d` in 0..2. */
  def selfJoin(rows: DataFrame, idCol: String, strCol: String, d: Int): DataFrame = {
    require(d >= 0 && d <= 2, s"supported distances: 0..2, got $d")
    val base = rows.select(col(idCol).as("__id"), col(strCol).as("__s"))

    // deletion neighborhood as a narrow Generate chain
    val d0 = base.select(col("__id"), col("__s"), col("__s").as("v"))
    val variants =
      if (d == 0) d0
      else {
        val del1 = base
          .select(col("__id"), col("__s"), col("__s").as("__s0"),
            explode(sequence(lit(0), length(col("__s")) - 1)).as("__i"))
          .select(col("__id"), col("__s"),
            concat(col("__s0").substr(lit(1), col("__i")),
              expr("substring(__s0, __i + 2)")).as("v"))
        if (d == 1) d0.unionByName(del1)
        else {
          val del2 = del1
            .where(length(col("v")) > 0)
            .select(col("__id"), col("__s"), col("v").as("__s0"),
              explode(sequence(lit(0), length(col("v")) - 1)).as("__i"))
            .select(col("__id"), col("__s"),
              concat(col("__s0").substr(lit(1), col("__i")),
                expr("substring(__s0, __i + 2)")).as("v"))
          d0.unionByName(del1).unionByName(del2)
        }
      }
    val nbhd = variants.distinct()

    val a = nbhd.select(col("__id").as("id_a"), col("__s").as("sa"), col("v"))
    val b = nbhd.select(col("__id").as("id_b"), col("__s").as("sb"), col("v"))
    a.join(b, "v")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sa", "sb")
      .distinct()
      .withColumn("distance", levenshtein(col("sa"), col("sb")))
      .where(col("distance") <= d)
      .select(col("id_a"), col("id_b"),
        col("sa").as(s"${strCol}_a"), col("sb").as(s"${strCol}_b"),
        col("distance").cast("long").as("distance"))
  }
}
