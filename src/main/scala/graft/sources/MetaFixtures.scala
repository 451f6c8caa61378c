package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic, purely-arithmetic cluster-metadata fixture generator.
  *
  * Mirrors the structure of the reference's synthetic cluster (254 datanodes,
  * 2 datacenters by node parity, 10 racks by `i % 10`, 12 storages per node =
  * 3 states x 4 types; see reference
  * `TestCrossAZBlockPlacementPolicy.java:38-81`), but replaces its unseeded
  * `ThreadLocalRandom`/`UUID.randomUUID` with a 31-bit LCG so every value is a
  * pure function of the row index. That makes the fixture *re-derivable in
  * SQL*: the DuckDB correctness oracle regenerates bit-identical tables from
  * `range()` instead of reading files, so the oracle and the engine share no
  * I/O path at all.
  *
  * Scale note: generators are `spark.range`-based (narrow, no shuffle, no
  * driver materialization) — the `replicas` fact table generator extends to
  * billions of rows by raising [[NumBlocks]]; nothing here collects to the
  * driver.
  */
object MetaFixtures {

  val NumNodes           = 254
  val StoragesPerNode    = 12   // 3 states x 4 types
  val NumBlocks          = 200000L
  /** Fixed "now" for staleness arithmetic — cross-engine determinism. */
  val AsOfMs             = 1700000000000L
  val DefaultStaleMs     = 30000L
  val DefaultBlockSize   = 67108864L        // 64 MiB
  val GiB                = 1073741824L
  val Bucket100GiB       = 107374182400L    // prefer-comparator space bucket

  /** 31-bit LCG (glibc constants). The same expression text is valid Spark
    * SQL and DuckDB SQL as long as the input is BIGINT (no INT32 overflow). */
  def prand(x: String): String = s"((1103515245 * ($x) + 12345) % 2147483648)"

  /** The only dialect difference we need: integer division. */
  final case class Dialect(idiv: (String, String) => String)
  val SparkDialect = Dialect((a, b) => s"($a div $b)")
  val DuckDialect  = Dialect((a, b) => s"($a // $b)")

  // ---------------------------------------------------------------- topology
  /** One row per datanode with the denormalized path columns (dc, rack, path)
    * so ancestor walks are projections, not graph traversals (SURVEY §1.1). */
  def topologyCols(row: String): Seq[String] = {
    val dc   = s"CASE WHEN $row % 2 = 0 THEN 'even' ELSE 'odd' END"
    val rack = s"concat('rack_', $row % 10)"
    Seq(
      s"$row AS node_id",
      s"concat('dn-', $row) AS datanode_uuid",
      s"concat('10.202.77.', $row) AS ip",
      s"concat('datanode_', $row) AS hostname",
      s"$dc AS dc",
      s"$rack AS rack",
      s"concat('/', $dc, '/', $rack, '/10.202.77.', $row) AS path"
    )
  }

  def topology(spark: SparkSession): DataFrame =
    spark.range(1, NumNodes + 1).selectExpr(topologyCols("id"): _*)

  def topologySql: String =
    s"SELECT ${topologyCols("i").mkString(", ")} FROM range(1, ${NumNodes + 1}) t(i)"

  // --------------------------------------------------------------- datanodes
  /** Health/load state per datanode (consumed by the P6 health filter; ref
    * `CrossAZBlockPlacementPolicy.java:365-371`). A small deterministic
    * minority is unhealthy so filters have observable effect. Deviation from
    * FIXTURES.md: `last_heartbeat` is kept as epoch millis (BIGINT) rather
    * than TIMESTAMP for exact cross-engine arithmetic. */
  def datanodeCols(row: String): Seq[String] = Seq(
    s"concat('dn-', $row) AS datanode_uuid",
    s"NOT (${prand(s"$row + 401")} % 73 = 0) AS registered",
    s"(${prand(s"$row + 211")} % 67 = 0) AS decommission_in_progress",
    s"(${prand(s"$row + 101")} % 61 = 0) AS decommissioned",
    s"(${prand(s"$row + 307")} % 71 = 0) AS disallowed",
    // heartbeat age 0..59.9s in 100ms steps: ~half stale at the 30s default
    s"($AsOfMs - (${prand(s"$row + 503")} % 600) * 100) AS last_heartbeat_ms",
    s"(${prand(s"$row + 601")} % 40) AS xceiver_count"
  )

  def datanodes(spark: SparkSession): DataFrame =
    spark.range(1, NumNodes + 1).selectExpr(datanodeCols("id"): _*)

  def datanodesSql: String =
    s"SELECT ${datanodeCols("i").mkString(", ")} FROM range(1, ${NumNodes + 1}) t(i)"

  // ---------------------------------------------------------------- storages
  /** 254 x 12 storages: one per (state x type) per node, capacities in whole
    * GiB in [1, 2048] so LCG output (31-bit) covers the range exactly. */
  def storageCols(row: String, d: Dialect): Seq[String] = {
    val node = s"(1 + ${d.idiv(row, "12")})"
    val s    = d.idiv(s"($row % 12)", "4")    // 0..2
    val t    = s"($row % 4)"                  // 0..3
    val capacity = s"((1 + ${prand(s"$row * 3 + 701")} % 2048) * $GiB)"
    val usedGb   = s"(${prand(s"$row * 5 + 809")} % (1 + ${d.idiv(capacity, GiB.toString)}))"
    Seq(
      s"concat('st-', $node, '-', $s, '-', $t) AS storage_id",
      s"concat('dn-', $node) AS datanode_uuid",
      s"CASE $s WHEN 0 THEN 'NORMAL' WHEN 1 THEN 'READ_ONLY_SHARED' ELSE 'FAILED' END AS state",
      s"CASE $t WHEN 0 THEN 'DISK' WHEN 1 THEN 'SSD' WHEN 2 THEN 'ARCHIVE' ELSE 'RAM_DISK' END AS type",
      s"$capacity AS capacity",
      s"($usedGb * $GiB) AS used",
      s"($capacity - $usedGb * $GiB) AS remaining"
    )
  }

  def storages(spark: SparkSession): DataFrame =
    spark.range(0, NumNodes.toLong * StoragesPerNode)
      .selectExpr(storageCols("id", SparkDialect): _*)

  def storagesSql: String =
    s"SELECT ${storageCols("i", DuckDialect).mkString(", ")} " +
      s"FROM range(0, ${NumNodes * StoragesPerNode}) t(i)"

  // ---------------------------------------------------------------- replicas
  /** Fact table: ~3 replicas per block on LCG-chosen nodes (duplicates
    * possible — the reference's pathological same-node case arises
    * naturally). Every replica sits on the node's NORMAL/DISK storage. */
  def replicaCols(row: String, d: Dialect): Seq[String] = {
    val b    = d.idiv(row, "5")
    val r    = s"($row % 5)"
    val node = s"(1 + ${prand(s"$b * 31 + $r * 7 + 11")} % $NumNodes)"
    Seq(
      s"$b AS block_id",
      s"$r AS replica_index",
      s"concat('dn-', $node) AS datanode_uuid",
      s"concat('st-', $node, '-0-0') AS storage_id"
    )
  }

  def replicaFilter(row: String, d: Dialect): String = {
    val b = d.idiv(row, "5")
    s"($row % 5) < 1 + ${prand(s"$b * 7 + 3")} % 5"
  }

  def replicas(spark: SparkSession): DataFrame =
    spark.range(0, NumBlocks * 5)
      .where(replicaFilter("id", SparkDialect))
      .selectExpr(replicaCols("id", SparkDialect): _*)

  def replicasSql: String =
    s"SELECT ${replicaCols("i", DuckDialect).mkString(", ")} " +
      s"FROM range(0, ${NumBlocks * 5}) t(i) WHERE ${replicaFilter("i", DuckDialect)}"

  // ------------------------------------------------------------------ blocks
  /** Per-block required replication (1..5) — the `require_replica` argument
    * of verifyBlockPlacement, varied so both verification outcomes occur. */
  def blockCols(row: String): Seq[String] = Seq(
    s"$row AS block_id",
    s"(1 + ${prand(s"$row * 13 + 5")} % 5) AS require_replica"
  )

  def blocks(spark: SparkSession): DataFrame =
    spark.range(0, NumBlocks).selectExpr(blockCols("id"): _*)

  def blocksSql: String =
    s"SELECT ${blockCols("i").mkString(", ")} FROM range(0, $NumBlocks) t(i)"

  // ---------------------------------------------------------------- requests
  val NumRequests = 1000L

  /** Placement requests (FIXTURES.md §5): varying replica counts, a third
    * with a writer hint, a seventh excluding the odd datacenter. */
  def requests(spark: SparkSession): DataFrame =
    spark.range(0, NumRequests).selectExpr(
      "id AS request_id",
      s"CAST(1 + ${prand("id * 3 + 17")} % 4 AS INT) AS additional",
      s"CASE WHEN id % 3 = 0 THEN concat('dn-', 1 + ${prand("id * 11 + 23")} % $NumNodes) END AS writer_uuid",
      "CASE WHEN id % 7 = 0 THEN array('/odd') ELSE array() END AS excludes",
      "CAST(12 AS BIGINT) AS block_size")

  /** Favored-nodes placement requests: one favored datanode per request
    * (LCG-chosen so the oracle recomputes it), no writer, a seventh
    * excluding the odd datacenter — which makes odd favored nodes
    * ineligible there, exercising the skip path. */
  def favoredRequests(spark: SparkSession): DataFrame =
    spark.range(0, NumRequests).selectExpr(
      "id AS request_id",
      s"CAST(1 + ${prand("id * 3 + 17")} % 4 AS INT) AS additional",
      "CAST(NULL AS STRING) AS writer_uuid",
      "CASE WHEN id % 7 = 0 THEN array('/odd') ELSE array() END AS excludes",
      s"array(concat('dn-', 1 + ${prand("id * 19 + 41")} % $NumNodes)) AS favored",
      "CAST(12 AS BIGINT) AS block_size")

  /** Common-table-expression prelude for every fixture-based oracle query.
    * DuckDB binds CTEs lazily, so unused ones cost nothing. */
  def cteSql: String =
    s"""WITH topology AS ($topologySql),
       |datanodes AS ($datanodesSql),
       |storages AS ($storagesSql),
       |replicas AS ($replicasSql),
       |blocks AS ($blocksSql)""".stripMargin
}
