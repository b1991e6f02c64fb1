package graft

/** Mechanical completeness guard for [[Bench.SetupQueries]].
  *
  * The bench's untimed setup pass is only honest if it provisions EVERY
  * persisted artifact the timed surface would otherwise build mid-rep —
  * a future artifact-backed query added without a setup entry would
  * silently reintroduce the r9 rep-cap pathology (one-time build riding
  * a contention burst into a 2-rep minimum). This spec proves the list
  * complete by construction: on a FRESH copy of the sf0.001 tables
  * (fresh file identity ⇒ fresh fingerprints ⇒ every build-once gate
  * re-fires), running only the setup queries must create every
  * warehouse artifact that subsequently constructing the ENTIRE query
  * surface creates. All builds are eager (they run inside the query
  * function body, before any action), so construction alone triggers
  * them.
  */
class ProvisioningSpec extends SparkSpec {

  test("Bench.SetupQueries provisions every artifact the full query surface builds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prov").toFile
    val src = new java.io.File(sf0001)
    src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(tmp, f.getName).toPath)
    }
    val dir = tmp.getAbsolutePath
    val sanitized = dir.replaceAll("[^A-Za-z0-9]", "_")
    val wh = new java.io.File(graft.sources.Artifacts.Warehouse)
    def entries(): Set[String] =
      Option(wh.list()).getOrElse(Array.empty[String]).filter(_.contains(sanitized)).toSet
    try {
      Bench.SetupQueries.foreach(n => SparkEntry.queries(n)(spark, dir))
      val afterSetup = entries()
      assert(afterSetup.nonEmpty, "setup queries built nothing — fingerprinting broke?")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) => fn(spark, dir) }
      val leaked = entries() -- afterSetup
      assert(leaked.isEmpty,
        s"artifacts built OUTSIDE the setup pass — add their builder query to " +
          s"Bench.SetupQueries or the one-time cost lands in a timed rep: $leaked")
    } finally {
      cleanupWarehouseFor(dir)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }
}
