package graft

/** Measurement main (r19, VERDICT item 4): times the PQ/IVF model and
  * index provisioning COLD — in-memory caches cleared and the warehouse
  * artifacts for the given dir deleted first — so the untimed-setup cost
  * the bench's alarm watches can be measured in isolation, before/after
  * the PqAssignCodes kernel. Usage:
  * `sbt "runMain graft.SetupProbe [sfDir]"`. */
object SetupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // drop this dir's PQ/IVF derived artifacts (content-fingerprinted
    // caches — rebuilt deterministically) + the in-memory tiers
    val dirKey = dir.replaceAll("[^A-Za-z0-9]", "_")
    val wh = new java.io.File(graft.sources.Artifacts.Warehouse)
    val victims = Option(wh.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.contains(dirKey) &&
        (f.getName.startsWith("pq_") || f.getName.startsWith("ivfpq_") ||
         f.getName.startsWith("ivf_model_")))
    victims.foreach { f =>
      println(s"[setup-probe] dropping ${f.getName}")
      org.apache.commons.io.FileUtils.deleteDirectory(f)
    }
    graft.operators.Similarity.clearTrainedMemory()
    graft.operators.Similarity.clearPqMemory()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[setup-probe] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val t0 = System.nanoTime()
    time("ivf_model (3 iters)     ")(graft.operators.Similarity.trainIvfCentroids(spark, dir))
    time("ivf_model corpusOnly    ")(graft.operators.Similarity.trainIvfCentroids(spark, dir, corpusOnly = true))
    time("pq_model (2 iters)      ")(graft.operators.Similarity.trainPqCodebooks(spark, dir))
    time("pq_model corpusOnly     ")(graft.operators.Similarity.trainPqCodebooks(spark, dir, corpusOnly = true))
    time("pq_codes encode         ")(graft.operators.Similarity.pqCodesTable(spark, dir).count())
    time("ivfpq_index encode      ")(graft.operators.Similarity.ivfPqIndexTable(spark, dir).count())
    time("ivfpq_cand probe        ")(graft.operators.Similarity.ivfPqCandTable(spark, dir).count())
    println(f"[setup-probe] TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
