package graft
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/sf0.8")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label min=${reps.min}%.3f reps=${reps.map(r => f"$r%.3f").mkString(",")}")
    }
    val q = "SELECT sum(size(split(text, '\\\\s+'))) AS t FROM docs"
    docs.createOrReplaceTempView("docs")
    // A: rule excluded -> the split-array path
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteTokenCount")
    val planA = spark.sql(q).queryExecution.optimizedPlan.toString
    println("A has kernel: " + planA.contains("graft_ws_token_count"))
    time("A split-array ")(spark.sql(q).collect())
    // B: rule active -> byte-scan kernel
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    val planB = spark.sql(q).queryExecution.optimizedPlan.toString
    println("B has kernel: " + planB.contains("graft_ws_token_count"))
    time("B kernel      ")(spark.sql(q).collect())
    spark.stop()
  }
}
