package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run a single SparkEntry gate query by name against a chosen
  * SF dir, print its timing (after one warm-up run) and, with `explain`,
  * the formatted physical plan. Usage:
  *   runMain graft.RunOne <query> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc session confs for perf triage: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF token missing '=': '$kv' (expected k=v;k=v)")
        }
      })
    val q = SparkEntry.queries(name)
    if (args.contains("explain")) q(spark, sfDir).explain("formatted")
    q(spark, sfDir).count() // warm-up: JIT + codegen + file index
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    runs.foreach { case (n, s) => println(f"RUNONE $name%s rows=$n%d time=$s%.3f s") }
    spark.stop()
  }
}
