package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Scratch plan-capture tool (not part of the driver contract): writes
  * `.explain("formatted")` of named declared queries to `<outdir>/<name>.txt`
  * so optimization rounds can commit before/after plan evidence.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.PlanDump /root/repo/plans/r18 _before d47_pipeline_pack ..."
  * The second arg is a filename suffix; pass "" for none.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val txt =
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        } catch {
          case e: Exception => s"explain failed: $e"
        }
      Files.write(Paths.get(outDir, s"$name$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $name$suffix (${txt.length} chars)")
    }
    spark.stop()
  }
}
