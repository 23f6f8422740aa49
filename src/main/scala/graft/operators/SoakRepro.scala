package graft.operators
import org.apache.spark.sql.{DataFrame, functions => F}
object SoakRepro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]",
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val st = PipelineQueries.buildInc(spark, dir)
    def h(stM: PipelineQueries.IncStages, label: String): Unit = {
      val r = graft.ConcurrentHarness.resultHash(PipelineQueries.attritionInc(stM))
      println(s"$label -> $r")
    }
    def empty(df: DataFrame) = df.limit(0)
    h(st, "baseline")
    h(st.copy(qB = empty(st.qB)), "qB empty")
    h(st.copy(repB = empty(st.repB)), "repB empty")
    h(st.copy(ldBat = empty(st.ldBat)), "ldBat empty")
    h(st.copy(poDrop = empty(st.poDrop)), "poDrop empty")
    h(st.copy(pnDrop = empty(st.pnDrop)), "pnDrop empty")
    h(st.copy(rw = empty(st.rw)), "rw empty")
    h(st.copy(clean = empty(st.clean)), "clean empty")
    h(st.copy(sem = empty(st.sem)), "sem empty")
    spark.stop()
  }
}
