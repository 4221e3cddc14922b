package graft
import org.apache.spark.sql.SparkSession
object ExplainText {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("text_quality")(spark, "/root/testdata/sf0.001")
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    val n = "TextSignals".r.findAllIn(code).length
    val nEval = "\\.eval\\(".r.findAllIn(code).length
    println(s"TEXTSIGNALS_MENTIONS=$n")
    // count distinct reference-object eval sites for TextSignals
    val sigEvals = "sigs\\d*\\.eval|graft\\.expressions\\.TextSignals".r.findAllIn(code).toList
    println(s"SIG_SITES=${sigEvals.size}")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/text_quality_codegen.txt"), code.getBytes)
    val df2 = SparkEntry.queries("text_langid")(spark, "/root/testdata/sf0.001")
    val code2 = org.apache.spark.sql.execution.debug.codegenString(df2.queryExecution.executedPlan)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/text_langid_codegen.txt"), code2.getBytes)
    println("LANGID_SITES=" + "graft\\.expressions\\.TextSignals".r.findAllIn(code2).length)
    spark.stop()
  }
}
