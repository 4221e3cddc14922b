package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.001"
    for (n <- args) {
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
  }
}
