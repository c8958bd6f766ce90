package graft.bench
import org.apache.spark.sql.SparkSession
object AnsiCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println("ansi=" + s.conf.get("spark.sql.ansi.enabled"))
    import s.implicits._
    try {
      val r = Seq(Long.MaxValue).toDF("x").selectExpr("x * 3 as y").collect()(0).getLong(0)
      println("overflow_mul=" + r)
    } catch { case e: Throwable => println("overflow_mul threw: " + e.getClass.getName + " " + e.getMessage.take(100)) }
    s.stop()
  }
}
