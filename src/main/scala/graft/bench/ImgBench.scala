package graft.bench
object ImgBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val s = Headline.session(cpus)
    s.sparkContext.setLogLevel("WARN")
    val path = Headline.stage(s, Headline.defaultRows)
    val (rows, rps) = Headline.measure(Headline.imagePoints(s, path))
    println(f"""{"metric":"image_table_rows_per_sec","value":$rps%.1f,"cpus":$cpus,"rows":$rows}""")
    s.stop()
  }
}
