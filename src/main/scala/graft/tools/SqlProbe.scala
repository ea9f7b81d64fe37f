package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: SQL surface of all registered graft functions. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(master = "local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    println(spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        |  graft_shingles(array('a','b','c','b','c'), 2) AS sh,
        |  graft_minhash(array('a','b','c'), 4, 2) AS mh""".stripMargin)
      .collect()(0))
    try { spark.sql("SELECT graft_minhash(array('a'), 2)").collect() }
    catch { case e: Exception =>
      println(s"arity error ok: ${e.getMessage.linesIterator.next()}") }
    spark.stop()
  }
}
