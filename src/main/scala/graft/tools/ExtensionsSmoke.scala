package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM check that `spark.sql.extensions=graft.GraftExtensions`
  * registers the vector expressions for plain SQL use.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT dot_product(normalize_l2(array(cast(3.0 as float), cast(4.0 as float))),
        |                   normalize_l2(array(cast(3.0 as float), cast(4.0 as float)))) AS s,
        |       l2_norm_sq(array(cast(3.0 as float), cast(4.0 as float))) AS n,
        |       md5(float32_le_bytes(array(cast(1.0 as float)))) AS h,
        |       simhash64(array('alpha', 'beta')) AS sh""".stripMargin)
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-6, s"dot=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 25.0) < 1e-6, s"normsq=${row.getDouble(1)}")
    assert(row.getString(2).length == 32)
    assert(row.getString(3).length == 64 && row.getString(3).forall(c => c == '0' || c == '1'))
    // arity error surfaces as an AnalysisException, not an index error
    val err = try { spark.sql("SELECT dot_product(array(cast(1.0 as float)))").collect(); "none" }
    catch { case e: Throwable => e.getClass.getSimpleName }
    println(s"EXTENSIONS_OK arity_err=$err")
    spark.stop()
  }
}
