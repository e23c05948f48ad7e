package graft.engine

import org.apache.spark.sql.SparkSession

/** Step-level profile of the g7 bulk AUTO_INCREMENT path (round-10
  * verdict task: "close g7 to ≤2 s, WITH a profile"). Times each
  * engine statement of the g7 battery recipe separately so the
  * dominant term is measured, not guessed. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.engine.ProfileG7"
  */
object ProfileG7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def step[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[g7prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // Warm the session the way the bench battery does (g7 never runs
    // first there): one throwaway pass of the whole recipe.
    for (pass <- 1 to 3) {
      System.err.println(s"[g7prof] ---- pass $pass ----")
      step("registerAll")(graft.Tables.registerAll(spark, sfDir))
      val g = new Engine(spark)
      step("freshDb") {
        g.execute("DROP DATABASE IF EXISTS g7db")
        val loc = java.nio.file.Files.createTempDirectory("graft_g7db").toFile.getAbsolutePath
        g.execute(s"CREATE DATABASE g7db LOCATION '$loc'")
      }
      step("create_table")(g.execute(
        "CREATE TABLE g7db.li (id INTEGER AUTO_INCREMENT, okey INTEGER, qty FLOAT)"))
      step("insert_1")(g.execute(
        "INSERT INTO g7db.li (okey, qty) SELECT l_orderkey, l_quantity FROM lineitem"))
      step("insert_2")(g.execute(
        "INSERT INTO g7db.li (okey, qty) SELECT l_orderkey, l_quantity FROM lineitem"))
      val df = step("final_query")(g.query(
        """SELECT COUNT(*) AS n, CAST(MIN(id) AS BIGINT) AS min_id,
          |  CAST(MAX(id) AS BIGINT) AS max_id,
          |  COUNT(DISTINCT id) AS n_ids, SUM(id) AS sum_ids
          |FROM g7db.li""".stripMargin))
      step("collect")(df.collect().foreach(r => System.err.println(s"[g7prof] $r")))
    }
    spark.stop()
  }
}
