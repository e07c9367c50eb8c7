package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.sources.{JdbcUpsertSink, Readers}

/** Real JDBC execution against embedded Derby (ships with Spark):
  * the dimension-read path (reference: city_info via JDBC,
  * AreaTop3ProductSpark.java:180-228) and the executor-side batched
  * insert path, end-to-end through java.sql.
  */
class JdbcRoundtripSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JDBC dimension read + partitioned batched write round-trip") {
    // seed a dimension table over plain JDBC
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE city_info (city_id INT, city_name VARCHAR(32), area VARCHAR(32))")
    Seq((0, "Beijing", "North"), (1, "Shanghai", "East"), (2, "Nanjing", "East"))
      .foreach { case (id, n, a) =>
        st.execute(s"INSERT INTO city_info VALUES ($id, '$n', '$a')")
      }
    st.execute("CREATE TABLE area_counts (area VARCHAR(32), n INT)")
    conn.close()

    // read through the engine's JDBC reader
    val dim = Readers.jdbcTable(spark, url, "city_info", "", "")
    assert(dim.count() == 3)
    val eastern = dim.where(col("AREA") === "East").count()
    assert(eastern == 2)

    // aggregate and write back via the batched partition writer
    val counts = dim.groupBy("AREA").agg(count(lit(1)).cast("int").as("N"))
    val insertSql = JdbcUpsertSink.insertSql("area_counts", Seq("AREA", "N"))
    counts.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      JdbcUpsertSink.writePartition(rows, insertSql, Seq("AREA", "N"),
        () => DriverManager.getConnection("jdbc:derby:memory:graftdb"),
        batchSize = 10)
    }

    // verify the written rows over plain JDBC
    val check = DriverManager.getConnection(url)
    val rs = check.createStatement()
      .executeQuery("SELECT area, n FROM area_counts ORDER BY area")
    val got = Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getString(1), r.getInt(2))).toList
    check.close()
    assert(got == List(("East", 2), ("North", 1)))
  }
}
