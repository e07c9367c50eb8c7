package graft

import graft.sources.JdbcUpsertSink
import graft.sources.JdbcUpsertSink.{Additive, Overwrite}

class JdbcSinkSpec extends SparkSpec {

  test("additive upsert SQL adds incoming values") {
    val sql = JdbcUpsertSink.upsertSql("ad_user_click_count",
      Seq("date", "user_id", "ad_id"), Seq("click_count"), Additive)
    assert(sql ==
      "INSERT INTO ad_user_click_count (date, user_id, ad_id, click_count) " +
      "VALUES (?, ?, ?, ?) " +
      "ON DUPLICATE KEY UPDATE click_count = click_count + VALUES(click_count)")
  }

  test("overwrite upsert SQL assigns incoming values") {
    val sql = JdbcUpsertSink.upsertSql("ad_stat",
      Seq("date", "province", "city", "ad_id"), Seq("click_count"), Overwrite)
    assert(sql.endsWith("ON DUPLICATE KEY UPDATE click_count = VALUES(click_count)"))
  }

  test("delete+insert SQL pair for transactional replace") {
    assert(JdbcUpsertSink.deleteSql("ad_province_top3", Seq("date", "province")) ==
      "DELETE FROM ad_province_top3 WHERE date = ? AND province = ?")
    assert(JdbcUpsertSink.insertSql("t", Seq("a", "b")) ==
      "INSERT INTO t (a, b) VALUES (?, ?)")
  }

  test("writePartition batches rows through a fake connection") {
    // minimal fake: count addBatch/executeBatch via dynamic proxy
    import java.sql.{Connection, PreparedStatement}
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    var added = 0; var executed = 0; var committed = 0
    val stH = new InvocationHandler {
      def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
        case "addBatch" => added += 1; null
        case "executeBatch" => executed += 1; Array.empty[Int]
        case _ => null
      }
    }
    val st = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]), stH).asInstanceOf[PreparedStatement]
    val connH = new InvocationHandler {
      def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
        case "prepareStatement" => st
        case "commit" => committed += 1; null
        case _ => null
      }
    }
    val conn = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), connH).asInstanceOf[Connection]
    import org.apache.spark.sql.Row
    // schema-aware getAs needs named fields:
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    val named = (1 to 1203).map(i =>
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array(i, s"v$i"), schema): Row).iterator
    JdbcUpsertSink.writePartition(named, "sql", Seq("k", "v"), () => conn, batchSize = 500)
    assert(added == 1203)
    assert(executed == 3) // 500, 1000, final flush
    assert(committed == 1)
  }
}
