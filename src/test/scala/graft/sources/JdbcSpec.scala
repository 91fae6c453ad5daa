package graft.sources

import java.sql.DriverManager
import graft.SparkSpec
import graft.sinks.EsControl

/** S1/S11 against an embedded in-memory Derby database (already on the
  * Spark classpath): real JDBC reads, partitioned-read option wiring, and
  * the incremental-gate scalar feeding EsControl.needsRun. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val conn = Jdbc.Conn(url, "", "",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  override def beforeAll(): Unit = {
    super.beforeAll()
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE node_subject (id INT, age INT)")
    (0 until 10).foreach(i =>
      st.executeUpdate(s"INSERT INTO node_subject VALUES ($i, ${20 + i})"))
    st.executeUpdate(
      "CREATE TABLE transaction_logs (id INT, state VARCHAR(20), " +
        "created_datetime TIMESTAMP)")
    st.executeUpdate("INSERT INTO transaction_logs VALUES " +
      "(1, 'SUCCEEDED', TIMESTAMP('2024-01-01 10:00:00'))")
    st.executeUpdate("INSERT INTO transaction_logs VALUES " +
      "(2, 'SUCCEEDED', TIMESTAMP('2024-03-05 08:30:00'))")
    st.executeUpdate("INSERT INTO transaction_logs VALUES " +
      "(3, 'FAILED',    TIMESTAMP('2024-06-01 00:00:00'))") // newer but failed
    c.close()
  }

  test("readTable pulls a node table through JDBC") {
    val df = Jdbc.readTable(spark, conn, "node_subject")
    assert(df.count() === 10L)
    assert(df.columns.map(_.toLowerCase).sorted === Array("age", "id"))
  }

  test("readTablePartitioned splits the range across the requested partitions") {
    val df = Jdbc.readTablePartitioned(spark, conn, "node_subject",
      partitionCol = "id", lower = 0L, upper = 9L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)     // real read parallelism
    assert(df.count() === 10L)                // slices cover the full range
    assert(df.select("id").collect().map(_.getInt(0)).sorted === (0 until 10))
  }

  test("importWorthy excludes transaction/audit tables") {
    assert(Jdbc.importWorthy("node_subject"))
    assert(Jdbc.importWorthy("edge_subjectprojects"))
    assert(!Jdbc.importWorthy("transaction_logs"))
    assert(!Jdbc.importWorthy("transaction_snapshots"))
    assert(!Jdbc.importWorthy("alembic_version"))
  }

  test("latestSucceededTxMillis drives the incremental gate end-to-end") {
    val latest = Jdbc.latestSucceededTxMillis(spark, conn)
    assert(latest.isDefined)
    // the FAILED row is newer but must not count
    val expected = java.sql.Timestamp.valueOf("2024-03-05 08:30:00").getTime
    assert(latest.get === expected)
    // sink older than source → run; sink newer → skip; force always runs
    assert(EsControl.needsRun(latest, Some(expected - 1000)))
    assert(!EsControl.needsRun(latest, Some(expected + 1000)))
    assert(EsControl.needsRun(latest, Some(expected + 1000), force = true))
  }

  test("latestSucceededTxMillis is None when nothing succeeded") {
    val c = DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      "UPDATE transaction_logs SET state = 'FAILED'")
    c.close()
    try {
      assert(Jdbc.latestSucceededTxMillis(spark, conn).isEmpty)
      assert(EsControl.needsRun(None, Some(123L))) // no tx info ⇒ run
    } finally {
      val c2 = DriverManager.getConnection(url)
      c2.createStatement().executeUpdate(
        "UPDATE transaction_logs SET state = 'SUCCEEDED' WHERE id <= 2")
      c2.close()
    }
  }
}
