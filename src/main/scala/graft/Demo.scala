package graft

import org.apache.spark.sql.SparkSession
import graft.engine.Engine

/** Two-engine demo + facade smoke drive (the role `demo.py` plays in
  * the reference): health check, PUT, cross-engine transfer, exchange
  * dispatch including the error and empty-input paths, append
  * semantics, drop semantics. Run:
  *   sbt "runMain graft.Demo [sfDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (a, b) = Engine.pair(spark)
    println("health: " + a.healthCheck())
    a.put("nation", Tables.nation(a.spark, d))
    println("rows in A: " + a.count("nation"))
    a.transferTable(b, "nation")
    println("rows in B via SQL: " +
      b.query("SELECT count(*) AS c FROM nation").collect()(0).getLong(0))

    val c = new Engine(spark.newSession())
    try { c.query("SELECT * FROM nation").collect(); println("ISOLATION BROKEN") }
    catch { case e: Exception =>
      println("isolation ok: " + e.getMessage.linesIterator.next().take(80)) }

    try a.exchange("nope", a.get("nation"))
    catch { case e: IllegalArgumentException => println("unknown cmd: " + e.getMessage) }

    val empty = a.exchange("my_streaming_exchanger", Tables.nation(a.spark, d).limit(0))
    println("empty exchange rows=" + empty.count() + " cols=" + empty.columns.mkString(","))

    a.put("nation", Tables.nation(a.spark, d))
    println("after second put: " + a.count("nation"))

    // DML verbs through the router (reference flight_server.py:320-331)
    a.query("DELETE FROM nation WHERE n_regionkey = 4")
    a.query("UPDATE nation SET n_name = lower(n_name) WHERE n_regionkey = 0")
    println("after verbs: " + a.count("nation") + " lowered=" +
      a.query("SELECT count(*) AS c FROM nation WHERE n_name = lower(n_name)")
        .collect()(0).getLong(0))

    // ALTER routed as catalog rewrites (schema evolution over the verbs)
    a.query("ALTER TABLE nation ADD COLUMN note DOUBLE")
    a.query("ALTER TABLE nation DROP COLUMN note")
    println("alter roundtrip cols: " + a.get("nation").columns.length)

    // network facade: SQL over a real socket, JSON rows back
    val gate = new graft.engine.TcpGate(a)
    try {
      val sock = new java.net.Socket("127.0.0.1", gate.boundPort)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream))
      // stop on EOF too: a dropped connection returns null forever
      def ask(line: String): String = {
        out.println(line)
        Iterator.continually(in.readLine())
          .takeWhile(l => l != null && l != "##end").mkString
      }
      println("tcp gate: " + ask("SELECT count(*) AS c FROM nation"))
      // remote transform registration over the same socket (the wire
      // version of the reference's runtime code shipping)
      println("tcp register: " +
        ask("REGISTER region_counts AS SELECT n_regionkey, count(*) AS n " +
          "FROM __input__ GROUP BY n_regionkey ORDER BY n_regionkey"))
      println("tcp exchange: " + ask("EXCHANGE region_counts FROM nation"))
      sock.close()
    } finally gate.close()

    // authenticated gate: handshake-first protocol
    val auth = new graft.engine.AuthEngine(a, Map("admin" -> "secret1"))
    val gated = new graft.engine.TcpGate(a, auth = Some(auth))
    try {
      val sock = new java.net.Socket("127.0.0.1", gated.boundPort)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream))
      def ask(line: String): String = {
        out.println(line)
        Iterator.continually(in.readLine())
          .takeWhile(l => l != null && l != "##end").mkString
      }
      println("tcp auth: " + ask("##auth admin secret1").startsWith("##ok"))
      println("tcp authed query: " + ask("SELECT 1 AS ok"))
      sock.close()
    } finally gated.close()

    println("drop=" + a.catalog.drop("nation") + " dropAgain=" + a.catalog.drop("nation"))
    spark.stop()
  }
}
