package graft

import scala.sys.process._

/** Cross-stack validation of TcpGate's Arrow wire (VERDICT r8 #4): a
  * PYTHON client (`tools/arrow_wire_check.py`, pyarrow — the
  * reference's own client stack) connects over a real socket, reads
  * the length-prefixed chunk protocol, and decodes the reply with
  * `pyarrow.ipc.open_stream`. This proves the "spec-valid,
  * self-describing IPC stream; pyarrow decompresses transparently"
  * claim instead of asserting it: run 1 decodes the fresh
  * executor-side encode, run 2 decodes the cache hit's retained
  * compressed frames — both must agree with each other and with the
  * JVM GateClient on the same query.
  */
class ArrowWireSpec extends SparkSpec {

  private def pyarrowAvailable: Boolean =
    try Seq("python3", "-c", "import pyarrow.ipc").! == 0
    catch { case _: Exception => false }

  test("pyarrow decodes the gate's Arrow wire: fresh encode AND cache hit") {
    assume(pyarrowAvailable, "python3 + pyarrow not installed")
    val e = new graft.engine.Engine(spark.newSession())
    e.put("nation", Tables.nation(e.spark, sfDir))
    val gate = new graft.engine.TcpGate(e)
    try {
      val stmt = "SELECT n_nationkey, n_name, n_regionkey FROM nation"
      val out = Seq("python3", "/root/repo/tools/arrow_wire_check.py",
        "127.0.0.1", gate.boundPort.toString, stmt, "--repeat=2").!!
      val lines = out.trim.split("\n").toSeq
      info(s"fresh:  ${lines.head}")
      info(s"cached: ${lines.last}")
      assert(lines.size == 2, s"expected 2 result lines, got:\n$out")

      // minimal JSON field extraction (no JSON lib on the test path)
      def field(json: String, key: String): String = {
        val m = s""""$key":\\s*("[^"]*"|\\[[^\\]]*\\]|\\d+)""".r
          .findFirstMatchIn(json)
        m.getOrElse(fail(s"no $key in $json")).group(1)
      }
      // run 1 = fresh executor-side encode; run 2 = cache hit serving
      // retained compressed frames. Identical decoded content proves
      // the cached bytes are the same pyarrow-valid stream.
      // cols arrive as a JSON array; normalize to a plain name list
      def cols(json: String): Seq[String] =
        field(json, "cols").stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
      assert(field(lines.head, "rows") == "25" && field(lines.last, "rows") == "25")
      assert(field(lines.head, "checksum") == field(lines.last, "checksum"),
        "fresh and cached replies decoded to different values")
      assert(cols(lines.head) == Seq("n_nationkey", "n_name", "n_regionkey"))

      // parity with the JVM client on the same statement (cache hit #2)
      val c = new graft.engine.GateClient("127.0.0.1", gate.boundPort)
      try {
        c.format("arrow")
        assert(c.sqlArrowRowCount(stmt) == 25)
        val (schemaJson, _) = c.sqlArrow(stmt)
        val sparkCols = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
        assert(sparkCols == cols(lines.head))
      } finally c.close()

      // the gate really served run 2 from the cache (one entry, hot)
      assert(gate.cacheStats._1 == 1, s"expected 1 cache entry, got ${gate.cacheStats}")
    } finally gate.close()
  }

  test("pyarrow decodes an authenticated gate's wire through the handshake") {
    assume(pyarrowAvailable, "python3 + pyarrow not installed")
    val e = new graft.engine.Engine(spark.newSession())
    val auth = new graft.engine.AuthEngine(e, Map("duck" -> "quack"))
    e.put("region", Tables.region(e.spark, sfDir))
    val gate = new graft.engine.TcpGate(e, auth = Some(auth))
    try {
      val out = Seq("python3", "/root/repo/tools/arrow_wire_check.py",
        "127.0.0.1", gate.boundPort.toString,
        "SELECT count(*) AS c FROM region", "--auth=duck:quack").!!
      assert(out.contains(""""rows": 1""") || out.contains(""""rows":1"""),
        s"unexpected script output:\n$out")
    } finally gate.close()
  }
}
