package graft

import graft.engine.{Engine, GateClient, TcpGate}

/** VERDICT r9/r10 task: the fresh-GET floor. A bare `SELECT * FROM t`
  * on a catalog table now serves from a canonical per-TABLE pre-encoded
  * chunk entry keyed on (table, mutation stamp) — the engine's columnar
  * serving form — even under `##nocache` (which still means "no
  * statement-result replay" for everything else). These specs pin:
  * entry canonicalization across scan spellings, `##nocache` semantics
  * for non-bare statements, and stamp-keyed freshness after mutations.
  */
class TableChunkCacheSpec extends SparkSpec {

  test("bare table scans share one canonical pre-encoded entry, served under ##nocache") {
    val e = new Engine(spark.newSession())
    e.put("nation", Tables.nation(e.spark, sfDir))
    val gate = new TcpGate(e)
    try {
      val c = new GateClient("127.0.0.1", gate.boundPort)
      try {
        c.format("arrow")
        // first fresh GET pays the encode AND installs the table entry
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM nation") == 25)
        assert(gate.cacheStats._1 == 1, s"expected table entry, got ${gate.cacheStats}")
        // every spelling of the bare scan resolves to the SAME entry
        assert(c.sqlArrowRowCount("##nocache TABLE nation") == 25)
        assert(c.sqlArrowRowCount("##nocache select * from nation;") == 25)
        assert(c.sqlArrowRowCount("SELECT * FROM nation") == 25)
        assert(gate.cacheStats._1 == 1,
          s"scan spellings must canonicalize to one entry, got ${gate.cacheStats}")
        // non-bare statements keep full ##nocache semantics: fresh
        // execute, no install — entry count must not move
        assert(c.sqlArrowRowCount("##nocache SELECT n_name FROM nation") == 25)
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM nation LIMIT 5") == 5)
        assert(gate.cacheStats._1 == 1, s"non-bare ##nocache must not install")
        // a scan of a NON-catalog relation is not table-keyed: under
        // ##nocache it is a plain fresh execute (no install)
        e.spark.sql("SELECT 1 AS x").createOrReplaceTempView("graft_tcc_view")
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM graft_tcc_view") == 1)
        assert(gate.cacheStats._1 == 1)
      } finally c.close()
    } finally gate.close()
  }

  test("table entry is stamp-keyed: mutations re-encode, bytes stay fresh") {
    val e = new Engine(spark.newSession())
    e.put("t", e.spark.range(10).toDF("x"))
    val gate = new TcpGate(e)
    try {
      val c = new GateClient("127.0.0.1", gate.boundPort)
      try {
        c.format("arrow")
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM t") == 10)
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM t") == 10) // hit
        // PUT appends → stamp moves → the stale entry is unreachable;
        // the next fresh GET re-encodes post-mutation bytes
        e.put("t", e.spark.range(10, 15).toDF("x"))
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM t") == 15)
        // decode the served stream and check VALUES, not just counts
        val (_, ipc) = c.sqlArrow("SELECT * FROM t")
        val got = org.apache.spark.sql.GraftBridge.fromArrowIPC(spark, ipc)
          .collect().map(_.getLong(0)).sorted
        assert(got.sameElements(0L until 15L), s"stale bytes served: ${got.toSeq}")
        // stale-stamp entries were purged on install — one live entry
        assert(gate.cacheStats._1 == 1, s"stale entries retained: ${gate.cacheStats}")
        // DML through the gate also moves the stamp
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM t") == 15)
        c.sqlArrowRowCount("DELETE FROM t WHERE x >= 10")
        assert(c.sqlArrowRowCount("##nocache SELECT * FROM t") == 10,
          "post-DELETE GET must not serve pre-mutation chunk bytes")
      } finally c.close()
    } finally gate.close()
  }
}
