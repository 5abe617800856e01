package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.Socket

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.server.{SecureChannel, WireMain, WireServer}

/** Round-13 fixes: the r12 ADVICE items (notify-path GC on dead
  * connections, AEAD counter ordering, sweep fast path, secure-mode
  * plaintext-port gating).
  */
class Round13OpsSpec extends AnyFunSuite with SparkTestBase {

  private implicit val fmts: Formats = DefaultFormats
  private def j(s: String): JValue = JString(s)

  private class JClient(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(20000)
    private val out = new PrintWriter(
      new OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
    private val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, "UTF-8"))
    def send(fields: (String, JValue)*): JValue = {
      out.println(JsonMethods.compact(JObject(fields.toList)))
      JsonMethods.parse(in.readLine())
    }
    def close(): Unit = sock.close()
  }

  test("a dead connection's notify-callback path frees for re-registration") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => { now += 1; now })
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      val a = new JClient(srv.boundPort)
      val reg = a.send("verb" -> j("NOTIFY-REGISTER"),
        "path" -> j("/notification/response/app/cbx"))
      assert((reg \ "status").extract[String] === "ok")
      a.close() // connection dies with the registration live
      // eviction runs in the handler's finally block — poll until the
      // path frees (the r12 defect: it NEVER freed; re-register got 163
      // forever and responses were silently dropped)
      val deadline = System.currentTimeMillis() + 10000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        val b = new JClient(srv.boundPort)
        val r = b.send("verb" -> j("NOTIFY-REGISTER"),
          "path" -> j("/notification/response/app/cbx"))
        ok = (r \ "status").extract[String] == "ok"
        b.close()
        if (!ok) Thread.sleep(50)
      }
      assert(ok, "callback path never freed after its connection died")
    } finally srv.close()
  }

  test("dropNotify is a no-op for subscription uuids and frees callback paths") {
    val engine = new GraftEngine(spark, () => 1L)
    assert(engine.notifyRegister("/notification/response/a").isRight)
    assert(engine.notifyRegister("/notification/response/a").isLeft)
    engine.dropNotify("/notification/response/a")
    assert(engine.notifyRegister("/notification/response/a").isRight)
    // unknown ident: harmless
    engine.dropNotify("not-a-path")
  }

  test("AEAD open failure does not desync the receive counter") {
    val kp = SecureChannel.generateKeyPair()
    val (clientEph, cont) = SecureChannel.clientHandshake(SecureChannel.rawPublic(kp))
    val (serverEph, server) = SecureChannel.serverHandshake(kp, clientEph)
    val client = cont(serverEph)
    val sealed1 = client.seal("frame-one".getBytes("UTF-8"))
    val garbage = sealed1.clone(); garbage(0) = (garbage(0) ^ 0x5a).toByte
    intercept[javax.crypto.AEADBadTagException] { server.open(garbage) }
    // the genuine frame still opens at the SAME counter (r12: the failed
    // open burned the counter, garbling every later frame for any caller
    // that catches and continues)
    assert(new String(server.open(sealed1), "UTF-8") === "frame-one")
    val sealed2 = client.seal("frame-two".getBytes("UTF-8"))
    assert(new String(server.open(sealed2), "UTF-8") === "frame-two")
  }

  test("sweepDue gates the expiry sweep: exact false, heals after sweep") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => now)
    assert(!engine.sweepDue(now)) // nothing registered
    engine.observe("/ts/a/*", maxAgeSec = 10L)
    engine.observe("/ts/b/*", maxAgeSec = 0L) // never expires
    assert(!engine.sweepDue(now + 9999L))
    assert(engine.sweepDue(now + 10000L))
    now += 10001L
    assert(engine.sweepExpired(now).size === 1)
    // bound re-tightened: only the never-expiring sub remains
    assert(!engine.sweepDue(now + 100000000L))
    assert(engine.subsSnapshot.map(_.path) === Seq("/ts/b/*"))
  }

  test("rerankIndexed: a vector deleted from the raw store cannot resurface via a stale shortlist") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-rrk-spec")
      .toFile.getAbsolutePath
    val (coded, raw) = (base + "/pq", base + "/raw")
    // 40 deterministic 16-dim vectors with enough structure for PQ
    val emb = spark.range(40L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        (pmod(xxhash64(col("id") * 131L + j.cast("long")), lit(1000L))
          .cast("double") / 500.0 - 1.0)).as("embedding"))
    Similarity.writePqIndex(emb, coded, m = 4, k = 4)
    Similarity.writeIvfIndex(emb, raw, nCells = 4)
    val q = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val before = Similarity.rerankIndexed(spark, coded, raw, q,
      nShortlist = 10, k = 5).collect()
    assert(before.nonEmpty)
    // doom a vector that IS in some result — the self-match is always there
    val doomedId = before.map(_.getLong(1)).head
    Similarity.deleteFromIvf(spark, raw,
      emb.filter(col("vec_id") === doomedId).select("vec_id"))
    // the CODED index still shortlists it (stale) — the raw-side mask
    // must keep it out of the final ranking anyway
    val after = Similarity.rerankIndexed(spark, coded, raw, q,
      nShortlist = 10, k = 5).collect()
    assert(!after.exists(_.getLong(1) == doomedId))
    assert(after.nonEmpty)
  }

  test("rerankIndexed's raw read prunes to the shortlist's cell partitions") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft-rrkp-spec")
      .toFile.getAbsolutePath
    val (coded, raw) = (base + "/pq", base + "/raw")
    val emb = spark.range(64L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        (pmod(xxhash64(col("id") * 137L + j.cast("long")), lit(1000L))
          .cast("double") / 500.0 - 1.0)).as("embedding"))
    Similarity.writePqIndex(emb, coded, m = 4, k = 4)
    Similarity.writeIvfIndex(emb, raw, nCells = 8)
    val q = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val out = Similarity.rerankIndexed(spark, coded, raw, q, nShortlist = 6, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"raw rerank scan reads every cell partition:\n$plan")
    assert(out.count() > 0)
  }

  test("secure mode disables the plaintext port unless explicitly opted in") {
    assert(WireMain.plaintextEnabled(Map.empty))
    assert(WireMain.plaintextEnabled(Map("GRAFT_WIRE_SECURE" -> "0")))
    assert(!WireMain.plaintextEnabled(Map("GRAFT_WIRE_SECURE" -> "1")))
    assert(WireMain.plaintextEnabled(
      Map("GRAFT_WIRE_SECURE" -> "1", "GRAFT_WIRE_PLAINTEXT" -> "1")))
  }
}
