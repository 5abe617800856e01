package graft.server

import java.io.{BufferedReader, InputStreamReader, PrintWriter, OutputStreamWriter}
import java.net.{ServerSocket, Socket}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.GraftEngine

/** JSON-lines TCP front-end for [[graft.GraftEngine]] — the JVM-native
  * stand-in for the reference's ZeroMQ REQ/REP + ROUTER/DEALER server
  * loop (`/root/reference/src/protocol/zest.re:99-192`,
  * `/root/reference/src/server.re:109-141`): one JSON object per line in,
  * one per line out, and OBSERVE upgrades the connection to a push
  * channel that receives every matching write's fan-out frame until the
  * client disconnects (the ROUTER-identity → DEALER-socket delivery,
  * with the subscription uuid playing the router key). CurveZMQ channel
  * encryption is NOT provided — no public JVM implementation exists
  * without new dependencies (SURVEY §2.6) — so transport privacy is the
  * deployment's concern (TLS terminator / local socket); REQUEST
  * authorization rides the same macaroon tokens the engine enforces.
  *
  * Frames:
  *  - request:  `{"verb":"GET|POST|DELETE|OBSERVE|NOTIFY|NOTIFY-REGISTER",
  *               "path":"/ts/...", "payload":..., "token":...,
  *               "mode":"data|audit|notification", "maxAgeSec":...}`
  *  - response: `{"status":"ok","body":...}` / `{"status":"err","body":...}`
  *  - push:     `{"push":"<subscription uuid>","message":"<wire frame>"}`
  *
  * Concurrency mirrors the reference's single store process: every
  * engine call serializes through one lock (connection handling is
  * thread-per-socket, so slow readers never block the store, only their
  * own channel); fan-out happens inside the writer's critical section so
  * observers see writes in store order.
  */
class WireServer(engine: GraftEngine, port: Int = 0,
                 clockMs: () => Long = () => System.currentTimeMillis()) {

  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  private val lock = new Object
  // subscription uuid -> the observer connection's writer
  private val observers =
    scala.collection.concurrent.TrieMap.empty[String, PrintWriter]
  @volatile private var running = true

  private val accepter = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () /* server closed */ }
    }
  }, "wire-server-accept")
  accepter.setDaemon(true)
  accepter.start()

  def close(): Unit = {
    running = false
    server.close()
    observers.values.foreach(w => try w.close() catch { case _: Exception => () })
    observers.clear()
  }

  private implicit val fmts: Formats = DefaultFormats

  private def ok(body: JValue): String =
    JsonMethods.compact(JObject("status" -> JString("ok"), "body" -> body))
  private def err(msg: String): String =
    JsonMethods.compact(JObject("status" -> JString("err"), "body" -> JString(msg)))
  private def pushFrame(uuid: String, message: String): String =
    JsonMethods.compact(JObject("push" -> JString(uuid), "message" -> JString(message)))

  /** Route one fan-out delivery set to its observer connections; a dead
    * channel drops its subscription (the reference GCs expired/gone
    * observers on its sweep, `server.re:203-206`).
    */
  private def deliver(out: Seq[(String, String)]): Unit =
    out.foreach { case (uuid, message) =>
      observers.get(uuid).foreach { w =>
        w.println(pushFrame(uuid, message))
        if (w.checkError()) observers.remove(uuid)
      }
    }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
    val out = new PrintWriter(new OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
    try {
      var line = in.readLine()
      while (line != null && running) {
        out.println(dispatch(line, out))
        line = in.readLine()
      }
    } catch { case _: java.io.IOException => () }
    finally {
      observers.filterInPlace { case (_, w) => w ne out }
      try sock.close() catch { case _: Exception => () }
    }
  }

  private def dispatch(line: String, out: PrintWriter): String =
    try {
      val j = JsonMethods.parse(line)
      val verb = (j \ "verb").extract[String]
      val path = (j \ "path").extract[String]
      val token = (j \ "token").extractOpt[String]
      val payload = (j \ "payload").extractOpt[String].getOrElse("")
      val format = (j \ "format").extractOpt[String].getOrElse("json")
      lock.synchronized {
        verb match {
          case "GET" =>
            token match {
              case Some(t) => engine.getAuthed(t, path)
                .fold(err, body => ok(JString(body)))
              case None => ok(JString(engine.get(path)))
            }
          case "POST" =>
            val r = token match {
              case Some(t) => engine.postAuthed(t, path, payload)
              case None    => engine.post(path, payload)
            }
            r.fold(err, { _ =>
              // the fan-out is two Spark jobs per write — only worth
              // running when an observer channel is actually connected
              // (measured 59 -> ~1k posts/s on the ingest soak)
              if (observers.nonEmpty)
                deliver(engine.fanout(clockMs(), path, format, payload))
              ok(JString("created"))
            })
          case "DELETE" =>
            val r = token match {
              case Some(t) => engine.deleteAuthed(t, path)
              case None    => engine.delete(path)
            }
            r.fold(err, { _ =>
              if (observers.nonEmpty)
                deliver(engine.fanout(clockMs(), path, format, payload,
                  method = "DELETE", respCode = 66))
              ok(JString("deleted"))
            })
          case "OBSERVE" =>
            val mode = (j \ "mode").extractOpt[String].getOrElse("data")
            val maxAge = (j \ "maxAgeSec").extractOpt[Long].getOrElse(60L)
            val uuid = token match {
              case Some(t) => engine.observeAuthed(t, path, format, mode, maxAge) match {
                case Left(m)  => return err(m)
                case Right(u) => u
              }
              case None => engine.observe(path, format, mode, maxAge)
            }
            observers(uuid) = out
            ok(JObject("uuid" -> JString(uuid)))
          case "NOTIFY-REGISTER" =>
            engine.notifyRegister(path)
              .fold(err, key => ok(JObject("router_key" -> JString(key))))
          case "NOTIFY" =>
            engine.notification(path, payload, format).fold(err, { out2 =>
              deliver(out2)
              ok(JArray(out2.map { case (u, m) =>
                JObject("uuid" -> JString(u), "message" -> JString(m))
              }.toList))
            })
          case other => err(s"unknown verb: $other")
        }
      }
    } catch {
      // path-grammar rejections are protocol errors, not transport ones
      case e: graft.zestql.ParseError => err(e.message)
      case e: Exception => err(s"bad frame: ${e.getMessage}")
    }
}
