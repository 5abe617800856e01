package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Observe / notify pub-sub (reference `/root/reference/src/observe.re:3-115`,
  * fan-out `/root/reference/src/server.re:74-201`, expiry sweep
  * `src/server.re:203-206` + `src/observe.re:96-113`).
  *
  * Re-expressed for Spark: the request stream is a Structured Streaming
  * DataFrame; subscriptions are a small dimension table broadcast-joined to
  * it (a registration is a predicate, not a socket). All transforms below
  * are engine-agnostic DataFrame ops, so the SAME code runs batch (tests,
  * replay) and streaming (`readStream`) — Spark's plan reuse across modes
  * replaces the reference's single-threaded router loop.
  *
  * Scale: fan-out is `events JOIN broadcast(subs)` — no shuffle of the
  * event stream; per-subscriber delivery partitions by uuid downstream.
  */
object ObserveService {

  /** A registration (`observe.re:44-92`): mode data|audit|notification,
    * wildcard paths end in `*`, `maxAgeSec == 0` means never expires
    * (`observe.re:52`; SURVEY T1/T2). The (path, format) PAIR keys the
    * subscription — format must match too (`observe.re:16-26`, §7.5.10).
    */
  final case class Subscription(uuid: String, path: String, format: String,
                                mode: String, startMs: Long, maxAgeSec: Long) {
    def expiresAtMs: Option[Long] =
      if (maxAgeSec == 0) None else Some(startMs + maxAgeSec * 1000L)
  }

  /** An API request/response crossing the server — the unit that fans out
    * (`server.re:836-847`: GET/POST/DELETE responses all route).
    */
  final case class ObsEvent(ts: Long, uri_path: String, format: String,
                            payload: String, method: String, client: String,
                            respCode: Int)

  final case class Delivery(uuid: String, message: String)

  /** Wildcard prefix or exact match plus content-format equality
    * (`observe.re:9-26`).
    */
  private def matches: Column = {
    val subPath = col("path")
    val evPath  = col("uri_path")
    val pathOk = when(subPath.endsWith("*"),
        evPath.startsWith(expr("substring(path, 1, length(path) - 1)")))
      .otherwise(evPath === subPath)
    pathOk && col("format") === col("ev_format")
  }

  /** Subscription live at event time: the reference sweeps expiry before
    * delivering each message (`server.re:203-206`), which in event time is
    * exactly `ts < expiry` (or no expiry).
    */
  private def liveAtEventTime: Column =
    col("maxAgeSec") === 0L || col("ts") < col("startMs") + col("maxAgeSec") * 1000L

  private def joined(events: DataFrame, subs: DataFrame, mode: String): DataFrame =
    events.withColumnRenamed("format", "ev_format")
      .join(broadcast(subs.filter(col("mode") === mode)), matches)

  /** Data-mode fan-out: `ts uri_path format payload`
    * (`server.re:109-141`; format per `docs/README.md:261-266`).
    */
  def dataFanout(events: DataFrame, subs: DataFrame): DataFrame =
    joined(events, subs, "data")
      .filter(liveAtEventTime)
      .select(col("uuid"),
        concat_ws(" ", col("ts"), col("uri_path"), col("ev_format"), col("payload")).as("message"))

  /** Audit-mode fan-out: `ts server client method path resp_code`
    * (`server.re:74-107`; format per `docs/README.md:277-279`).
    */
  def auditFanout(events: DataFrame, subs: DataFrame, server: String = "server.local"): DataFrame =
    joined(events, subs, "audit")
      .filter(liveAtEventTime)
      .select(col("uuid"),
        concat_ws(" ", col("ts"), lit(server), col("client"), col("method"),
          col("uri_path"), col("respCode")).as("message"))

  // ---- Notification RPC (T6, `notify.re`, `server.re:611-618,778-794`) ----

  /** Callback path: the FIRST "request" in the path becomes "response"
    * (`server.re:148`, `Str.replace_first`).
    */
  private def callbackPath: Column = {
    val pos = instr(col("uri_path"), "request")
    when(pos > 0, concat(
        col("uri_path").substr(lit(1), pos - 1),
        lit("response"),
        col("uri_path").substr(pos + 7, length(col("uri_path")))))
      .otherwise(col("uri_path"))
  }

  /** Fan-out of `POST /notification/request/...` to notification-mode
    * observers: `ts client callback_path format payload`
    * (`server.re:143-166`; wire shape `docs/README.md:303-308`). Observers
    * register with wildcard paths exactly like data/audit mode.
    */
  def notificationFanout(events: DataFrame, subs: DataFrame): DataFrame =
    joined(events, subs, "notification")
      .filter(liveAtEventTime)
      .select(col("uuid"),
        concat_ws(" ", col("ts"), col("client"), callbackPath,
          col("ev_format"), col("payload")).as("message"))

  /** Per-request ack: 65 when at least one live notification observer
    * matched, else 163 — the docs' "service unavailable" when no
    * observation is set up (`server.re:778-787`, `docs/README.md:311`).
    */
  def notificationAcks(events: DataFrame, subs: DataFrame): DataFrame = {
    val live = subs.filter(col("mode") === "notification")
    events.withColumnRenamed("format", "ev_format")
      .join(broadcast(live), matches && liveAtEventTime, "left_outer")
      .groupBy(col("ts"), col("uri_path"))
      .agg(when(count(col("uuid")) > 0, 65).otherwise(163).as("code"))
  }

  /** Route `POST /notification/response/<cb>` to the clients that
    * registered that exact callback path (`notify.re:5-17` membership is
    * exact, no wildcards; delivery shape is the data-payload
    * `ts path format payload`, `server.re:789-794` + `:109-141`).
    */
  def responseRouting(events: DataFrame, notifyList: DataFrame): DataFrame =
    events.join(broadcast(notifyList), col("uri_path") === col("ident"))
      .select(col("ident"),
        concat_ws(" ", col("ts"), col("uri_path"), col("format"),
          col("payload")).as("message"))

  // ---- In-process mirrors (the wire serving path) --------------------------
  //
  // The subscription match is a tiny prefix+format+expiry predicate over an
  // in-memory list; evaluating it as a Spark job costs two job-scheduling
  // round trips PER WRITE on the serving path (measured: observed-path
  // ingest collapses to job-scheduling rates). These plain-Scala twins
  // share their semantics with the Column forms above — the same
  // shared-step convention the streaming replays use — and a parity spec
  // (ObserveSpec) pins local == DataFrame on a sub×event matrix. The
  // DataFrame forms stay the batch/streaming path (gates, replay suites);
  // the local forms serve the wire loop (reference does the match
  // in-process too, `observe.re:16-26`).

  /** Plain twin of [[matches]]: wildcard prefix or exact path, plus
    * content-format equality.
    */
  def matchesLocal(subPath: String, subFormat: String,
                   evPath: String, evFormat: String): Boolean = {
    val pathOk =
      if (subPath.endsWith("*")) evPath.startsWith(subPath.dropRight(1))
      else evPath == subPath
    pathOk && subFormat == evFormat
  }

  /** Plain twin of [[liveAtEventTime]]. */
  def liveAtLocal(sub: Subscription, ts: Long): Boolean =
    sub.maxAgeSec == 0L || ts < sub.startMs + sub.maxAgeSec * 1000L

  private def matchingLocal(ev: ObsEvent, subs: Seq[Subscription], mode: String) =
    subs.filter(s => s.mode == mode && matchesLocal(s.path, s.format, ev.uri_path, ev.format) &&
      liveAtLocal(s, ev.ts))

  /** Plain twin of [[dataFanout]] — identical message bytes
    * (`mkString(" ")` = `concat_ws(" ")` over non-null columns).
    */
  def dataFanoutLocal(ev: ObsEvent, subs: Seq[Subscription]): Seq[Delivery] =
    matchingLocal(ev, subs, "data").map(s =>
      Delivery(s.uuid, Seq(ev.ts.toString, ev.uri_path, ev.format, ev.payload).mkString(" ")))

  /** Plain twin of [[auditFanout]]. */
  def auditFanoutLocal(ev: ObsEvent, subs: Seq[Subscription],
                       server: String = "server.local"): Seq[Delivery] =
    matchingLocal(ev, subs, "audit").map(s =>
      Delivery(s.uuid, Seq(ev.ts.toString, server, ev.client, ev.method,
        ev.uri_path, ev.respCode.toString).mkString(" ")))

  /** Plain twin of [[notificationFanout]] (first `request` -> `response`,
    * `server.re:148`).
    */
  def notificationFanoutLocal(ev: ObsEvent, subs: Seq[Subscription]): Seq[Delivery] = {
    val cb = ev.uri_path.replaceFirst("request", "response")
    matchingLocal(ev, subs, "notification").map(s =>
      Delivery(s.uuid, Seq(ev.ts.toString, ev.client, cb, ev.format, ev.payload).mkString(" ")))
  }

  /** Plain twin of [[responseRouting]] (exact callback-path membership,
    * `notify.re:5-17`).
    */
  def responseRoutingLocal(ev: ObsEvent, notifyList: Seq[String]): Seq[Delivery] =
    notifyList.filter(_ == ev.uri_path).map(ident =>
      Delivery(ident, Seq(ev.ts.toString, ev.uri_path, ev.format, ev.payload).mkString(" ")))

  /** Plain twin of [[expiredSubs]]: uuids dead at `nowMs`, each owed one
    * 163 "observation ended" ack.
    */
  def expiredLocal(subs: Seq[Subscription], nowMs: Long): Seq[String] =
    subs.filter(s => s.maxAgeSec > 0L && nowMs >= s.startMs + s.maxAgeSec * 1000L).map(_.uuid)

  /** The reference's data-mode response-routing gate
    * (`server.re:126-141`, `create_data_payload`): error/ack codes
    * (128 bad-request, 129 unauthorized, 143 unsupported, 66 deleted,
    * 163 unavailable) and empty payloads route NOTHING to data observers —
    * only successful responses that carry content do. Audit-mode has no
    * such gate (every response becomes an audit line, `server.re:74-107`).
    */
  def dataDeliverable(respCode: Int, payload: String): Boolean =
    payload.nonEmpty &&
      respCode != 66 && respCode != 128 && respCode != 129 &&
      respCode != 143 && respCode != 163

  /** Route one API RESPONSE to data+audit observers, reference-gated: the
    * data frame carries the routed payload only when [[dataDeliverable]];
    * the audit frame always goes out (incl. 129 denials and GET reads —
    * `handle_get_observed` routes every response, `server.re:836-847`).
    */
  def routeResponseLocal(ev: ObsEvent, subs: Seq[Subscription],
                         server: String = "server.local"): Seq[Delivery] = {
    val data =
      if (dataDeliverable(ev.respCode, ev.payload)) dataFanoutLocal(ev, subs)
      else Seq.empty
    data ++ auditFanoutLocal(ev, subs, server)
  }

  /** Batch expiry sweep: subscriptions dead at `nowMs`, each owed one
    * 163 "observation ended" ack (`observe.re:96-113`,
    * `zest.re` code 163). Run per micro-batch from `foreachBatch`, mirroring
    * the reference's sweep-before-each-message.
    */
  def expiredSubs(subs: DataFrame, nowMs: Long): DataFrame =
    subs.filter(col("maxAgeSec") > 0L && lit(nowMs) >= col("startMs") + col("maxAgeSec") * 1000L)
      .select(col("uuid"), lit(163).as("code"))

  final case class DeliveryOrEnd(uuid: String, message: String, ended: Boolean)

  /** Stateful delivery with exactly-once end-of-observation signal, keyed
    * by subscriber: messages before expiry pass through; the first message
    * at/after expiry converts to a single 163 and the state closes the
    * subscription (T5 as an event-time `flatMapGroupsWithState`, usable
    * under both batch and streaming execution).
    */
  def deliverWithExpiry(spark: SparkSession, events: DataFrame, subs: DataFrame)
      : Dataset[DeliveryOrEnd] = {
    import spark.implicits._
    val j = joined(events, subs, "data").select(
      col("uuid"), col("ts"), col("uri_path"), col("ev_format"), col("payload"),
      col("startMs"), col("maxAgeSec"))
    j.as[(String, Long, String, String, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uuid: String, rows: Iterator[(String, Long, String, String, String, Long, Long)],
         state: GroupState[Boolean]) =>
          val closed = state.getOption.getOrElse(false)
          if (closed) Iterator.empty
          else {
            val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
            val out = Seq.newBuilder[DeliveryOrEnd]
            var done = false
            sorted.foreach { case (_, ts, path, fmt, payload, start, maxAge) =>
              if (!done) {
                val expired = maxAge > 0 && ts >= start + maxAge * 1000L
                if (expired) { out += DeliveryOrEnd(uuid, "163", ended = true); done = true }
                else out += DeliveryOrEnd(uuid, s"$ts $path $fmt $payload", ended = false)
              }
            }
            if (done) state.update(true)
            out.result().iterator
          }
      }
  }
}
