package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** HyperCat catalogue (S8, reference `/root/reference/src/hc.re:7-79`):
  * datasets register as items `{href, item-metadata: [{rel, val}, ...]}`;
  * items live in the JSON KV store under id `"//cat"` keyed by href; `get`
  * reassembles the full catalogue from the live keys. Pure service-layer
  * JSON over [[KvOps]] — no engine machinery.
  *
  * Validation rules (`hc.re:20-41`): href + item-metadata present, every
  * metadata entry is a rel/val pair, and the rel terms (split on ':')
  * include `hasDescription` and `isContentType`. Invalid -> CoAP 128.
  */
object HyperCat {

  val CatalogueId = "//cat"

  /** Our catalogue header (the reference ships a base-cat.json config). */
  val baseCatalogue: String =
    """{"catalogue-metadata":[
      |{"rel":"urn:X-hypercat:rels:isContentType","val":"application/vnd.hypercat.catalogue+json"},
      |{"rel":"urn:X-hypercat:rels:hasDescription:en","val":"graft datasource catalogue"}
      |],"items":[]}""".stripMargin

  private def relTerms(rel: String): Set[String] = rel.split(':').toSet

  def isValidItem(itemJson: String): Boolean =
    try {
      val item = JsonMethods.parse(itemJson)
      val href = (item \ "href") match { case JString(_) => true; case _ => false }
      val md = (item \ "item-metadata") match {
        case JArray(entries) if entries.nonEmpty =>
          val pairsOk = entries.forall { e =>
            (e \ "rel").isInstanceOf[JString] && (e \ "val") != JNothing
          }
          val rels = entries.collect { case e if (e \ "rel").isInstanceOf[JString] =>
            relTerms((e \ "rel").asInstanceOf[JString].s)
          }.flatten.toSet
          pairsOk && rels("hasDescription") && rels("isContentType")
        case _ => false
      }
      href && md
    } catch { case _: Throwable => false }

  /** An item's change-log cell `(href, value)` — what registration stores
    * under `(//cat, href)`. Throws the CoAP-128 analogue when invalid.
    */
  def itemEntry(itemJson: String): (String, String) = {
    if (!isValidItem(itemJson))
      throw new IllegalArgumentException("invalid HyperCat item (CoAP 128)")
    val item = JsonMethods.parse(itemJson)
    val href = (item \ "href").asInstanceOf[JString].s
    val value = JsonMethods.compact(JObject("item-metadata" -> (item \ "item-metadata")))
    (href, value)
  }

  /** Registration: append the item to the KV change-log under (//cat, href).
    * Returns the appended row; throws the CoAP-128 analogue when invalid.
    */
  def update(spark: SparkSession, itemJson: String, writeTs: Long, eventId: Long): DataFrame = {
    val (href, value) = itemEntry(itemJson)
    import spark.implicits._
    Seq((CatalogueId, href, value, writeTs, eventId, false))
      .toDF("id", "key", "value", "write_ts", "event_id", "deleted")
  }

  /** Catalogue assembly from live `(href, value)` cells — the in-process
    * serving form (the engine's LWW cache feeds it; no Spark job per
    * `/cat` GET). The DataFrame [[catalogue]] wraps this, so the two
    * paths cannot diverge.
    */
  def catalogueLocal(entries: Seq[(String, String)]): String = {
    val items = JArray(entries.sortBy(_._1).toList.map { case (href, v) =>
      JObject(
        "href" -> JString(href),
        "item-metadata" -> (JsonMethods.parse(v) \ "item-metadata"))
    })
    val base = JsonMethods.parse(baseCatalogue).asInstanceOf[JObject]
    JsonMethods.compact(JObject(base.obj.map {
      case ("items", _) => "items" -> (items: JValue)
      case other => other
    }))
  }

  /** Catalogue assembly (`hc.re:53-79`): live (//cat, href) -> item list
    * spliced into the base catalogue's `items`.
    */
  def catalogue(log: DataFrame): String =
    catalogueLocal(
      KvOps.lwwView(log.filter(log("id") === CatalogueId))
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq)
}
