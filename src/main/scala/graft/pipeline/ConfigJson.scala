package graft.pipeline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** JSON pipeline configs — the engine's answer to the reference's
  * YAML/dict-driven composition (reference README.md:9-20,
  * sdata/dataset.py:124-256): a declarative document names operators
  * from the [[OperatorRegistry]] instead of importing arbitrary dotted
  * paths (`instantiate`, datapipeline.py:123-130).
  *
  * Schema (all fields optional except urls/extensions):
  * {{{
  * {
  *   "urls": ["/data/shards"],
  *   "extensions": ["jpg", "json", "txt"],
  *   "metaSuffixes": ["meta"],
  *   "shardShuffleSeed": 42,
  *   "prefixProbs": {"web": 0.7, "books": 0.3},
  *   "mixtureTotal": 100000,
  *   "repeat": 2,
  *   "sampleShuffleSeed": 7,
  *   "skipCorrupt": true,
  *   "overflowColumn": false,
  *   "preprocessors":  [{"filter": "simple_key_filter", "params": {"keys": "jpg,json"}}],
  *   "postprocessors": [{"mapper": "rescaler", "params": {"key": "jpg"}}]
  * }
  * }}}
  */
object ConfigJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): PipelineConfig = {
    val root = mapper.readValue(json, classOf[java.util.Map[String, Object]]).asScala

    def strs(key: String): Seq[String] = root.get(key) match {
      case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
      case _ => Nil
    }
    def optInt(key: String): Option[Int] = root.get(key) match {
      case Some(n: Number) => Some(n.intValue())
      case _ => None
    }
    def bool(key: String, default: Boolean): Boolean = root.get(key) match {
      case Some(b: java.lang.Boolean) => b.booleanValue()
      case _ => default
    }
    def stages(key: String): Seq[PipelineStage] = root.get(key) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map {
        case m: java.util.Map[_, _] =>
          val sm = m.asScala.map { case (k, v) => k.toString -> v }
          val params = sm.get("params") match {
            case Some(p: java.util.Map[_, _]) =>
              p.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
            case _ => Map.empty[String, String]
          }
          (sm.get("filter"), sm.get("mapper")) match {
            case (Some(_), Some(_)) =>
              sys.error(s"pipeline stage declares both 'filter' and 'mapper': $sm")
            case (Some(name), None) => FilterStage(OperatorRegistry.filter(name.toString, params))
            case (None, Some(name)) => MapperStage(OperatorRegistry.mapper(name.toString, params))
            case _ => sys.error(s"pipeline stage needs 'filter' or 'mapper': $sm")
          }
        case other => sys.error(s"invalid stage entry: $other")
      }
      case _ => Nil
    }

    val urls = strs("urls")
    val extensions = strs("extensions")
    require(urls.nonEmpty, "config requires 'urls'")
    require(extensions.nonEmpty, "config requires 'extensions'")

    PipelineConfig(
      urls = urls,
      extensions = extensions,
      metaSuffixes = strs("metaSuffixes"),
      shardShuffleSeed = optInt("shardShuffleSeed"),
      prefixProbs = root.get("prefixProbs") match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (k, v) =>
            k.toString -> v.asInstanceOf[Number].doubleValue()
          }.toMap
        case _ => Map.empty
      },
      mixtureTotal = optInt("mixtureTotal").map(_.toLong).getOrElse(0L),
      repeat = optInt("repeat").getOrElse(1),
      sampleShuffleSeed = optInt("sampleShuffleSeed"),
      skipCorrupt = bool("skipCorrupt", default = false),
      overflowColumn = bool("overflowColumn", default = false),
      preprocessors = stages("preprocessors"),
      // "decoders": ["pil"] (reference YAML list form, applied to image
      // extensions) or {"jpg": "torchrgb"} (per-extension map form)
      decoders = root.get("decoders") match {
        case Some(l: java.util.List[_]) =>
          Decoders.withSpecs(l.asScala.map(_.toString).toSeq, Map.empty)
        case Some(m: java.util.Map[_, _]) =>
          Decoders.withSpecs(Nil,
            m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap)
        case _ => Decoders.defaults
      },
      postprocessors = stages("postprocessors"))
  }
}
