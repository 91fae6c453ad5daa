package graft.schema

import java.{util => ju}
import scala.jdk.CollectionConverters._

/** The declarative ETL-mapping model — our typed equivalent of the
  * reference's `etlMapping.yaml` (reference: docs/configuration_file.md:29-43
  * and the parser node-trees in tube/etl/indexers/&#42;/parser.py).
  *
  * One `IndexMapping` per output document set. `doc_type = aggregator`
  * denormalizes around a root entity; `collector` unions leaf entities
  * discovered under ancestor paths and injects ancestor props.
  */
final case class PropDef(
    name: String,
    src: String,
    fn: Option[String] = None,
    valueMappings: Map[String, String] = Map.empty)

object PropDef {
  def of(name: String): PropDef = PropDef(name, name)
}

/** One step of a parent path: `label[propA,propB:srcB]` — reference grammar
  * at tube/etl/indexers/aggregation/parser.py:97-141. */
final case class PathStep(label: String, props: Seq[PropDef])

/** parent_props entry: a chain root→parent→grandparent. `relation = "1-1"`
  * means take `first` instead of `set` (reference: aggregation/
  * new_translator.py:432-472). */
final case class ParentChainDef(steps: Seq[PathStep], relation: String = "1-n")

/** flatten_props entry: one-hop child props attached 1:1 to the root;
  * `sortedBy` picks top-1-per-root for many-to-one flattens
  * (reference: aggregation/parser.py:362-417). */
final case class FlattenDef(
    path: String,
    props: Seq[PropDef],
    sortedBy: Option[(String, Boolean)] = None) // (column, descending)

/** aggregated_props entry: `path` is a dotted descendant chain
  * (`samples.aliquots.read_groups`); `src=None` + fn=count counts path
  * leaves (reference: aggregation/parser.py:200-344). */
final case class AggregatedPropDef(
    name: String,
    path: Seq[String],
    src: Option[String],
    fn: String)

/** nested_props: recursive child trees → array-of-struct columns
  * (reference: aggregation/nested/parser.py:29-101). */
final case class NestedDef(
    name: String,
    path: Seq[String],
    props: Seq[PropDef],
    children: Seq[NestedDef] = Nil,
    filter: Option[FilterNode] = None)

/** joining_props: index-to-index join (reference: aggregation/
  * new_translator.py:291-370). */
final case class JoiningDef(
    otherIndex: String,
    joinOn: Seq[String],
    props: Seq[PropDef])

/** collector config: union every node of `category` found under the roots,
  * injecting props from ancestor labels (reference: injection/parser.py). */
final case class InjectionDef(
    category: String,
    injectingProps: Map[String, Seq[PropDef]])

final case class IndexMapping(
    name: String,
    docType: String,                       // output document name
    root: String,                          // root node label (aggregator)
    kind: String = "aggregator",           // aggregator | collector
    props: Seq[PropDef] = Nil,
    parentProps: Seq[ParentChainDef] = Nil,
    flattenProps: Seq[FlattenDef] = Nil,
    aggregatedProps: Seq[AggregatedPropDef] = Nil,
    nestedProps: Seq[NestedDef] = Nil,
    joiningProps: Seq[JoiningDef] = Nil,
    injection: Option[InjectionDef] = None,
    filter: Option[FilterNode] = None,
    /** mapping-level `settings.bypass_multiplicity_check` — opt out of the
      * fan-out flatten rejection; an arbitrary child row survives per root
      * (reference: aggregation/parser.py:374-417). */
    bypassMultiplicityCheck: Boolean = false)

final case class EtlMapping(indices: Seq[IndexMapping])

/** YAML loader for the reference mapping-file shape (snakeyaml is on the
  * Spark classpath). Kept deliberately lenient: unknown keys are ignored. */
object MappingYaml {
  import org.yaml.snakeyaml.Yaml

  def parse(yaml: String): EtlMapping = {
    val root = new Yaml().load[ju.Map[String, AnyRef]](yaml)
    val mappings = root.get("mappings") match {
      case l: ju.List[_] => l.asScala.toSeq.map(m => parseIndex(asMap(m)))
      case _             => Nil
    }
    EtlMapping(mappings)
  }

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: ju.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case _               => Map.empty
  }
  private def asList(o: Any): Seq[Any] = o match {
    case l: ju.List[_] => l.asScala.toSeq
    case null          => Nil
    case x             => Seq(x)
  }
  private def str(m: Map[String, Any], k: String, d: String = ""): String =
    m.get(k).map(_.toString).getOrElse(d)

  private def parseProp(o: Any): PropDef = o match {
    case s: String => PropDef.of(s)
    case m0 =>
      val m = asMap(m0)
      val name = str(m, "name")
      val src = if (m.contains("src")) str(m, "src") else name
      val vm: Map[String, String] = m.get("value_mappings").map(asList).getOrElse(Nil)
        .flatMap { e => asMap(e).headOption.map { case (k, v) => k -> v.toString } }
        .toMap
      PropDef(name, src, m.get("fn").map(_.toString), vm)
  }

  /** `studies[a,b:c].projects[d]` path grammar — reference:
    * aggregation/parser.py:97-125. A step may omit the bracket block
    * entirely (`participants.protocols[p]` walks through participants
    * without collecting props there — the jcoin fixture shape). */
  private[schema] def parseParentPath(path: String): Seq[PathStep] = {
    val stepRe = """([A-Za-z0-9_]+)(?:\[([^\]]*)\])?""".r
    // split on dots OUTSIDE bracket blocks only — a prop spec may itself
    // contain a dot (`studies[s:meta.x].projects[d]`)
    path.split("""\.(?![^\[]*\])""").toSeq.map(_.trim).filter(_.nonEmpty).map { s =>
      stepRe.findFirstMatchIn(s) match {
        case Some(m) =>
          val props = Option(m.group(2)).getOrElse("").split(",").toSeq
            .map(_.trim).filter(_.nonEmpty).map { p =>
              p.split(":") match {
                case Array(n, src) => PropDef(n.trim, src.trim)
                case Array(n)      => PropDef.of(n.trim)
                case _             => PropDef.of(p)
              }
            }
          PathStep(m.group(1), props)
        case None => PathStep(s, Nil)
      }
    }
  }

  private def parseNested(m0: Any): NestedDef = {
    val m = asMap(m0)
    NestedDef(
      name = str(m, "name"),
      path = str(m, "path").split("\\.").toSeq.filter(_.nonEmpty),
      props = m.get("props").map(asList).getOrElse(Nil).map(parseProp),
      children = m.get("nested_props").map(asList).getOrElse(Nil).map(parseNested),
      filter = m.get("filter").map(f => FilterDsl.fromAny(f)))
  }

  private def parseIndex(m: Map[String, Any]): IndexMapping = {
    val kind = str(m, "type", "aggregator")
    IndexMapping(
      name = str(m, "name"),
      docType = str(m, "doc_type"),
      root = str(m, "root"),
      kind = kind,
      props = m.get("props").map(asList).getOrElse(Nil).map(parseProp),
      parentProps = m.get("parent_props").map(asList).getOrElse(Nil).map { e =>
        val em = asMap(e)
        ParentChainDef(parseParentPath(str(em, "path")),
          if (str(em, "relation") == "1-1") "1-1" else "1-n")
      },
      flattenProps = m.get("flatten_props").map(asList).getOrElse(Nil).map { e =>
        val em = asMap(e)
        val sortedBy = em.get("sorted_by").map { s =>
          s.toString.split(",").map(_.trim) match {
            case Array(c, dir) => (c, dir.equalsIgnoreCase("desc"))
            case Array(c)      => (c, false)
          }
        }
        FlattenDef(str(em, "path"),
          em.get("props").map(asList).getOrElse(Nil).map(parseProp), sortedBy)
      },
      aggregatedProps = m.get("aggregated_props").map(asList).getOrElse(Nil).map { e =>
        val em = asMap(e)
        AggregatedPropDef(str(em, "name"),
          str(em, "path").split("\\.").toSeq.filter(_.nonEmpty),
          em.get("src").map(_.toString), str(em, "fn", "count"))
      },
      nestedProps = m.get("nested_props").map(asList).getOrElse(Nil).map(parseNested),
      joiningProps = m.get("joining_props").map(asList).getOrElse(Nil).map { e =>
        val em = asMap(e)
        JoiningDef(str(em, "index"),
          str(em, "join_on").split(",").toSeq.map(_.trim).filter(_.nonEmpty),
          em.get("props").map(asList).getOrElse(Nil).map(parseProp))
      },
      injection =
        if (kind == "collector")
          Some(InjectionDef(str(m, "category", "data_file"),
            asMap(m.getOrElse("injecting_props", null)).map { case (label, v) =>
              label -> asList(asMap(v).getOrElse("props", null)).map(parseProp)
            }))
        else None,
      filter = m.get("filter").map(FilterDsl.fromAny),
      bypassMultiplicityCheck = asMap(m.getOrElse("settings", null))
        .get("bypass_multiplicity_check").exists(v => v.toString == "true"))
  }
}
