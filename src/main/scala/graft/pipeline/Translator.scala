package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema._
import graft.operators._

/** The mapping interpreter: turns a declarative `IndexMapping` over a
  * `GraphSchema` into a single lazy DataFrame plan per output document set —
  * the Spark-native replacement for the reference's translator classes
  * (tube/etl/indexers/aggregation/new_translator.py:386-414 and
  * injection/new_translator.py:197-213).
  *
  * Key architectural difference from the reference: the reference
  * materializes parquet checkpoints between phases and hand-merges partial
  * aggregates hop by hop; we emit ONE Catalyst plan per index (parents +
  * flatten + aggregation paths + nested docs all join into the root), so
  * the optimizer sees the whole tree: column pruning reaches every scan,
  * partial aggregation is automatic, AQE re-plans skewed joins. The only
  * materialization barrier kept is the cross-index `joining_props` phase
  * (reference interpreter.py:34-62), driven here by a topological order.
  */
final class GraphSource(
    val nodeDf: String => DataFrame,   // label → node table (has _{label}_id)
    val edgeDf: (String, String) => DataFrame) // (child,parent) → (childId,parentId)

final class Translator(schema: GraphSchema, source: GraphSource) {

  private def idOf(label: String) = schema.idCol(label)

  /** Phase 0: one document frame per index (no cross-index joins yet). */
  def translate(m: IndexMapping): DataFrame = m.kind match {
    case "collector" => translateCollector(m)
    case _           => translateAggregator(m)
  }

  private def translateAggregator(m: IndexMapping): DataFrame = {
    val rootId = idOf(m.root)
    // P1/P2: root projection with recode
    var doc = source.nodeDf(m.root)
      .select(col(rootId) +: m.props.map(Project.propCol): _*)

    // J3: parent chains — each chain contributes set/first columns per root
    m.parentProps.foreach { chain =>
      val fn = if (chain.relation == "1-1") "first" else "set"
      val chainJoins = chain.steps.scanLeft(m.root) { (child, step) => step.label }
        .zip(chain.steps).map { case (child, step) =>
          (source.edgeDf(child, step.label),
           source.nodeDf(step.label)
             .select(col(idOf(step.label)) +:
               step.props.map(p => col(p.src)): _*),
           idOf(child), idOf(step.label))
        }
      val props = chain.steps.flatMap(_.props).map(p => (p, fn))
      val parentCols = GraphOps.parentChain(
        source.nodeDf(m.root).select(col(rootId)), rootId, chainJoins, props)
      doc = doc.join(parentCols, Seq(rootId), "left_outer")
    }

    // A3/A4: one-hop child flatten. Reference parity: a child whose link
    // multiplicity fans out (one root ↔ many child rows) can only flatten
    // 1:1 when `sorted_by` picks a single row — otherwise reject, like the
    // reference's multiplicity check (aggregation/parser.py:374-417),
    // instead of silently keeping an arbitrary row.
    m.flattenProps.foreach { f =>
      val childLabel = f.path
      val edge = source.edgeDf(childLabel, m.root)
      val child = source.nodeDf(childLabel)
      val childId = idOf(childLabel)
      if (f.sortedBy.isEmpty) {
        val mult = schema.linksOf(childLabel, m.root).multiplicity
        if (mult == "many_to_one" || mult == "many_to_many")
          throw new IllegalArgumentException(
            s"flatten_props ${f.path} on ${m.name}: multiplicity $mult fans " +
              "out; declare sorted_by (or model it as aggregated/nested props)")
      }
      f.sortedBy match {
        case Some((sortCol, desc)) =>
          val joined = edge.join(
            child.select(col(childId) +: (col(sortCol) +:
              f.props.map(Project.propCol)): _*), Seq(childId))
          val top = GraphOps.sortedFirst(joined, rootId, col(sortCol), desc,
            f.props.map(p => col(p.name)))
          doc = doc.join(top, Seq(rootId), "left_outer")
        case None =>
          val sel = child.select(col(childId) +: f.props.map(Project.propCol): _*)
          doc = doc.join(edge, Seq(rootId), "left_outer")
            .join(sel, Seq(childId), "left_outer").drop(childId)
            .dropDuplicates(rootId)
      }
    }

    // A2: aggregation paths, deepest chain as ONE multi-join plan each
    m.aggregatedProps.groupBy(_.path).foreach { case (path, defs) =>
      val hops = pathHops(m.root, path)
      val leafLabel = path.last
      val leafNeeded = defs.flatMap(_.src).distinct
      val leaf =
        if (leafNeeded.isEmpty) None
        else Some((source.nodeDf(leafLabel)
          .select(col(idOf(leafLabel)) +: leafNeeded.map(col): _*),
          idOf(leafLabel)))
      val aggs = defs.map { d =>
        val c = d.src.map(col).getOrElse(col(idOf(leafLabel)))
        // src-less count = per-path descendant count, dedup-by-id so
        // multi-path graphs don't double-count (SURVEY §7.4)
        if (d.fn == "count" && d.src.isEmpty) (d.name, "countd", c)
        else (d.name, d.fn, c)
      }
      val agged = GraphOps.aggPath(
        source.nodeDf(m.root).select(col(rootId)), rootId, hops, leaf, aggs)
      doc = doc.join(agged, Seq(rootId), "left_outer")
      // zero-fill after the left join (childless roots)
      defs.foreach { d =>
        doc = doc.withColumn(d.name, AggExpr.zeroFill(d.fn, col(d.name)))
      }
    }

    // A5: nested documents (recursive arrays of structs)
    m.nestedProps.foreach { nd =>
      val nested = buildNested(m.root, nd)
      doc = doc.join(nested, Seq(rootId), "left_outer")
    }

    // P5: mapping-level filter
    m.filter.foreach(f => doc = doc.filter(FilterDsl.compile(f)))
    doc.dropDuplicates(rootId)
  }

  /** edges along a dotted descendant path root→l1→l2…, each hop keyed on
    * the id the accumulated frame already carries. */
  private def pathHops(root: String, path: Seq[String]): Seq[(DataFrame, String)] = {
    val labels = root +: path
    labels.sliding(2).toSeq.map { case Seq(parent, child) =>
      // edge (childId, parentId): join on parentId which acc carries
      (source.edgeDf(child, parent), idOf(parent))
    }
  }

  /** A5 recursion: leaf-first collect_list(struct(...)). */
  private def buildNested(parentLabel: String, nd: NestedDef): DataFrame = {
    // walk multi-hop path: intermediate edges only, last label is the node
    val labels = parentLabel +: nd.path
    val nodeLabel = labels.last
    val nodeId = idOf(nodeLabel)
    var child = source.nodeDf(nodeLabel)
      .select(col(nodeId) +: nd.props.map(Project.propCol): _*)
    nd.filter.foreach(f => child = child.filter(FilterDsl.compile(f)))
    // attach grandchildren nested blocks first (leaf-first recursion)
    nd.children.foreach { sub =>
      child = child.join(buildNested(nodeLabel, sub), Seq(nodeId), "left_outer")
    }
    // join edges upward to the parent id
    val joined = labels.sliding(2).toSeq.reverse.foldLeft(child) {
      case (acc, Seq(parent, ch)) =>
        acc.join(source.edgeDf(ch, parent), Seq(idOf(ch)), "inner")
    }
    // struct fields: declared props + child nested blocks + the node's id —
    // intermediate hop ids stay out of the document
    val structCols = (nd.props.map(_.name) ++ nd.children.map(_.name))
      .map(col) :+ col(idOf(nodeLabel))
    GraphOps.nest(joined, idOf(parentLabel), structCols, nd.name)
  }

  private def translateCollector(m: IndexMapping): DataFrame = {
    val inj = m.injection.getOrElse(
      throw new IllegalArgumentException(s"collector ${m.name} missing injection"))
    // leaves = nodes of the target category; walk each leaf's ancestors to
    // collect injected props, then union
    val leafLabels = schema.nodes.filter(_.category == inj.category).map(_.label)
    val leaves = leafLabels.map { leaf =>
      val leafId = idOf(leaf)
      var df = source.nodeDf(leaf)
        .select(col(leafId) +: m.props.map(Project.propCol): _*)
        .withColumn("source_node", lit(leaf))
      // inject ancestor props by walking parents transitively
      inj.injectingProps.foreach { case (ancestorLabel, props) =>
        ancestorPath(leaf, ancestorLabel).foreach { pathLabels =>
          val joined = pathLabels.sliding(2).foldLeft(
            source.nodeDf(leaf).select(col(leafId))) {
            case (acc, Seq(child, parent)) =>
              acc.join(source.edgeDf(child, parent), Seq(idOf(child)), "left_outer")
          }
          val anc = source.nodeDf(ancestorLabel)
            .select(col(idOf(ancestorLabel)) +: props.map(Project.propCol): _*)
          val withProps = joined.join(anc, Seq(idOf(ancestorLabel)), "left_outer")
          val aggs = props.map(p => AggExpr.agg("set", col(p.name)).alias(p.name))
          val per = withProps.groupBy(col(leafId)).agg(aggs.head, aggs.tail: _*)
          df = df.join(per, Seq(leafId), "left_outer")
        }
      }
      df.withColumnRenamed(leafId, "_doc_id")
    }
    GraphOps.unionLeaves(leaves)
  }

  /** BFS child→parent to find a path from `from` up to `target` label. */
  private def ancestorPath(from: String, target: String): Option[Seq[String]] = {
    val seen = scala.collection.mutable.Set(from)
    var frontier = List(List(from))
    while (frontier.nonEmpty) {
      val hits = frontier.find(_.head == target)
      if (hits.isDefined) return hits.map(_.reverse)
      frontier = frontier.flatMap { path =>
        schema.parentsOf(path.head).map(_.parent)
          .filterNot(seen.contains)
          .map { p => seen += p; p :: path }
      }
    }
    None
  }
}

object Translator {

  /** Phase 1+2 driver: run all indices, then resolve `joining_props` in
    * topological order (producer indices first — reference
    * interpreter.py:34-62). Persist only frames consumed by another index. */
  def runAll(schema: GraphSchema, source: GraphSource,
             mapping: EtlMapping): Map[String, DataFrame] = {
    val problems = MappingValidator.validate(schema, mapping)
    if (problems.nonEmpty)
      throw new IllegalArgumentException(
        "invalid mapping:\n  " + problems.mkString("\n  "))
    val t = new Translator(schema, source)
    val base: Map[String, DataFrame] =
      mapping.indices.map(m => m.name -> t.translate(m)).toMap
    val consumed = mapping.indices.flatMap(_.joiningProps.map(_.otherIndex)).toSet
    val cached = base.map { case (n, df) =>
      n -> (if (consumed.contains(n))
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df)
    }
    // topo order: indices with no joining deps first; cycles rejected
    val order = topoOrder(mapping)
    order.foldLeft(cached) { (acc, m) =>
      if (m.joiningProps.isEmpty) acc
      else {
        val joined = m.joiningProps.foldLeft(acc(m.name)) { (doc, j) =>
          GraphOps.indexJoin(doc, acc(j.otherIndex), j.joinOn,
            j.props.map(p => (p, p.fn)))
        }
        acc + (m.name -> joined)
      }
    }
  }

  private def topoOrder(mapping: EtlMapping): Seq[IndexMapping] = {
    val byName = mapping.indices.map(m => m.name -> m).toMap
    val visited = scala.collection.mutable.LinkedHashSet[String]()
    val inStack = scala.collection.mutable.Set[String]()
    def visit(n: String): Unit = {
      if (visited.contains(n)) return
      if (!inStack.add(n))
        throw new IllegalArgumentException(s"joining_props cycle at $n")
      byName.get(n).toSeq.flatMap(_.joiningProps).foreach(j => visit(j.otherIndex))
      inStack -= n
      visited += n
    }
    mapping.indices.foreach(m => visit(m.name))
    visited.toSeq.flatMap(byName.get)
  }
}
