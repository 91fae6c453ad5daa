package graft.schema

import java.{util => ju}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The mapping-level boolean filter DSL: a tree of `{op, prop, value}`
  * leaves under `and`/`or` compounds (reference: tube/etl/indexers/base/
  * logic.py:4-108).
  *
  * Unlike the reference — which assembles a SQL string and materializes
  * `array_contains` into a temporary boolean column it later drops — we
  * compile the tree directly to a Catalyst `Column`, so predicate pushdown
  * and codegen apply with no temp columns.
  */
sealed trait FilterNode
final case class FilterLeaf(op: String, prop: String, value: Any) extends FilterNode
final case class FilterAnd(children: Seq[FilterNode]) extends FilterNode
final case class FilterOr(children: Seq[FilterNode]) extends FilterNode

object FilterDsl {

  def compile(node: FilterNode): Column = node match {
    case FilterAnd(cs) => cs.map(compile).reduce(_ && _)
    case FilterOr(cs)  => cs.map(compile).reduce(_ || _)
    case FilterLeaf(op, prop, value) =>
      val c = col(prop)
      op.toLowerCase match {
        case "=" | "=="    => c === lit(value)
        case "!=" | "<>"   => c =!= lit(value)
        case ">"           => c > lit(value)
        case ">="          => c >= lit(value)
        case "<"           => c < lit(value)
        case "<="          => c <= lit(value)
        case "in"          => c.isin(seqOf(value): _*)
        case "not_in"      => !c.isin(seqOf(value): _*)
        case "contains"    => array_contains(c, value)  // array-membership leaf
        case "like"        => c.like(value.toString)
        case "is_null"     => c.isNull
        case "is_not_null" => c.isNotNull
        case other => throw new IllegalArgumentException(s"filter op $other")
      }
  }

  /** Every prop a filter tree references — lets callers decide whether a
    * filter is evaluable on a given projection (e.g. the Translator's
    * root-only bloom-prune gate). */
  def fields(node: FilterNode): Set[String] = node match {
    case FilterAnd(cs)         => cs.flatMap(fields).toSet
    case FilterOr(cs)          => cs.flatMap(fields).toSet
    case FilterLeaf(_, p, _)   => Set(p)
  }

  private def seqOf(v: Any): Seq[Any] = v match {
    case l: ju.List[_]  => l.asScala.toSeq
    case s: Seq[_]      => s
    case other          => Seq(other)
  }

  /** Build from parsed YAML/JSON (java Maps/Lists), reference shape:
    * `{op: and, filters: [{op: "=", prop: p, value: v}, ...]}`. */
  def fromAny(o: Any): FilterNode = o match {
    case m: ju.Map[_, _] =>
      val mm = m.asScala.map { case (k, v) => k.toString -> v }.toMap
      fromMap(mm)
    case m: Map[_, _] =>
      fromMap(m.map { case (k, v) => k.toString -> v })
    case other => throw new IllegalArgumentException(s"filter node $other")
  }

  private def fromMap(m: Map[String, Any]): FilterNode = {
    val op = m.getOrElse("op", "").toString.toLowerCase
    def children: Seq[FilterNode] = (m.getOrElse("filters", null) match {
      case l: ju.List[_] => l.asScala.toSeq
      case l: Seq[_]     => l
      case _             => Nil
    }).map(fromAny)
    op match {
      case "and" => FilterAnd(children)
      case "or"  => FilterOr(children)
      case leaf  => FilterLeaf(leaf, m("prop").toString, m.getOrElse("value", null))
    }
  }
}
