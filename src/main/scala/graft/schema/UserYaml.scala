package graft.schema

import java.{util => ju}
import scala.jdk.CollectionConverters._

/** user.yaml → project-code → resource-path override map for
  * `Project.authResourcePath` (reference: tube/utils/general.py:20-55,
  * `get_resource_paths_from_yaml`): every user's `projects[]` entry with a
  * `resource` contributes `auth_id -> resource`, then
  * `authz.user_project_to_resource` (or the legacy `rbac` key) overrides. */
object UserYaml {
  import org.yaml.snakeyaml.Yaml

  def resourcePaths(yaml: String): Map[String, String] = {
    val root = asMap(new Yaml().load[ju.Map[String, AnyRef]](yaml))
    val fromUsers = asMap(root.getOrElse("users", null)).values.flatMap { u =>
      (asMap(u).getOrElse("projects", null) match {
        case l: ju.List[_] => l.asScala.toSeq
        case null          => Nil
        case single        => Seq(single)
      }).map(asMap).collect {
        // reference uses pr.get('auth_id') and tolerates its absence —
        // skip entries with a resource but no auth_id instead of throwing
        case p if p.contains("resource") && p.contains("auth_id") =>
          p("auth_id").toString -> p("resource").toString
      }
    }
    val authz = root.get("authz").orElse(root.get("rbac")).map(asMap)
      .getOrElse(Map.empty)
    val fromAuthz = asMap(authz.getOrElse("user_project_to_resource", null))
      .map { case (k, v) => k -> v.toString }
    fromUsers.toMap ++ fromAuthz
  }

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: ju.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case _               => Map.empty
  }
}
