package graft.frontend

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import graft.ast._
import graft.store.EventStore

/** The HTTP JSON command form (reference `src/frontend/http/json_command.rs`):
  * `{"type": "Define|Store|Query|Replay|Ping|Flush|Batch", ...}` with
  * PascalCase tags, an untagged where-expression
  * (`{field,op,value} | {field,in:[..]} | {and|or:[..]} | {not:{..}}`) and
  * `{fields: {name: "type" | [enum...]}}` schemas.
  *
  * Converted to line-protocol command TEXT and dispatched through the same
  * parser as `/command` — one grammar, one validation path, no second AST
  * builder to drift. */
object JsonCommands {

  def toCommandText(body: String): Either[String, String] =
    try {
      val n = EventStore.readTree(body)
      if (!n.isObject) Left("expected a JSON object")
      else convert(n)
    } catch { case e: Exception => Left(e.getMessage) }

  /** Rendering a JSON value into line-protocol TEXT must round-trip: a quote
    * or backslash in a string operand is escaped (Render.lit rules), and an
    * identifier-position value (event type, context id, field name, enum
    * member) containing whitespace or structural characters is rejected —
    * interpolated raw it would re-tokenize as a different command. */
  private final class BadCommand(msg: String) extends RuntimeException(msg)

  private def escStr(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def identChecked(s: String, what: String): String = {
    if (s.exists(c => c.isWhitespace || c.isControl) || s.exists("\",[]{}();".contains(_)))
      throw new BadCommand(s"$what contains characters not allowed in an identifier: '$s'")
    s
  }

  private def convert(n: JsonNode): Either[String, String] = {
    val typ = Option(n.get("type")).map(_.asText()).getOrElse(return Left("missing 'type'"))
    typ match {
      case "Ping"  => Right("PING")
      case "Flush" => Right("FLUSH")

      case "Define" =>
        val et = identChecked(str(n, "event_type")
          .getOrElse(return Left("Define: missing event_type")), "event_type")
        val ver = Option(n.get("version")).filterNot(_.isNull).map(v => s" AS ${v.asInt()}").getOrElse("")
        val fieldsNode = Option(n.get("schema")).flatMap(s => Option(s.get("fields")))
          .getOrElse(return Left("Define: missing schema.fields"))
        val specs = fieldsNode.properties().asScala.map { e =>
          val spec = e.getValue
          val fname = identChecked(e.getKey, "field name")
          if (spec.isArray)
            fname + ": " + spec.elements().asScala
              .map(v => identChecked(v.asText(), "enum value")).mkString("[", ", ", "]")
          else
            fname + ": " + "\"" + escStr(spec.asText()) + "\""
        }
        Right(s"DEFINE $et$ver FIELDS { ${specs.mkString(", ")} }")

      case "Store" =>
        val et = identChecked(str(n, "event_type")
          .getOrElse(return Left("Store: missing event_type")), "event_type")
        val ctx = identChecked(str(n, "context_id")
          .getOrElse(return Left("Store: missing context_id")), "context_id")
        val payload = Option(n.get("payload")).getOrElse(return Left("Store: missing payload"))
        Right(s"STORE $et FOR $ctx PAYLOAD ${payload.toString}")

      case "Query" =>
        val et = identChecked(str(n, "event_type")
          .getOrElse(return Left("Query: missing event_type")), "event_type")
        val sb = new StringBuilder(s"QUERY $et")
        str(n, "context_id").foreach(c => sb.append(s" FOR ${identChecked(c, "context_id")}"))
        str(n, "since").foreach(s => sb.append(s""" SINCE "${escStr(s)}""""))
        val whereNode = Option(n.get("where_clause")).orElse(Option(n.get("where")))
          .filterNot(_.isNull)
        whereNode.foreach { w => sb.append(" WHERE " + Render.expr(jsonExpr(w))) }
        str(n, "time_field").foreach(f => sb.append(s" USING ${identChecked(f, "time_field")}"))
        num(n, "limit").foreach(v => sb.append(s" LIMIT $v"))
        num(n, "offset").foreach(v => sb.append(s" OFFSET $v"))
        Option(n.get("order_by")).filterNot(_.isNull).foreach { o =>
          val f = identChecked(Option(o.get("field")).map(_.asText()).getOrElse("timestamp"),
            "order_by.field")
          val d = Option(o.get("desc")).exists(_.asBoolean())
          sb.append(s" ORDER BY $f ${if (d) "DESC" else "ASC"}")
        }
        Right(sb.toString)

      case "Replay" =>
        val ctx = identChecked(str(n, "context_id")
          .getOrElse(return Left("Replay: missing context_id")), "context_id")
        val et = str(n, "event_type").map(t => s"${identChecked(t, "event_type")} ").getOrElse("")
        val sb = new StringBuilder(s"REPLAY ${et}FOR $ctx")
        str(n, "since").foreach(s => sb.append(s""" SINCE "${escStr(s)}""""))
        str(n, "time_field").foreach(f => sb.append(s" USING ${identChecked(f, "time_field")}"))
        Right(sb.toString)

      case "Batch" =>
        val arr = Option(n.get("commands")).filter(_.isArray)
          .orElse(Some(n).filter(_.isArray))
          .getOrElse(return Left("Batch: expected an array of commands"))
        val parts = arr.elements().asScala.map(convert).toSeq
        parts.collectFirst { case Left(e) => e } match {
          case Some(e) => Left(e)
          case None    => Right(parts.collect { case Right(c) => c }.mkString("BATCH [ ", "; ", " ]"))
        }

      case other => Left(s"unknown command type: $other")
    }
  }

  /** Untagged JsonExpr (reference `json_command.rs:108-186`): compare, in,
    * logical. Unknown ops default to Eq, empty logical nodes to the
    * always-false placeholder — both reference behaviors. */
  private def jsonExpr(n: JsonNode): Expr = {
    if (n.has("field") && n.has("in")) {
      val vals = n.get("in").elements().asScala.map(jsonLit).toSeq
      Expr.In(FieldRef(n.get("field").asText()), vals)
    } else if (n.has("field")) {
      val op = Option(n.get("op")).map(_.asText()).getOrElse("eq") match {
        case "eq" | "==" | "="   => CompareOp.Eq
        case "neq" | "!=" | "<>" => CompareOp.Neq
        case "gt" | ">"          => CompareOp.Gt
        case "gte" | ">="        => CompareOp.Gte
        case "lt" | "<"          => CompareOp.Lt
        case "lte" | "<="        => CompareOp.Lte
        case _                   => CompareOp.Eq
      }
      Expr.Cmp(FieldRef(n.get("field").asText()), op,
        jsonLit(Option(n.get("value")).getOrElse(
          com.fasterxml.jackson.databind.node.NullNode.getInstance())))
    } else if (n.has("and") && n.get("and").size() > 0) {
      n.get("and").elements().asScala.map(jsonExpr).reduceLeft(Expr.And(_, _))
    } else if (n.has("or") && n.get("or").size() > 0) {
      n.get("or").elements().asScala.map(jsonExpr).reduceLeft(Expr.Or(_, _))
    } else if (n.has("not") && !n.get("not").isNull) {
      Expr.Not(jsonExpr(n.get("not")))
    } else {
      // reference fallback: always-false comparison on the empty field
      Expr.Cmp(FieldRef(""), CompareOp.Eq, Lit.Bool(false))
    }
  }

  private def jsonLit(v: JsonNode): Lit =
    if (v.isNull) Lit.Null
    else if (v.isBoolean) Lit.Bool(v.asBoolean())
    else if (v.isIntegralNumber) Lit.I64(v.asLong())
    else if (v.isFloatingPointNumber) Lit.F64(v.asDouble())
    else Lit.Str(v.asText())

  private def str(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
  private def num(n: JsonNode, k: String): Option[Long] =
    Option(n.get(k)).filterNot(_.isNull).map(_.asLong())
}
