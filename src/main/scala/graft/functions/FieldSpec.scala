package graft.functions

import org.apache.spark.sql.types._

/** Per-field encoding directives for the binary row encoders and
  * connectors — the schema knobs a real ClickHouse/Vertica table needs
  * beyond Spark's type system (reference semantics:
  * sink/encoding/binary/ByteWriter.scala:26-45 bounded/fixed byte
  * arrays; clickhouse/rowbinary/RowBinaryClickHousePrimitiveTypeWriter
  * .scala:40-69 bounded String / FixedString / UUID;
  * vertica/file/native/NativeVerticaPrimitiveTypeWriter.scala:38-69
  * VARCHAR(N) / CHAR(N) / UUID).
  *
  * Grammar (comma-separated, each `field:directive`):
  * {{{
  *   props:varchar(64)     — bounded, TRUNCATE at UTF-8 char boundary
  *   props:varchar(64)!    — bounded, FAIL if it does not fit
  *   code:fixed(16)        — fixed width, padded (0x00 ClickHouse / ' ' Vertica CHAR)
  *   code:fixed(16)!       — fixed width, fail instead of truncating
  *   id:uuid               — canonical UUID string → 16 wire bytes
  * }}}
  * `varchar`/`fixed` apply to string and binary fields (binary truncates
  * at raw byte positions, strings never split a multi-byte character);
  * `uuid` applies to string fields. Unlisted fields keep the default
  * unbounded encoding.
  */
sealed trait FieldDirective
object FieldDirective {
  case object Default extends FieldDirective
  final case class Bounded(maxBytes: Int, truncate: Boolean) extends FieldDirective
  final case class Fixed(length: Int, truncate: Boolean) extends FieldDirective
  case object Uuid extends FieldDirective
}

object FieldSpec {
  import FieldDirective._

  private val BoundedRe = """varchar\((\d+)\)(!?)""".r
  private val FixedRe = """fixed\((\d+)\)(!?)""".r

  /** Parse the spec grammar; throws IllegalArgumentException on junk. */
  def parse(spec: String): Map[String, FieldDirective] =
    if (spec == null || spec.trim.isEmpty) Map.empty
    else spec.split(",").map(_.trim).filter(_.nonEmpty).map { entry =>
      entry.split(":").map(_.trim) match {
        case Array(name, d) =>
          def positive(n: String, what: String): Int = {
            val v = n.toInt
            if (v < 1) throw new IllegalArgumentException(
              s"field spec: $what($v) for field '$name' — width must be >= 1 " +
                "(a zero-width field would desync the byte stream)")
            v
          }
          val directive = d match {
            case BoundedRe(n, bang) => Bounded(positive(n, "varchar"), truncate = bang.isEmpty)
            case FixedRe(n, bang) => Fixed(positive(n, "fixed"), truncate = bang.isEmpty)
            case "uuid" => Uuid
            case other => throw new IllegalArgumentException(
              s"field spec: unknown directive '$other' for field '$name' " +
                "(expected varchar(N), varchar(N)!, fixed(N), fixed(N)! or uuid)")
          }
          name -> directive
        case _ => throw new IllegalArgumentException(
          s"field spec: malformed entry '$entry' (expected field:directive)")
      }
    } match {
      // a duplicated field must fail, not last-win: "f:varchar(64)!,
      // f:varchar(64)" (a config merge artifact) would silently replace
      // the fail-fast directive with the truncating one — a data-policy
      // change with no warning
      case entries =>
        val dups = entries.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
        if (dups.nonEmpty) throw new IllegalArgumentException(
          s"field spec: duplicate field(s): ${dups.mkString(", ")}")
        entries.toMap
    }

  /** Validate directives against a struct; returns an error or None. */
  def check(schema: StructType, directives: Map[String, FieldDirective]): Option[String] = {
    val names = schema.fieldNames.toSet
    val unknown = directives.keySet.diff(names)
    if (unknown.nonEmpty) return Some(s"field spec names not in schema: ${unknown.mkString(", ")}")
    schema.fields.iterator.flatMap { f =>
      (directives.getOrElse(f.name, Default), f.dataType) match {
        case (Default, _) => None
        case (_: Bounded | _: Fixed, StringType | BinaryType) => None
        case (Uuid, StringType) => None
        case (d, t) => Some(s"field spec: $d not applicable to ${f.name}: $t")
      }
    }.toSeq.headOption
  }

  /** Directive per struct position (Default when unlisted). */
  def resolve(schema: StructType, directives: Map[String, FieldDirective]): Array[FieldDirective] =
    schema.fields.map(f => directives.getOrElse(f.name, Default))
}
