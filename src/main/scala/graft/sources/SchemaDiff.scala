package graft.sources

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Schema-evolution diff between two table versions — the metadata
  * counterpart of the snapshot diff (q52): which columns were added,
  * removed, type-changed, or had their nullability altered. Nested structs
  * are flattened to dotted paths so a change deep inside a struct is
  * reported at its precise location, not as a whole-column type change.
  */
object SchemaDiff {

  sealed trait Change { def path: String }
  final case class Added(path: String, dataType: String) extends Change
  final case class Removed(path: String, dataType: String) extends Change
  final case class TypeChanged(path: String, from: String, to: String) extends Change
  final case class NullabilityChanged(path: String, from: Boolean, to: Boolean) extends Change

  /** Flatten a schema to (dottedPath -> (leafType, nullable)). Struct
    * internals recurse; arrays/maps flatten their ELEMENT struct (with
    * `[]` / `[value]` markers) so evolution inside collections is visible. */
  def flatten(schema: StructType, prefix: String = ""): Seq[(String, (String, Boolean))] =
    schema.fields.toSeq.flatMap { f => flattenField(s"$prefix${f.name}", f.dataType, f.nullable) }

  private def flattenField(path: String, dt: DataType, nullable: Boolean): Seq[(String, (String, Boolean))] =
    dt match {
      case st: StructType => (path -> ("struct", nullable)) +: flatten(st, s"$path.")
      case ArrayType(et: StructType, n) =>
        (path -> ("array<struct>", nullable)) +: flatten(et, s"$path[].")
      case ArrayType(et, _) => Seq(path -> (s"array<${et.simpleString}>", nullable))
      case MapType(k, v: StructType, n) =>
        (path -> (s"map<${k.simpleString},struct>", nullable)) +: flatten(v, s"$path[value].")
      case other => Seq(path -> (other.simpleString, nullable))
    }

  /** Changes from `before` to `after`, ordered by path for determinism. */
  def diff(before: StructType, after: StructType): Seq[Change] = {
    val b = flatten(before).toMap
    val a = flatten(after).toMap
    val removed = (b.keySet -- a.keySet).toSeq.map(p => Removed(p, b(p)._1))
    val added = (a.keySet -- b.keySet).toSeq.map(p => Added(p, a(p)._1))
    val common = (b.keySet & a.keySet).toSeq
    val typeChanged = common.collect {
      case p if b(p)._1 != a(p)._1 => TypeChanged(p, b(p)._1, a(p)._1)
    }
    val nullChanged = common.collect {
      case p if b(p)._1 == a(p)._1 && b(p)._2 != a(p)._2 =>
        NullabilityChanged(p, b(p)._2, a(p)._2)
    }
    (removed ++ added ++ typeChanged ++ nullChanged).sortBy(_.path)
  }
}
