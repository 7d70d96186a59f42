package graft.store

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Wire/response rendering (reference `src/shared/response/json.rs:151-226`;
  * SURVEY.md §2.7): results stream as JSON line frames —
  *
  * {{{
  * {"type":"schema","columns":["a","b"]}
  * {"type":"batch","rows":[[1,"x"],[2,"y"]]}
  * {"type":"end","row_count":2}
  * }}}
  *
  * Rows stream through `toLocalIterator` (one partition in memory at a
  * time — no full collect), batched `batchSize` rows per frame like the
  * reference's bounded streaming batches. The reference's Arrow IPC
  * renderer maps to Spark's built-in Arrow collect path; a transport layer
  * would use that directly.
  */
object Responses {

  /** Render an [[ExecResult]] in the reference's line protocol
    * (`shared/response/unix.rs:26-76`): a `<code> <message>` header line,
    * then body lines (Ok) or streamed JSON frames (Frame). Errors carry
    * their message on the header line — e.g.
    * `403 Write permission denied for event type 'orders'`. */
  def render(r: ExecResult, batchSize: Int = 1000): String = r match {
    case ExecResult.Ok(msg)          => s"200 OK\n$msg\n"
    case ExecResult.Error(msg, code) => s"$code $msg\n"
    case ExecResult.Frame(df) =>
      jsonFrames(df, batchSize).mkString("200 OK\n", "\n", "\n")
  }

  def jsonFrames(df: DataFrame, batchSize: Int = 1000): Iterator[String] = {
    val mapper = new ObjectMapper()
    val schema = df.schema
    val header = {
      val n = mapper.createObjectNode()
      n.put("type", "schema")
      val cols = n.putArray("columns")
      // internal shadow columns (p$timestamp …) render under their declared
      // payload name — the rendering half of EventSchema.columnName
      schema.fieldNames.foreach(f => cols.add(graft.schema.EventSchema.displayName(f)))
      mapper.writeValueAsString(n)
    }

    var rowCount = 0L
    val rowIt = df.toLocalIterator()
    val batches = new Iterator[String] {
      def hasNext: Boolean = rowIt.hasNext
      def next(): String = {
        val n = mapper.createObjectNode()
        n.put("type", "batch")
        val rows = n.putArray("rows")
        var i = 0
        while (i < batchSize && rowIt.hasNext) {
          val row = rowIt.next()
          val arr = rows.addArray()
          schema.fields.indices.foreach { j =>
            if (row.isNullAt(j)) arr.addNull()
            else schema.fields(j).dataType match {
              case LongType | IntegerType => arr.add(row.getAs[Number](j).longValue())
              case DoubleType | FloatType => arr.add(row.getAs[Number](j).doubleValue())
              case BooleanType            => arr.add(row.getBoolean(j))
              case _                      => arr.add(row.get(j).toString)
            }
          }
          rowCount += 1; i += 1
        }
        mapper.writeValueAsString(n)
      }
    }

    Iterator(header) ++ batches ++ new Iterator[String] {
      private var done = false
      def hasNext: Boolean = !done
      def next(): String = {
        done = true
        val n = mapper.createObjectNode()
        n.put("type", "end"); n.put("row_count", rowCount)
        mapper.writeValueAsString(n)
      }
    }
  }

  /** Arrow IPC stream rendering of a result frame (reference
    * `src/shared/response/arrow.rs:18-60` ArrowStreamEncoder: one schema
    * message followed by record batches — the standard Arrow streaming
    * format, readable by any Arrow client). Long/double/bool columns map to
    * their native Arrow types; everything else renders Utf8, mirroring
    * [[jsonFrames]]' coercions so both renderers agree row-for-row.
    *
    * Rows stream through `toLocalIterator` in `batchSize` record batches —
    * one partition in memory at a time, same as the JSON path. */
  def arrowFrame(df: DataFrame, batchSize: Int = 1000): Array[Byte] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field => AField, FieldType => AFieldType, Schema => ASchema}

    val sparkSchema = df.schema
    val afields: Seq[AField] = sparkSchema.fields.toSeq.map { f =>
      val t: ArrowType = f.dataType match {
        case LongType | IntegerType => new ArrowType.Int(64, true)
        case DoubleType | FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case BooleanType            => ArrowType.Bool.INSTANCE
        case _                      => ArrowType.Utf8.INSTANCE
      }
      new AField(graft.schema.EventSchema.displayName(f.name), AFieldType.nullable(t), null)
    }
    val schema = new ASchema(java.util.Arrays.asList(afields: _*))
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, out)
        writer.start()
        val rowIt = df.toLocalIterator()
        while (rowIt.hasNext) {
          root.allocateNew()
          var i = 0
          while (i < batchSize && rowIt.hasNext) {
            val row = rowIt.next()
            var j = 0
            while (j < sparkSchema.fields.length) {
              val vec = root.getVector(j)
              if (row.isNullAt(j)) vec.asInstanceOf[FieldVector] match {
                case v: BigIntVector  => v.setNull(i)
                case v: Float8Vector  => v.setNull(i)
                case v: BitVector     => v.setNull(i)
                case v: VarCharVector => v.setNull(i)
                case _                => ()
              } else sparkSchema.fields(j).dataType match {
                case LongType | IntegerType =>
                  vec.asInstanceOf[BigIntVector].setSafe(i, row.getAs[Number](j).longValue())
                case DoubleType | FloatType =>
                  vec.asInstanceOf[Float8Vector].setSafe(i, row.getAs[Number](j).doubleValue())
                case BooleanType =>
                  vec.asInstanceOf[BitVector].setSafe(i, if (row.getBoolean(j)) 1 else 0)
                case _ =>
                  vec.asInstanceOf[VarCharVector].setSafe(i, row.get(j).toString.getBytes("UTF-8"))
              }
              j += 1
            }
            i += 1
          }
          root.setRowCount(i)
          writer.writeBatch()
        }
        writer.end()
        writer.close()
        out.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
}
