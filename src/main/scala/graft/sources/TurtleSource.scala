package graft.sources

import graft.schema.Turtle
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.input_file_name

/** Turtle corpus reader — loads a directory of `.ttl` files (the reference's
  * file-per-model output layout, IfcSpfReader.java's one-model-one-file) into
  * the queryable triples-table shape.
  *
  * ONE FILE = ONE DOCUMENT = ONE TASK: Turtle is document-stateful
  * (@prefix/@base scopes, blank-node labels), so a file cannot split across
  * tasks — the per-task memory envelope is one document's triples, exactly
  * the reference's own whole-file in-heap model (README.md:34) and this
  * pipeline's `maxDocChars` envelope. Parallelism comes from the file axis
  * (thousands of models ⇒ thousands of independent tasks), which is how the
  * corpus arrives in practice; for the line-splittable single-giant-file
  * case use [[NTriplesSource]] instead — that trade (TTL presentation vs NT
  * scale) is documented at the sinks, and the sources mirror it.
  *
  * The parse itself is the in-house [[graft.schema.Turtle]] recursive-descent
  * reader (the one the dictionary compiler and golden harness already trust),
  * run inside a narrow `flatMap` — no shuffle anywhere.
  */
object TurtleSource {

  /** One parsed triple; `doc_id` is the source file's basename (extension
    * stripped) — the same convention the pipeline's own corpus uses. */
  final case class TtlRow(doc_id: String, subj: String, pred: String, obj: String,
      obj_kind: String, obj_datatype: String, obj_lang: String)

  private val XsdString = Turtle.XSD_NS + "string"
  private val LangString = Turtle.RDF_NS + "langString"

  /** Read `.ttl` files under `path` (a directory or glob) into a triples
    * DataFrame (doc_id, subj, pred, obj, obj_kind, obj_datatype, obj_lang). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[TtlRow]
    spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "*.ttl")
      .text(path)
      .withColumn("file", input_file_name())
      .as[(String, String)]
      .flatMap { case (text, file) => rows(docIdOf(file), text) }(enc)
      .toDF()
  }

  /** file:///a/b/model.ttl → model (percent-decoded basename, extension
    * off). NOT URLDecoder: that is form decoding, which would turn a literal
    * `+` in a filename into a space — file URIs only percent-encode. */
  private[graft] def docIdOf(file: String): String = {
    val base = file.substring(file.lastIndexOf('/') + 1)
    val noExt = base.lastIndexOf('.') match {
      case -1 => base
      case i => base.substring(0, i)
    }
    if (noExt.indexOf('%') < 0) noExt
    else {
      val bytes = new java.io.ByteArrayOutputStream(noExt.length)
      def isHex(c: Char) = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      var i = 0
      while (i < noExt.length) {
        val c = noExt.charAt(i)
        // a '%' NOT followed by two hex digits is a literal '%' in the
        // filename (input_file_name encoding is not guaranteed across
        // filesystems) — emit it verbatim like the truncated-% branch,
        // never throw an unpositioned NumberFormatException mid-corpus
        if (c == '%' && i + 2 < noExt.length &&
            isHex(noExt.charAt(i + 1)) && isHex(noExt.charAt(i + 2))) {
          bytes.write(Integer.parseInt(noExt.substring(i + 1, i + 3), 16)); i += 3
        } else {
          val cb = c.toString.getBytes("UTF-8"); bytes.write(cb, 0, cb.length); i += 1
        }
      }
      new String(bytes.toByteArray, "UTF-8")
    }
  }

  /** Parse one document's Turtle text. Errors from the parser carry
    * line/col; wrap them with the doc id so a corpus-scale load names the
    * offending file. */
  private[graft] def rows(docId: String, text: String): Seq[TtlRow] = {
    val triples =
      try Turtle.parse(text)
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(s"[$docId] ${e.getMessage}", e)
      }
    triples.map { t =>
      val subj = t.s match {
        case Turtle.Iri(v) => v
        case Turtle.BNode(id) => id
        case other => throw new IllegalArgumentException(
          s"[$docId] literal subject $other")
      }
      val pred = t.p match {
        case Turtle.Iri(v) => v
        case other => throw new IllegalArgumentException(
          s"[$docId] non-IRI predicate $other")
      }
      t.o match {
        case Turtle.Iri(v) => TtlRow(docId, subj, pred, v, "iri", "", "")
        case Turtle.BNode(id) => TtlRow(docId, subj, pred, id, "bnode", "", "")
        case Turtle.Lit(lex, dt, lang) =>
          // xsd:string → "" matches the pipeline/NT convention (RDF 1.1
          // implicit datatype); rdf:langString is implied by the tag
          val dtOut = if (dt == XsdString || (lang.nonEmpty && dt == LangString)) "" else dt
          TtlRow(docId, subj, pred, lex, "literal", dtOut, lang)
      }
    }
  }
}
