package graft.schema

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Build-time dictionary compiler.
  *
  * Reads the public buildingSMART EXPRESS schema text (`<ver>.exp`), the
  * flattened inheritance-ordered attribute list (`proplist<ver>.csv`), the
  * ifcOWL ontology (`<ver>.ttl`) and the EXPRESS/list base ontologies, and
  * emits one compact TSV dictionary per schema version under
  * `src/main/resources/graft/dict/`. The generated files are checked in; this
  * main is only re-run when adding schema versions.
  *
  * Equivalent reference behavior: IfcSpfReader.setup (deserializing
  * EntityVO/TypeVO maps, IfcSpfReader.java:248-307) + the OntModel queries in
  * RDFWriter (ranges :265-266, enum individuals :660-663, list content types
  * :1021-1051, xsd kinds :1053-1090) — all precomputed here.
  */
object DictGen {
  import SchemaDict._

  // version -> ontology URI path segment (reference: IfcSpfReader.java:279-303)
  val ontAlt: Map[String, String] = Map(
    "IFC2X3_Final" -> "IFC2x3/FINAL/",
    "IFC2X3_TC1" -> "IFC2x3/TC1/",
    "IFC4_ADD1" -> "IFC4/ADD1/",
    "IFC4_ADD2" -> "IFC4/ADD2/",
    "IFC4_ADD2_TC1" -> "IFC4/ADD2_TC1/",
    "IFC4x1" -> "IFC4_1/",
    "IFC4x3_RC1" -> "IFC4_3/RC1/",
    "IFC4" -> "IFC4/FINAL/"
  )

  def main(args: Array[String]): Unit = {
    val refRes = if (args.length > 0) args(0) else "/root/reference/src/main/resources"
    val outDir = if (args.length > 1) args(1) else "src/main/resources/graft/dict"
    val versions = if (args.length > 2) args.drop(2).toSeq else Seq("IFC4_ADD2_TC1", "IFC2X3_TC1")
    Files.createDirectories(Paths.get(outDir))
    versions.foreach { v =>
      val dict = compile(refRes, v)
      val out = Paths.get(outDir, s"$v.tsv")
      Files.writeString(out, SchemaDict.toTsv(dict))
      println(s"[dictgen] $v: ${dict.entities.size} entities, ${dict.types.size} types, " +
        s"${dict.classes.size} classes, ${dict.enumLabels.size} enums -> $out")
    }
  }

  def compile(refRes: String, version: String): SchemaDict = {
    val ontNS = "http://standards.buildingsmart.org/IFC/DEV/" + ontAlt(version) + "OWL#"
    val expText = Files.readString(Paths.get(refRes, s"$version.exp"))
    val csvText = Files.readString(Paths.get(refRes, s"proplist$version.csv"))
    val ontTriples = Turtle.parse(Files.readString(Paths.get(refRes, s"$version.ttl")))
    val exprTriples = Turtle.parse(Files.readString(Paths.get(refRes, "express.ttl")))
    val listTriples = Turtle.parse(Files.readString(Paths.get(refRes, "list.ttl")))
    val all = ontTriples ++ exprTriples ++ listTriples

    // ---- class universe + subclass closure (named classes only) ----
    val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    val subClassOf = RDFS + "subClassOf"
    val label = RDFS + "label"
    val range = RDFS + "range"

    def key(iri: String): Option[String] =
      if (iri.startsWith(ontNS)) Some("i:" + iri.substring(ontNS.length))
      else if (iri.startsWith(EXPRESS_NS)) Some("x:" + iri.substring(EXPRESS_NS.length))
      else if (iri.startsWith(LIST_NS)) Some("l:" + iri.substring(LIST_NS.length))
      else None

    val superEdges = mutable.HashMap[String, mutable.HashSet[String]]()
    val classSet = mutable.HashSet[String]()
    all.foreach {
      case Turtle.Triple(Turtle.Iri(s), Turtle.Iri(p), Turtle.Iri(o)) =>
        if (p == subClassOf) (key(s), key(o)) match {
          case (Some(ks), Some(ko)) =>
            superEdges.getOrElseUpdate(ks, mutable.HashSet()) += ko
            classSet += ks; classSet += ko
          case _ => ()
        }
        else if (p == RDF_TYPE && o == OWL_NS + "Class") key(s).foreach(classSet += _)
      case _ => ()
    }

    val closureCache = mutable.HashMap[String, Set[String]]()
    def closure(k: String): Set[String] = closureCache.getOrElseUpdate(k, {
      val seen = mutable.HashSet[String](k)
      val stack = mutable.Stack[String](k)
      while (stack.nonEmpty) {
        superEdges.getOrElse(stack.pop(), Set.empty).foreach { s =>
          if (seen.add(s)) stack.push(s)
        }
      }
      seen.toSet
    })

    // xsd kind, in the reference's fixed priority order (RDFWriter.java:1053-1077)
    val xsdOrder = Seq(
      "x:STRING" -> "string", "x:REAL" -> "double", "x:INTEGER" -> "integer",
      "x:BINARY" -> "hexBinary", "x:BOOLEAN" -> "boolean", "x:LOGICAL" -> "logical",
      "x:NUMBER" -> "double")
    // list content type, same order (RDFWriter.java:1021-1051)
    val primListOrder = Seq("STRING", "REAL", "INTEGER", "BINARY", "BOOLEAN", "LOGICAL", "NUMBER")

    def classInfoOf(k: String): ClassInfo = {
      val cl = closure(k)
      val isEnum = cl.contains("x:ENUMERATION")
      val isSelect = cl.contains("x:SELECT")
      val isList = cl.contains("l:OWLList")
      val xsd = xsdOrder.collectFirst { case (c, x) if cl.contains(c) => x }.getOrElse("")
      val listContent: String =
        primListOrder.collectFirst { case p if cl.contains(s"x:${p}_List") => s"x:$p" }
          .getOrElse {
            val local = k.substring(2)
            if (isList && local.length > 5 && local.endsWith("_List"))
              // reference strips the trailing "_List" and resolves in the ifc NS
              // (RDFWriter.java:1044-1046)
              "i:" + local.substring(0, local.length - 5)
            else ""
          }
      ClassInfo(k, isEnum, isSelect, isList, xsd, if (isList) listContent else "")
    }

    val classes: Map[String, ClassInfo] =
      classSet.iterator.filterNot(_.startsWith("l:")).map(k => k -> classInfoOf(k)).toMap

    // ---- property ranges ----
    val propRange: Map[String, String] = all.collect {
      case Turtle.Triple(Turtle.Iri(s), Turtle.Iri(p), Turtle.Iri(o))
        if p == range && s.startsWith(ontNS) && key(o).isDefined =>
        s.substring(ontNS.length) -> key(o).get
    }.toMap

    // ---- enum individuals: enum class key -> UPPER(label) -> individual local ----
    val indivTypes = mutable.HashMap[String, mutable.ArrayBuffer[String]]() // indiv iri -> class keys
    val indivLabel = mutable.HashMap[String, String]()
    ontTriples.foreach {
      case Turtle.Triple(Turtle.Iri(s), Turtle.Iri(p), Turtle.Iri(o)) if p == RDF_TYPE =>
        key(o).foreach { ko =>
          if (classes.get(ko).exists(_.isEnum)) indivTypes.getOrElseUpdate(s, mutable.ArrayBuffer()) += ko
        }
      case Turtle.Triple(Turtle.Iri(s), Turtle.Iri(p), lit: Turtle.Lit) if p == label =>
        indivLabel(s) = lit.lex
      case _ => ()
    }
    val enumLabels = mutable.HashMap[String, mutable.HashMap[String, String]]()
    indivTypes.foreach { case (iri, classKeys) =>
      indivLabel.get(iri).foreach { lbl =>
        val local = iri.substring(iri.lastIndexOf('#') + 1)
        classKeys.foreach { ck =>
          enumLabels.getOrElseUpdate(ck, mutable.HashMap())(lbl.toUpperCase(java.util.Locale.ROOT)) = local
        }
      }
    }

    // ---- types from .exp ----
    val types = mutable.HashMap[String, TypeDef]()
    val typeRe = "(?s)TYPE\\s+(\\w+)\\s*=\\s*(.*?);".r
    typeRe.findAllMatchIn(expText).foreach { m =>
      val name = m.group(1)
      val expr = m.group(2).replaceAll("\\s+", " ").trim
      val primLast = expr.split(" ").last.replace(";", "")
      types(formatClassName(name)) = TypeDef(name, primLast)
    }

    // ---- entities: names from .exp, ordered attrs from proplist CSV ----
    val entityNames = mutable.LinkedHashMap[String, String]() // UPPER -> CamelCase
    val entRe = "(?m)^ENTITY\\s+(\\w+)".r
    entRe.findAllMatchIn(expText).foreach { m =>
      entityNames(formatClassName(m.group(1))) = m.group(1)
    }
    val attrsByEntity = mutable.HashMap[String, mutable.ArrayBuffer[AttrSlot]]()
    csvText.linesIterator.foreach { line =>
      val f = line.split(',')
      if (f.length >= 4) {
        val entity = f(0).trim
        val declName = f(2).trim
        val propLocal = declName.substring(0, 1).toLowerCase + declName.substring(1)
        val rk = propRange.getOrElse(propLocal, "")
        attrsByEntity.getOrElseUpdate(formatClassName(entity), mutable.ArrayBuffer()) += AttrSlot(propLocal, rk)
        if (!entityNames.contains(formatClassName(entity))) entityNames(formatClassName(entity)) = entity
      }
    }
    val entities: Map[String, EntityDef] = entityNames.iterator.map { case (upper, camel) =>
      upper -> EntityDef(camel, attrsByEntity.get(upper).map(_.toVector).getOrElse(Vector.empty))
    }.toMap

    SchemaDict(version, ontNS, entities, types.toMap, classes, enumLabels.view.mapValues(_.toMap).toMap)
  }
}
