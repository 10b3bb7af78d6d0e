package graft.sources

import graft.model.{Doc, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic IFC4 corpus generator (FIXTURES.md §3).
  *
  * Emits valid IFC4_ADD2_TC1 statements drawn from the constructs the golden
  * corpus pins (entity refs, enums, typed-literal wrappers, literal/entity
  * lists, list-of-list, wrapper runs) so every line links successfully.
  * Generation is distributed (`spark.range` + per-doc seeded RNG — no
  * driver-side materialization) and reproducible: doc k of (seed, nDocs,
  * linesPerDoc, skew) is always identical.
  *
  * skew=true puts ~1% of docs in a mega-document regime (50× lines),
  * mirroring the reference's 64,686-line office model and exercising the
  * salted (doc_id, local_id) join + AQE skew handling.
  */
object SynthCorpus {

  val BaseURI = "http://example.org/synth/"

  def docs(spark: SparkSession, nDocs: Int, linesPerDoc: Int,
           skew: Boolean = false, seed: Long = 42L): Dataset[Doc] = {
    import spark.implicits._
    val lpd = linesPerDoc
    val sk = skew
    val sd = seed
    // 4 waves of tasks per core: lets the scheduler balance uneven doc costs
    val slices = math.max(spark.sparkContext.defaultParallelism * 4, 64)
    spark.range(0, nDocs, 1, slices).map { i => genDoc(i, lpd, sk, sd) }
  }

  def genDoc(i: Long, linesPerDoc: Int, skew: Boolean, seed: Long): Doc = {
    val rnd = new java.util.Random(seed * 1000003L + i)
    val mega = skew && (rnd.nextInt(100) == 0)
    val nLines = if (mega) linesPerDoc * 50 else math.max(8, linesPerDoc)
    val sb = new StringBuilder
    sb.append("ISO-10303-21;\nHEADER;\nFILE_DESCRIPTION($,'2;1');\n")
    sb.append(s"FILE_NAME('synth_$i.ifc','2026-01-01T00:00:00',(''),(''),'graft','','');\n")
    sb.append("FILE_SCHEMA(('IFC4'));\nENDSEC;\nDATA;\n")

    var id = 0L
    def next(): Long = { id += 1; id }
    val orgs = ArrayBuffer[Long]()
    val units = ArrayBuffer[Long]()
    val points = ArrayBuffer[Long]()

    // seed pool every doc can reference
    val o0 = next(); orgs += o0
    sb.append(s"#$o0= IFCORGANIZATION($$,'Org $o0',$$,$$,$$);\n")
    val u0 = next(); units += u0
    sb.append(s"#$u0= IFCSIUNIT(*,.LENGTHUNIT.,$$,.METRE.);\n")
    (0 until 4).foreach { _ =>
      val p = next(); points += p
      sb.append(s"#$p= IFCCARTESIANPOINT((${num(rnd)},${num(rnd)},${num(rnd)}));\n")
    }

    while (id < nLines) {
      val n = next()
      rnd.nextInt(12) match {
        case 0 =>
          orgs += n
          sb.append(s"#$n= IFCORGANIZATION('id$n','Org $n','desc ${rnd.nextInt(1000)}',$$,$$);\n")
        case 1 =>
          sb.append(s"#$n= IFCAPPLICATION(#${pick(rnd, orgs)},'v${rnd.nextInt(9)}','App $n','app$n');\n")
        case 2 =>
          units += n
          val ut = if (rnd.nextBoolean()) ".AREAUNIT.,$,.SQUARE_METRE." else ".LENGTHUNIT.,.MILLI.,.METRE."
          sb.append(s"#$n= IFCSIUNIT(*,$ut);\n")
        case 3 =>
          points += n
          sb.append(s"#$n= IFCCARTESIANPOINT((${num(rnd)},${num(rnd)}));\n")
        case 4 =>
          sb.append(s"#$n= IFCMEASUREWITHUNIT(IFCLENGTHMEASURE(${num(rnd)}),#${pick(rnd, units)});\n")
        case 5 =>
          sb.append(s"#$n= IFCUNITASSIGNMENT((${units.takeRight(3).map("#" + _).mkString(",")}));\n")
        case 6 =>
          val ps = (0 until 4).map(_ => "#" + pick(rnd, points)).mkString(",")
          sb.append(s"#$n= IFCBSPLINECURVEWITHKNOTS($$,($ps),$$,$$,$$,$$,$$,$$);\n")
        case 7 =>
          sb.append(s"#$n= IFCCARTESIANPOINTLIST3D(((${num(rnd)},${num(rnd)},${num(rnd)}),(${num(rnd)},${num(rnd)},${num(rnd)})));\n")
        case 8 =>
          sb.append(s"#$n= IFCINDEXEDPOLYCURVE(#${pick(rnd, points)},(IFCLINEINDEX((1,2)),IFCARCINDEX((2,3,${2 + rnd.nextInt(7)}))),.F.);\n")
        case 9 =>
          sb.append(s"#$n= IFCSITE($$,$$,$$,$$,$$,$$,$$,$$,$$,(${rnd.nextInt(90)},${rnd.nextInt(60)},${rnd.nextInt(60)},${rnd.nextInt(999)}),(${rnd.nextInt(90)},${rnd.nextInt(60)},${rnd.nextInt(60)}),$$,$$,$$);\n")
        case 10 =>
          sb.append(s"#$n= IFCRECURRENCEPATTERN($$,$$,(${1 + rnd.nextInt(3)},${4 + rnd.nextInt(3)}),$$,$$,$$,$$,$$);\n")
        case _ =>
          sb.append(s"#$n= IFCPROPERTYSINGLEVALUE('P$n',$$,IFCPOSITIVELENGTHMEASURE(${num(rnd)}),$$);\n")
      }
    }
    sb.append("ENDSEC;\nEND-ISO-10303-21;\n")

    // pack into interleaved spans (~512-char text spans, media every 3rd)
    val text = sb.toString
    val spans = ArrayBuffer[Span]()
    var off = 0
    var k = 0
    text.grouped(512).zipWithIndex.foreach { case (c, j) =>
      spans += Span("text", c, "", off); off += 1
      if ((j + 1) % 3 == 0) { spans += Span("media", "", s"m:$i:$k", off); off += 1; k += 1 }
    }
    Doc(s"synth-$i", spans.toSeq)
  }

  private def num(rnd: java.util.Random): String =
    BigDecimal(rnd.nextDouble() * 1000 - 500).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  private def pick(rnd: java.util.Random, xs: ArrayBuffer[Long]): Long =
    xs(rnd.nextInt(xs.length))
}
