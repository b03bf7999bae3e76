package graft.rdf

import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.{Element, Node => DomNode}
import scala.collection.mutable

/** RDF/XML reader (subset): rdf:Description and typed node elements,
  * rdf:about/rdf:ID/rdf:nodeID subjects, property elements with
  * rdf:resource, nested node elements, plain/typed/lang literals,
  * rdf:datatype / xml:lang, and rdf:parseType="Resource"/"Literal"/
  * "Collection" (collections expand to rdf:first/rdf:rest/rdf:nil cells).
  * (Containers rdf:Bag/Seq/Alt parse as plain typed nodes.)
  *
  * Reference: the RIO RDF/XML parser
  * (/root/reference/bigdata-rdf/src/java/com/bigdata/rdf/rio/rdfxml/).
  * Parallelism is per file (wholeTextFiles), like the Turtle reader; the
  * XML itself parses with the JDK's DOM parser — no added dependencies.
  */
object RdfXml {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val rowSchema = StructType(Seq(
    StructField("s", Term.schema), StructField("p", Term.schema),
    StructField("o", Term.schema), StructField("c", Term.schema)))

  def read(spark: SparkSession, path: String, base: String = ""): DataFrame = {
    val rdd = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseDoc(content, base) }
      .map { case (s, p, o) => Row(s, p, o, null) }
    spark.createDataFrame(rdd, rowSchema)
  }

  private def iriRow(lex: String) = Row(0.toByte, lex, null, null, null)
  private def bnodeRow(label: String) = Row(1.toByte, label, null, null, null)

  private def litRow(lex: String, dt: String, lang: String) = {
    val num = Term.litNumSlot(lex, dt)
    val lex2 =
      if (num != null && Term.numericDatatypes(dt)) Term.canonicalNumLex(lex)
      else lex
    Row(2.toByte, lex2, if (dt == null && lang == null) Term.XsdString else dt,
        if (lang == null) null else lang.toLowerCase, num)
  }

  def parseDoc(content: String, docBase: String = ""): Seq[(Row, Row, Row)] = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(content.getBytes("UTF-8")))
    val out = mutable.ArrayBuffer.empty[(Row, Row, Row)]
    var bnodeCounter = 0
    def freshBnode(): Row = { bnodeCounter += 1; bnodeRow(s"genid$bnodeCounter") }

    def childElements(e: Element): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item)
        .collect { case el: Element => el }
    }

    def rdfAttr(e: Element, local: String): Option[String] =
      Option(e.getAttributeNS(RdfNs, local)).filter(_.nonEmpty)

    /** Present-or-absent attribute: rdf:about="" / rdf:resource="" are
      * legal and resolve to the base URI itself. */
    def rdfAttrRaw(e: Element, local: String): Option[String] =
      if (e.hasAttributeNS(RdfNs, local)) Some(e.getAttributeNS(RdfNs, local))
      else None

    def xmlLang(e: Element): Option[String] =
      Option(e.getAttributeNS("http://www.w3.org/XML/1998/namespace", "lang"))
        .filter(_.nonEmpty)

    /** The in-scope base for an element: xml:base overrides the inherited
      * base for its subtree (RDF/XML §5.1.1). */
    def scopedBase(e: Element, inherited: String): String =
      Option(e.getAttributeNS("http://www.w3.org/XML/1998/namespace", "base"))
        .filter(_.nonEmpty)
        .map(b => Iri.resolve(b, inherited))
        .getOrElse(inherited)

    /** Parse a node element (rdf:Description or a typed node); returns its
      * subject term.
      */
    def nodeElement(e: Element, baseLang: Option[String], base0: String): Row = {
      val base = scopedBase(e, base0)
      val subj = rdfAttrRaw(e, "about").map(a => iriRow(Iri.resolve(a, base)))
        .orElse(rdfAttr(e, "ID").map(id => iriRow(Iri.resolve("#" + id, base))))
        .orElse(rdfAttr(e, "nodeID").map(bnodeRow))
        .getOrElse(freshBnode())
      val lang = xmlLang(e).orElse(baseLang)
      // typed node element: the element name is an rdf:type
      if (!(e.getNamespaceURI == RdfNs && e.getLocalName == "Description"))
        out += ((subj, iriRow(RdfNs + "type"),
                 iriRow(e.getNamespaceURI + e.getLocalName)))
      childElements(e).foreach(pe => propertyElement(subj, pe, lang, base))
      subj
    }

    def propertyElement(subj: Row, pe: Element, baseLang: Option[String],
                        base0: String): Unit = {
      val base = scopedBase(pe, base0)
      val pred = iriRow(pe.getNamespaceURI + pe.getLocalName)
      val lang = xmlLang(pe).orElse(baseLang)
      val resource = rdfAttrRaw(pe, "resource").map(Iri.resolve(_, base))
      val nodeId = rdfAttr(pe, "nodeID")
      val datatype = rdfAttr(pe, "datatype").map(Iri.resolve(_, base))
      val parseType = rdfAttr(pe, "parseType")
      val kids = childElements(pe)
      if (parseType.contains("Collection")) {
        // each child node element is a list item; cells chain first/rest
        val items = kids.map(k => nodeElement(k, lang, base))
        if (items.isEmpty) out += ((subj, pred, iriRow(RdfNs + "nil")))
        else {
          val cells = items.map(_ => freshBnode())
          out += ((subj, pred, cells.head))
          cells.lazyZip(items).lazyZip(cells.indices).foreach { (cell, item, idx) =>
            out += ((cell, iriRow(RdfNs + "first"), item))
            val rest = if (idx == items.size - 1) iriRow(RdfNs + "nil")
                       else cells(idx + 1)
            out += ((cell, iriRow(RdfNs + "rest"), rest))
          }
        }
      } else if (parseType.contains("Resource")) {
        // implicit blank node subject carrying the nested property elements
        val node = freshBnode()
        out += ((subj, pred, node))
        kids.foreach(k => propertyElement(node, k, lang, base))
      } else if (parseType.contains("Literal")) {
        // XML content as an rdf:XMLLiteral (serialized text content)
        out += ((subj, pred, litRow(pe.getTextContent, RdfNs + "XMLLiteral", null)))
      } else if (resource.isDefined) out += ((subj, pred, iriRow(resource.get)))
      else if (nodeId.isDefined) out += ((subj, pred, bnodeRow(nodeId.get)))
      else if (kids.nonEmpty) {
        // nested node element object
        val obj = nodeElement(kids.head, lang, base)
        out += ((subj, pred, obj))
      } else {
        val text = pe.getTextContent
        out += ((subj, pred, litRow(text, datatype.orNull,
                                    if (datatype.isDefined) null else lang.orNull)))
      }
    }

    val root = doc.getDocumentElement
    if (root.getNamespaceURI == RdfNs && root.getLocalName == "RDF")
      childElements(root).foreach(e => nodeElement(e, xmlLang(root), scopedBase(root, docBase)))
    else nodeElement(root, None, scopedBase(root, docBase))
    out.toSeq
  }
}
