package graft.xml

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Raised when a document violates the input grammar — the engine's
  * equivalent of the reference's strict `ValueError` guards
  * (reference: file_flattener.py:78,100,103,136,142). */
final class XmlShapeException(msg: String) extends RuntimeException(msg)

/** Minimal immutable XML tree, parsed with the JDK's StAX reader (no
  * external deps, cheap enough to run per-record inside a flatMap).
  *
  * Tags are namespace-qualified as `{uri}local` so flattener logic can
  * match on fully-qualified names the way the reference's
  * ElementTree-based parsers do (reference: file_flattener.py:65,117).
  * `text` is the character data between an element's start tag and its
  * first child (null when no character event occurred — mirroring
  * ElementTree's `.text is None` for childless empty elements).
  */
object XmlTree {

  final case class Elem(tag: String, text: String, children: Vector[Elem]) {
    def find(qtag: String): Option[Elem] = children.find(_.tag == qtag)
  }

  /** Strip a `{uri}` prefix from a qualified tag. */
  def stripNs(tag: String, ns: String): String = tag.replace(ns, "")

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    // no DTD / external entity resolution: parser runs on untrusted data
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  def parse(xml: String): Elem = {
    val r = factory.createXMLStreamReader(new StringReader(xml))
    try {
      while (r.getEventType != XMLStreamConstants.START_ELEMENT && r.hasNext) r.next()
      if (r.getEventType != XMLStreamConstants.START_ELEMENT)
        throw new XmlShapeException("no root element")
      readElem(r)
    } finally r.close()
  }

  private def qname(r: XMLStreamReader): String = {
    val uri = r.getNamespaceURI
    if (uri == null || uri.isEmpty) r.getLocalName else s"{$uri}${r.getLocalName}"
  }

  /** Reader is positioned on START_ELEMENT; consumes through the matching
    * END_ELEMENT. Iterative depth handling via recursion (document depth
    * is bounded by input size; these docs are KB-scale). */
  private def readElem(r: XMLStreamReader): Elem = {
    val tag = qname(r)
    var text: StringBuilder = null
    var sawChild = false
    val children = new ArrayBuffer[Elem]()
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          sawChild = true
          children += readElem(r)
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (!sawChild) { // ElementTree .text = chars before first child only
            if (text == null) text = new StringBuilder
            text.append(r.getText)
          }
        case XMLStreamConstants.END_ELEMENT =>
          done = true
        case _ => ()
      }
    }
    Elem(tag, if (text == null) null else text.toString, children.toVector)
  }
}
