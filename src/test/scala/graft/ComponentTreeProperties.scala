package graft

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.VehicleComponentFlattener

/** Property tests (SURVEY §5.2): random component trees → flatten →
  * structural invariants. */
object ComponentTreeProperties extends Properties("VehicleComponentFlattener") {

  case class Node(code: String, children: List[Node])

  private def nodeGen(depth: Int, idGen: Iterator[Int]): Gen[Node] =
    for {
      nChildren <- if (depth <= 0) Gen.const(0) else Gen.choose(0, 3)
      children <- Gen.listOfN(nChildren, Gen.lzy(nodeGen(depth - 1, idGen)))
    } yield Node(s"C${idGen.next()}", children)

  private val treeGen: Gen[List[Node]] = for {
    n <- Gen.choose(1, 4)
    trees <- {
      val ids = Iterator.from(0)
      Gen.listOfN(n, nodeGen(3, ids))
    }
  } yield trees

  private def renderNode(n: Node): String = {
    val subs =
      if (n.children.isEmpty) ""
      else s"<NS1:subcomponentCollection>${n.children.map(renderNode).mkString}</NS1:subcomponentCollection>"
    s"<NS1:component><NS1:componentCode>${n.code}</NS1:componentCode>$subs</NS1:component>"
  }

  private def render(roots: List[Node]): String =
    "<NS1:vehicleComponent xmlns:NS1=\"http://www.uptake.com/bhp/1/vehicleComponent\">" +
      "<NS1:vehicleIdentifier>VP</NS1:vehicleIdentifier>" +
      s"<NS1:componentCollection>${roots.map(renderNode).mkString}</NS1:componentCollection>" +
      "</NS1:vehicleComponent>"

  private def countNodes(n: Node): Int = 1 + n.children.map(countNodes).sum

  private def edges(n: Node): List[(String, String)] =
    n.children.map(c => c.code -> n.code) ++ n.children.flatMap(edges)

  property("row count = node count; adjacency is lossless; root attrs everywhere") =
    forAll(treeGen) { roots =>
      val rows = VehicleComponentFlattener.flatten(render(roots))
      val wantEdges = roots.flatMap(edges).toMap
      val rootCodes = roots.map(_.code).toSet
      rows.length == roots.map(countNodes).sum &&
        rows.forall(_("vehicleIdentifier") == "VP") &&
        rows.forall { r =>
          val code = r("componentCode")
          if (rootCodes.contains(code)) r("parent_code") == null
          else r("parent_code") == wantEdges(code)
        }
    }
}
