package graft

import org.scalatest.funsuite.AnyFunSuite

/** Close-out consistency gate (VERDICT r13 task #4): round 13 shipped a
  * SCALE.md note stamping graph_triangles "settled at 1.52 s" alongside
  * a committed artifact showing 5.12 s — an adjudication that did not
  * bind to the number of record. This gate makes that impossible to
  * repeat silently: every per-query cost stamped "settled" must be
  * registered in `settled_claims.json`, and the committed full-sweep
  * artifact it names must reproduce each claim within 2x. A claim the
  * artifact contradicts is, by definition, not settled — re-run until
  * the artifact shows the claim, or don't stamp it. */
class CloseoutGateSpec extends AnyFunSuite {
  private def parseNumbers(json: String, section: String): Map[String, Double] = {
    // the tiny flat {"name": 1.23, ...} shapes these two files use —
    // no JSON library needed, mirroring Bench's budget reader
    val sec = {
      val i = json.indexOf("\"" + section + "\"")
      if (i < 0) return Map.empty
      val open = json.indexOf('{', i)
      var depth = 0; var end = -1; var k = open
      while (k < json.length && end < 0) {
        json(k) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) end = k
          case _ =>
        }
        k += 1
      }
      json.substring(open, end + 1)
    }
    """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
      .findAllMatchIn(sec).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")

  test("every settled SCALE.md claim is reproduced by the artifact of record within 2x") {
    val reg = read("settled_claims.json")
    val artifactRe = """"artifact"\s*:\s*"([^"]+)"""".r
    val artifactPath = artifactRe.findFirstMatchIn(reg).map(_.group(1))
      .getOrElse(fail("settled_claims.json must name its artifact of record"))
    val claims = parseNumbers(reg, "claims")
    assert(new java.io.File(artifactPath).isFile,
      s"artifact of record $artifactPath is not committed")
    val artifact = parseNumbers(read(artifactPath), "queries")
    val broken = claims.toSeq.flatMap { case (q, claimed) =>
      artifact.get(q) match {
        case None => Some(s"$q: claimed ${claimed}s but absent from $artifactPath")
        case Some(actual) if actual > 2 * claimed || actual < claimed / 2 =>
          Some(f"$q: claimed $claimed%.2f s, artifact shows $actual%.2f s " +
            f"(x${actual / claimed}%.2f)")
        case _ => None
      }
    }
    assert(broken.isEmpty,
      "settled claims contradicted by the committed artifact of record — " +
        s"re-run the sweep or un-stamp the claim:\n${broken.mkString("\n")}")
  }

  test("every settled claim names a real query") {
    val claims = parseNumbers(read("settled_claims.json"), "claims")
    val unknown = claims.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"settled claims for unknown queries: $unknown")
  }
}
