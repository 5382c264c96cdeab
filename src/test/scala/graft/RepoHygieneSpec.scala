package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Repository hygiene tripwires.
  *
  * Raw control bytes in a .scala source make `grep`/`diff` classify the
  * whole file as binary (`Binary file matches`), which silently hides it
  * from every text-tool sweep — including external audit greps. Round 7
  * shipped three literal NUL bytes inside string literals in
  * EventOps.scala (streaming sentinel keys); they are now written as
  * backslash-u0000 escapes. This spec keeps it that way for every source file.
  */
class RepoHygieneSpec extends AnyFunSuite {

  private def scalaSources(root: String): Seq[Path] = {
    val base = Paths.get(root)
    if (!Files.isDirectory(base)) Seq.empty
    else Files.walk(base).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  test("no raw control bytes in any .scala source (text-tool safety)") {
    val offenders = (scalaSources("src/main") ++ scalaSources("src/test"))
      .flatMap { p =>
        val bytes = Files.readAllBytes(p)
        // allowed control bytes in a text file: \n, \r, \t
        val bad = bytes.zipWithIndex.collect {
          case (b, i) if (b & 0xff) < 0x20 && b != '\n' && b != '\r' && b != '\t' =>
            s"$p@$i=0x${"%02x".format(b)}"
        }
        bad.take(3)
      }
    assert(offenders.isEmpty,
      s"raw control bytes found (write them as \\uXXXX escapes): " +
        offenders.mkString(", "))
  }
}
