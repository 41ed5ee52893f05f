package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.Chmod

/** Property tests for the symbolic-chmod kernel, mirroring the
  * reference's own QuickCheck approach (SURVEY.md §5.1).
  */
class ChmodSpec extends AnyFunSuite with PropSupport {

  private val genWho   = Gen.someOf("ugoa".toSeq).map(_.toSeq)
  private val genPerms = Gen.someOf("rwxst".toSeq).map(_.toSeq.sortBy("rwxXst".indexOf(_)))
  private val genOp    = Gen.oneOf[Chmod.Op](Chmod.Add, Chmod.Del, Chmod.Set)
  private val genClause = for {
    whos    <- genWho
    nAct    <- Gen.choose(1, 3)
    actions <- Gen.listOfN(nAct, Gen.zip(genOp, genPerms))
  } yield Chmod.Clause(whos.distinct, actions)
  private val genExpr = Gen.nonEmptyListOf(genClause).map(_.take(4))
  private val genMode = Gen.choose(0, 0xFFF)

  test("format . parse == id") {
    forAllN(genExpr) { clauses =>
      val s = Chmod.format(clauses)
      Chmod.parse(s) match {
        case Right(parsed) => assert(Chmod.format(parsed) === s)
        case Left(err)     => fail(s"'$s' failed to parse: $err")
      }
    }
  }

  test("apply is idempotent for single-clause exprs") {
    forAllN2(genClause, Gen.zip(genMode, Gen.oneOf(true, false)), 300) {
      case (cl, (mode, isDir)) =>
        val once  = Chmod.apply(Seq(cl), mode, isDir)
        val twice = Chmod.apply(Seq(cl), once, isDir)
        assert(twice === once)
    }
  }

  test("add then delete clears the added rwx bits") {
    forAllN(genMode) { mode =>
      val plus  = Chmod.applyExpr("a+rwx", mode).toOption.get
      assert((plus & 0x1FF) === 0x1FF)
      val minus = Chmod.applyExpr("a-rwx", plus).toOption.get
      assert((minus & 0x1FF) === 0)
    }
  }

  test("known POSIX examples") {
    def run(e: String, m: Int, dir: Boolean = false) = Chmod.applyExpr(e, m, dir).toOption.get
    assert(run("u+x", Integer.parseInt("644", 8)) === Integer.parseInt("744", 8))
    assert(run("go-r", Integer.parseInt("644", 8)) === Integer.parseInt("600", 8))
    assert(run("a=rx", Integer.parseInt("777", 8)) === Integer.parseInt("555", 8))
    assert(run("u=rw,g+x,o-rwx", Integer.parseInt("777", 8)) === Integer.parseInt("670", 8))
    assert(run("u=rw,g+x,o-rwx", Integer.parseInt("644", 8)) === Integer.parseInt("650", 8))
    // X: only when dir or some x bit already set
    assert(run("a+X", Integer.parseInt("644", 8)) === Integer.parseInt("644", 8))
    assert(run("a+X", Integer.parseInt("644", 8), dir = true) === Integer.parseInt("755", 8))
    assert(run("a+X", Integer.parseInt("744", 8)) === Integer.parseInt("755", 8))
    // setuid/setgid/sticky
    assert(run("u+s", Integer.parseInt("755", 8)) === Integer.parseInt("4755", 8))
    assert(run("g+s", Integer.parseInt("755", 8)) === Integer.parseInt("2755", 8))
    assert(run("o+t", Integer.parseInt("755", 8)) === Integer.parseInt("1755", 8))
  }

  test("parse rejects malformed expressions") {
    for (bad <- Seq("", "u", "u~r", "u+r,,g+w", "z+r", "u+q"))
      assert(Chmod.parse(bad).isLeft, s"'$bad' should not parse")
  }

  test("toOctal pads to 4 digits") {
    assert(Chmod.toOctal(Integer.parseInt("755", 8)) === "0755")
    assert(Chmod.toOctal(Integer.parseInt("4755", 8)) === "4755")
    assert(Chmod.toOctal(0) === "0000")
  }
}
