package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.Glob

/** Glob→regex compiler properties (SURVEY.md §5.1): the compiled regex
  * must agree with hand-evaluated glob semantics, and literals must
  * match only themselves even when they contain regex metacharacters.
  */
class GlobSpec extends AnyFunSuite with PropSupport {

  private val genLiteral = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('.', '-', '_', '+', '(', ')', '$', '^', '|')))
    .map(_.mkString).suchThat(_.length <= 20)

  test("a literal (incl. regex metachars) matches exactly itself") {
    forAllN(genLiteral) { s =>
      assert(Glob.matches(s, s))
      assert(!Glob.matches(s, s + "x"))
      if (s.nonEmpty) assert(!Glob.matches(s, s.tail))
    }
  }

  test("* matches any string, ? exactly one char") {
    forAllN(genLiteral) { s =>
      assert(Glob.matches("*", s))
      assert(Glob.matches(s + "*", s))
      assert(Glob.matches("*" + s, s))
      assert(Glob.matches("?" * s.length, s) === true)
      assert(!Glob.matches("?" + s, s.take(0)))
    }
  }

  test("alternation and classes") {
    assert(Glob.matches("{a,b}c", "ac"))
    assert(Glob.matches("{a,b}c", "bc"))
    assert(!Glob.matches("{a,b}c", "cc"))
    assert(Glob.matches("*.{parquet,csv}", "x/y/z.parquet"))
    assert(Glob.matches("*.{parquet,csv}", "data.csv"))
    assert(!Glob.matches("*.{parquet,csv}", "data.json"))
    assert(Glob.matches("file[0-9].txt", "file7.txt"))
    assert(!Glob.matches("file[0-9].txt", "fileX.txt"))
    assert(Glob.matches("file[^0-9].txt", "fileX.txt"))
    assert(!Glob.matches("file[^0-9].txt", "file7.txt"))
    assert(Glob.matches("a?c", "abc"))
    assert(!Glob.matches("a?c", "ac"))
  }

  test("glob regex is Java-regex valid for arbitrary globs") {
    val genGlob = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("*"), Gen.const("?"),
      Gen.const("[ab]"), Gen.const("{x,y}"), Gen.const("."), Gen.const("/")))
      .map(_.mkString)
    forAllN(genGlob) { g =>
      java.util.regex.Pattern.compile(Glob.toRegex(g)) // must not throw
    }
  }
}
