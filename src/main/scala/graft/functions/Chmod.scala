package graft.functions

/** Symbolic chmod expression parser/applier.
  *
  * Re-expresses the reference's chmod-expression semantics (hadoop-tools
  * carries a symbolic-chmod parser with QuickCheck round-trip tests;
  * checkout empty — SURVEY.md §0 — so semantics follow POSIX chmod(1)):
  *
  *   expr   := clause (',' clause)*
  *   clause := [ugoa]* op perms (op perms)*
  *   op     := '+' | '-' | '='
  *   perms  := [rwxXst]*
  *
  * Modes are 12-bit (setuid/setgid/sticky + rwxrwxrwx). `X` grants
  * execute only when the target is a directory or already has any
  * execute bit. Empty who-list means `a` (no umask modeling).
  */
object Chmod {
  sealed trait Op
  case object Add extends Op
  case object Del extends Op
  case object Set extends Op

  /** One action: who-mask ∈ subset of "ugoa", operator, permission set. */
  final case class Clause(whos: Seq[Char], actions: Seq[(Op, Seq[Char])])

  def parse(expr: String): Either[String, Seq[Clause]] = {
    if (expr.isEmpty) return Left("empty expression")
    val clauses = expr.split(",", -1)
    val out = Seq.newBuilder[Clause]
    for (c <- clauses) {
      if (c.isEmpty) return Left(s"empty clause in '$expr'")
      var i = 0
      val whos = Seq.newBuilder[Char]
      while (i < c.length && "ugoa".indexOf(c.charAt(i)) >= 0) {
        whos += c.charAt(i); i += 1
      }
      if (i >= c.length) return Left(s"clause '$c' has no operator")
      val actions = Seq.newBuilder[(Op, Seq[Char])]
      while (i < c.length) {
        val op = c.charAt(i) match {
          case '+' => Add
          case '-' => Del
          case '=' => Set
          case ch  => return Left(s"bad operator '$ch' in '$c'")
        }
        i += 1
        val perms = Seq.newBuilder[Char]
        while (i < c.length && "rwxXst".indexOf(c.charAt(i)) >= 0) {
          perms += c.charAt(i); i += 1
        }
        if (i < c.length && "+-=".indexOf(c.charAt(i)) < 0)
          return Left(s"bad permission '${c.charAt(i)}' in '$c'")
        actions += ((op, perms.result()))
      }
      out += Clause(whos.result(), actions.result())
    }
    Right(out.result())
  }

  /** Render a parsed expression back to its canonical string. */
  def format(clauses: Seq[Clause]): String =
    clauses.map { cl =>
      cl.whos.mkString + cl.actions.map { case (op, ps) =>
        (op match { case Add => "+"; case Del => "-"; case Set => "=" }) + ps.mkString
      }.mkString
    }.mkString(",")

  /** Per-who bit triples (r,w,x) shifted into the 9-bit block. */
  private def whoShift(w: Char): Int = w match {
    case 'u' => 6
    case 'g' => 3
    case 'o' => 0
  }

  /** Apply a parsed expression to a 12-bit mode. */
  def apply(clauses: Seq[Clause], mode: Int, isDir: Boolean): Int = {
    var m = mode & 0xFFF
    for (cl <- clauses) {
      val whos = if (cl.whos.isEmpty || cl.whos.contains('a')) Seq('u', 'g', 'o')
                 else cl.whos.distinct
      for ((op, perms) <- cl.actions) {
        val anyX = (m & 0x49) != 0 // any of the three x bits (0o111)
        for (w <- whos) {
          val sh = whoShift(w)
          var bits = 0
          var special = 0
          for (p <- perms) p match {
            case 'r' => bits |= 4
            case 'w' => bits |= 2
            case 'x' => bits |= 1
            case 'X' => if (isDir || anyX) bits |= 1
            case 's' => if (w == 'u') special |= 0x800 else if (w == 'g') special |= 0x400
            case 't' => if (w == 'o') special |= 0x200
          }
          val block = bits << sh
          op match {
            case Add => m |= block | special
            case Del => m &= ~(block | special)
            case Set =>
              val specialMask = w match {
                case 'u' => 0x800
                case 'g' => 0x400
                case 'o' => 0x200
              }
              m = (m & ~((7 << sh) | specialMask)) | block | special
          }
        }
      }
    }
    m
  }

  /** Parse + apply in one step; Left on parse error. */
  def applyExpr(expr: String, mode: Int, isDir: Boolean = false): Either[String, Int] =
    parse(expr).map(apply(_, mode, isDir))

  /** Octal string of a 12-bit mode, zero-padded to 4 digits. */
  def toOctal(mode: Int): String = f"${Integer.toOctalString(mode & 0xFFF).toInt}%04d"
}
