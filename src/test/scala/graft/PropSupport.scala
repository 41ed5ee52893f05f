package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal forAll over ScalaCheck Gens (scalatestplus isn't in the
  * offline artifact cache, so suites sample Gens directly with a fixed
  * seed for reproducibility).
  */
trait PropSupport {
  def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var produced = 0
    while (produced < n && i < n * 20) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); produced += 1
        case None    =>
      }
      seed = seed.next
      i += 1
    }
    require(produced >= n / 2, s"generator too sparse: $produced/$n")
  }

  def forAllN2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(f: (A, B) => Unit): Unit =
    forAllN(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
}
