package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropSupport

/** Mirrors the reference's GTID-set semantics: multi-UUID sets compared by
  * containment, not lexicographically (test vectors shaped like
  * `planetscale_edge_database_test.go:653-655`).
  */
class VGtidSpec extends AnyFunSuite with PropSupport {

  private val a = "0d5afdd6-54a0-11eb-936d-0a8939501751"
  private val b = "e1e896df-54a0-11eb-a26c-0e8d6a9fbf6f"

  test("parse/serialize round-trip is canonical") {
    val s = s"MySQL56/$b:1-3,$a:1-2"
    val g = VGtid.parse(s)
    assert(g.serialize == s"MySQL56/$a:1-2,$b:1-3")
    assert(VGtid.parse(g.serialize) == g)
  }

  test("empty position parses and serializes to empty") {
    assert(VGtid.parse("") == VGtid.empty)
    assert(VGtid.empty.serialize == "")
  }

  test("atLeast is containment, not lexicographic") {
    val small = VGtid.parse(s"MySQL56/$a:1-5")
    val big = VGtid.parse(s"MySQL56/$a:1-9,$b:1-3")
    assert(big.atLeast(small))
    assert(!small.atLeast(big))
    assert(big.after(small))
    assert(!small.after(big))
    // lexicographically "$a:1-5" > "$a:1-10" but containment says otherwise
    val ten = VGtid.parse(s"MySQL56/$a:1-10")
    assert(ten.after(small))
  }

  test("positionEqual independent of input ordering and interval splits") {
    val g1 = VGtid.parse(s"MySQL56/$a:1-3:4-6")
    val g2 = VGtid.parse(s"MySQL56/$a:1-6")
    assert(g1.positionEqual(g2))
    assert(!g1.after(g2) && !g2.after(g1))
  }

  test("advance grows the set by one transaction") {
    val g = VGtid.parse(s"MySQL56/$a:1-4").advance(a, 5)
    assert(g.serialize == s"MySQL56/$a:1-5")
    val gap = VGtid.parse(s"MySQL56/$a:1-4").advance(a, 7)
    assert(gap.serialize == s"MySQL56/$a:1-4:7")
  }

  test("malformed inputs throw") {
    assertThrows[IllegalArgumentException](VGtid.parse("MariaDB/1-2-3"))
    assertThrows[IllegalArgumentException](VGtid.parse("MySQL56/nocolon"))
  }

  private val uuids = Gen.oneOf(a, b)
  private val genGtid: Gen[VGtid] = for {
    n <- Gen.choose(0, 3)
    entries <- Gen.listOfN(n, for {
      u <- uuids
      s <- Gen.choose(1L, 50L)
      len <- Gen.choose(0L, 20L)
    } yield (u, s, s + len))
  } yield entries.foldLeft(VGtid.empty) { case (g, (u, s, e)) =>
    g.union(VGtid(Map(u -> Vector((s, e)))))
  }

  test("law: union is an upper bound and atLeast is reflexive/transitive") {
    forAll(genGtid, genGtid, genGtid) { (x, y, z) =>
      val u = x.union(y)
      assert(u.atLeast(x) && u.atLeast(y))
      assert(x.atLeast(x))
      if (x.atLeast(y) && y.atLeast(z)) assert(x.atLeast(z))
    }
  }

  test("law: serialize/parse round-trip") {
    forAll(genGtid) { g => assert(VGtid.parse(g.serialize) == g) }
  }

  test("law: after is a strict partial order (irreflexive, asymmetric)") {
    forAll(genGtid, genGtid) { (x, y) =>
      assert(!x.after(x))
      if (x.after(y)) assert(!y.after(x))
    }
  }

  test("string-level guards: blank/malformed positions never after/equal " +
    "(database.go:617-652)") {
    val pos = s"MySQL56/$a:1-5"
    assert(!VGtid.positionAfter(pos, ""))
    assert(!VGtid.positionAfter("", pos))
    assert(!VGtid.positionAfter("", ""))
    assert(!VGtid.positionEqual("", ""))
    assert(!VGtid.positionEqual(pos, ""))
    assert(!VGtid.positionAfter("garbage:::", pos))
    assert(!VGtid.positionEqual(pos, "garbage:::"))
    assert(VGtid.positionAfter(s"MySQL56/$a:1-9", pos))
    assert(VGtid.positionEqual(pos, pos))
    // the set algebra keeps the mathematical view (documented divergence)
    assert(VGtid.empty.positionEqual(VGtid.empty))
  }

  test("rank is monotone along a single shard's advance") {
    val g0 = VGtid.parse(s"MySQL56/$a:1-4")
    val g1 = g0.advance(a, 5)
    assert(VGtid.rank(g1.serialize) > VGtid.rank(g0.serialize))
  }
}
