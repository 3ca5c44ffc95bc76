package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property tests per SURVEY.md §5 / FIXTURES.md §7.
  * Uses raw ScalaCheck Gen with deterministic seeded sampling (the
  * scalatest-plus bridge is not on the offline classpath).
  */
class CodecPropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def relErr(a: Float, b: Float): Double =
    if (a == 0f) math.abs(b.toDouble)
    else math.abs((a - b).toDouble) / math.abs(a.toDouble)

  test("encode∘decode ip round-trip per kind domain") {
    val cases: Gen[(Float, Int)] = Gen.oneOf(
      Gen.choose(0f, 1100f).map((_, 2)),        // pressure mb
      Gen.choose(0f, 1f).map((_, 1)),           // sigma
      Gen.choose(0f, 1f).map((_, 5)),           // hybrid
      Gen.choose(-500f, 80000f).map((_, 0)),    // metres asl
      Gen.choose(0f, 384f).map((_, 10)))        // hours
    samples(cases).foreach { case (v, k) =>
      val ip = IpCodec.encode(v, k)
      val (v2, k2) = IpCodec.decode(ip)
      assert(k2 == k, s"kind mismatch for ($v, $k) -> $ip -> ($v2, $k2)")
      // 6 significant digits positive, 4 negative
      assert(relErr(v, v2) < (if (v < 0) 5e-4 else 5e-6),
        s"value mismatch for ($v, $k) -> $ip -> $v2")
    }
  }

  test("RmnDate decode∘encode identity on the 5 s grid") {
    samples(Gen.choose(0L, 3_000_000_000L)).foreach { secs =>
      val t = (secs / 5) * 5 + RmnDate.EpochSeconds
      assert(RmnDate.toEpochSeconds(RmnDate.fromEpochSeconds(t)).contains(t))
    }
  }

  test("Etiket build∘parse identity on generated etikets") {
    val run = for {
      a <- Gen.oneOf("RGPEAIMWNC_".toSeq)
      b <- Gen.oneOf("0123456789RLHMEA_".toSeq)
    } yield s"$a$b"
    val wchar = Gen.oneOf(('A' to 'Z') ++ ('0' to '9') :+ '_')
    def wstr(n: Int) = Gen.listOfN(n, wchar).map(_.mkString)
    val gen = for {
      r <- run
      lbl <- Gen.oneOf(5, 6).flatMap(wstr)
      imp <- Gen.oneOf("N", "P", "X")
      ens <- Gen.oneOf(Gen.const(""), wstr(3))
    } yield (lbl, r, imp, ens)
    samples(gen).foreach { case (lbl, r, imp, ens) =>
      val parsed = Etiket.parse(Etiket.build(lbl, r, imp, ens))
      assert(parsed == Etiket.Parsed(lbl, r, imp, ens),
        s"etiket round-trip failed for ($lbl, $r, $imp, $ens)")
    }
  }

  test("CsvArray string round-trip on random dims") {
    val gen = for {
      ni <- Gen.choose(1, 8)
      nj <- Gen.choose(1, 8)
      vals <- Gen.listOfN(ni * nj, Gen.choose(-1000, 1000).map(_ / 2f))
    } yield (vals.toArray, ni, nj)
    samples(gen).foreach { case (flat, ni, nj) =>
      val (back, ni2, nj2) = CsvArrayCodec.parse(
        CsvArrayCodec.serialize(flat, ni, nj))
      assert(ni2 == ni && nj2 == nj && back.sameElements(flat))
    }
  }

  test("RmnDate consistency: datev - dateo = deet*npas seconds") {
    val gen = for {
      t <- Gen.choose(100_000_000L, 2_000_000_000L).map(s => (s / 5) * 5)
      deet <- Gen.oneOf(60L, 300L, 450L, 3600L)
      npas <- Gen.choose(0L, 500L)
    } yield (t, deet, npas)
    samples(gen).foreach { case (t, deet, npas) =>
      if (deet * npas % 5 == 0) {
        val datev = RmnDate.fromEpochSeconds(t + RmnDate.EpochSeconds)
        val dateo = RmnDate.dateoFromDatev(datev, deet, npas)
        val diff = RmnDate.toEpochSeconds(datev).get -
          RmnDate.toEpochSeconds(dateo).get
        assert(diff == deet * npas)
      }
    }
  }
}
