package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Golden-word fixtures for the library's two DECLARED external
  * boundaries — pinned as ignored-until-ported tests so the contract
  * a future bit-exact port must satisfy is executable documentation,
  * not prose.
  *
  * Status of the fixture search (round 7): the allowed retrieval
  * channel (PAPERS.md / SNIPPETS.md) contains NO librmn-produced
  * example values — no `cigaxg`/`cxgaig` IG-word worked examples, no
  * `armn_compress` bitstream dumps, nothing citing librmn at all —
  * and the reference repo delegates both to C binaries it does not
  * ship. Until a public golden value surfaces, these tests stay
  * `ignore`d with PLACEHOLDER payloads spelling out the shape a real
  * fixture takes; flipping one on requires only filling the arrays.
  */
class BoundaryFixturesSpec extends AnyFunSuite {

  /** Boundary 1: librmn IG-word quantization (`cigaxg`/`cxgaig`).
    *
    * The library's own `Grids.igEncode`/`igDecode`
    * (`Grids.scala:446`) is an exact inverse pair at documented
    * resolutions, but librmn's fixed-point packing for rotated (E)
    * and polar-stereographic (N/S) grids quantizes differently in
    * its C sources. A bit-exact port must, for each
    * (grtyp, xg1..xg4) row below, produce exactly (ig1..ig4) and
    * decode those words back to within the documented quantization
    * step of xg1..xg4.
    */
  ignore("cigaxg golden IG words round-trip bit-exactly") {
    // (grtyp, xg1, xg2, xg3, xg4, ig1, ig2, ig3, ig4) —
    // PLACEHOLDER: no public librmn-produced row available yet.
    // E-grid example shape: ("E", lat1, lon1, lat2, lon2, i1, i2, i3, i4)
    val golden: Seq[(String, Double, Double, Double, Double,
        Int, Int, Int, Int)] = Seq.empty
    assert(golden.nonEmpty, "fill with public librmn-produced rows")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").getOrCreate()
    import spark.implicits._
    val params = golden
      .map { case (gt, x1, x2, x3, x4, _, _, _, _) => (gt, x1, x2, x3, x4) }
      .toDF("grtyp", "a", "b", "c", "d")
      .select(col("grtyp"),
        col("a").as("lat1"), col("b").as("lon1"),
        col("c").as("lat2"), col("d").as("lon2"),
        col("a").as("lat0"), col("b").as("lon0"),
        col("c").as("dlat"), col("d").as("dlon"),
        col("a").as("pi"), col("b").as("pj"),
        col("c").as("d60"), col("d").as("dgrw"))
    val enc = graft.ops.Grids.igEncode(params)
      .select("ig1", "ig2", "ig3", "ig4")
      .as[(Int, Int, Int, Int)].collect().toSeq
    val want = golden.map { case (_, _, _, _, _, i1, i2, i3, i4) =>
      (i1, i2, i3, i4) }
    assert(enc == want)
  }

  /** Boundary 2: librmn `armn_compress` bitstream (turbopack datyps
    * 129/130/133/134).
    *
    * The library reads/writes its OWN magic-prefixed token codec
    * (`XdfFormat.compressTokens`/`decompressTokens`) and loudly
    * rejects foreign bitstreams. A bit-exact port must decode the
    * word stream below (one small librmn-compressed record: the
    * stored 32-bit words after the 20-word record header) to the
    * expected token array, through exactly the
    * `XdfFormat.decompressTokens` seam.
    */
  ignore("armn_compress golden record decodes bit-exactly") {
    // PLACEHOLDER: no public librmn-produced compressed record
    // available in the allowed channel yet
    val storedWords: Array[Int] = Array.empty
    val expectedTokens: Array[Int] = Array.empty
    assert(storedWords.nonEmpty && expectedTokens.nonEmpty,
      "fill with a public librmn-produced record")
  }
}
