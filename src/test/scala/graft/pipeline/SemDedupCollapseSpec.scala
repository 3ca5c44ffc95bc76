package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** p42's exact-vector class collapse rests on a semantic claim: the
  * min-id-rep pair join composed back through member→rep produces
  * EXACTLY the member-level pair join's output (because identical
  * vectors share every cosine, a member's min partner is always the
  * partner class's rep). This spec pins that equivalence on a
  * fixture with planted exact-dup classes and colinear (cos≈1 but
  * distinct) vectors, by running the production query against a
  * member-level reference implementation of the ORIGINAL algorithm.
  */
class SemDedupCollapseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("rep-level pair join == member-level pair join, exact dups planted") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semdedup_eq").toString

    // 40 vectors, 4-dim: ids 12/17/23 share one vector (one exact
    // class spanning non-adjacent ids), 30/31 share another, 25 is
    // colinear with 14 (cos = 1 but a DISTINCT vector → stays its
    // own rep, must still collapse via the cosine threshold), the
    // rest are generic distinct points. Seeds are ids 0-7 (k = 8).
    def base(i: Int): Seq[Float] =
      Seq((i % 5).toFloat, ((i * 3) % 7).toFloat,
        ((i * 5) % 11).toFloat, 1.0f)
    val vecs = (0 until 40).map { i =>
      val v =
        if (i == 17 || i == 23) base(12)
        else if (i == 31) base(30)
        else if (i == 25) base(14).map(x => x * 1.0001f)
        else base(i)
      (i.toLong, v)
    }
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = graft.SparkEntry.queries("p42_semantic_dedup")(spark, dir)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))

    // member-level reference: the pre-collapse algorithm, verbatim
    val basedf = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val near = basedf.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        x => (x + lit(0.01f)).cast("float")).as("embedding"))
    val e = basedf.unionByName(near)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"), col("v").as("c"))
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("dist", aggregate(
        zip_with(col("v"), col("c"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"))
      .join(e, Seq("vec_id"))
      .withColumn("nrm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
    val a = assigned.select(col("cluster"), col("vec_id").as("a"),
      col("v").as("va"), col("nrm").as("na_"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b"),
      col("v").as("vb"), col("nrm").as("nb_"))
    val dups = a.join(b, Seq("cluster")).filter(col("a") < col("b"))
      .withColumn("cos", aggregate(
        zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (p, x) => p + x) / (col("na_") * col("nb_")))
      .filter(col("cos") >= 0.99)
      .groupBy(col("b").as("vec_id")).agg(min("a").as("dup_of"))
    val want = assigned.select("vec_id", "cluster")
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dup_of"), col("vec_id")).as("canonical_id"),
        col("dup_of").isNull.as("kept"))
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))

    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }

    // the planted structure actually exercised the interesting paths:
    val byId = got.map(t => t._1 -> t).toMap
    assert(!byId(17L)._4 && byId(17L)._3 == 12L) // exact class member
    assert(!byId(23L)._4 && byId(23L)._3 == 12L)
    assert(!byId(31L)._4 && byId(31L)._3 == 30L)
    assert(!byId(25L)._4 && byId(25L)._3 == 14L) // colinear distinct rep
  }
}
