package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query carries a DuckDB
  * oracle (no silent fallback to the weaker rows-only check), and no
  * oracle is orphaned.
  */
class ContractSpec extends AnyFunSuite {

  test("every declared query has an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${o -- q}")
  }

  test("query names are driver-safe") {
    // parquet-directory + JSON-key safe, stable sort order
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), n)
    }
  }
}

/** Testdata schema contract: the driver regenerates the parquet tables
  * between rounds and has already shipped `events.ts` as three
  * different physical types (TIMESTAMP(NANOS) → raw long,
  * isAdjustedToUTC=false µs → TIMESTAMP_NTZ, adjusted-to-UTC µs →
  * TIMESTAMP). Round 4 lost q16–q19 to exactly such a drift. This spec
  * loads every table through `Tables` (so normalization applies) at
  * every present sf dir and type-checks each column the queries rely
  * on — the next regen fails HERE, loudly, in one place.
  */
class SchemaContractSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.{DataFrame, SparkSession}

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // wall-clock timestamp columns: compare/sort/trunc semantics are
  // identical for TIMESTAMP and TIMESTAMP_NTZ under a UTC session, so
  // both are acceptable AT READ; anything else (string, long, date)
  // would silently change query results and must fail here.
  private val eitherTs: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val expected: Seq[(String, (SparkSession, String) => DataFrame,
      Map[String, Set[DataType]])] = {
    def t(f: (SparkSession, String) => DataFrame) = f
    Seq(
      ("region", t(graft.queries.Tables.region),
        Map("r_regionkey" -> Set[DataType](IntegerType, LongType),
            "r_name" -> Set[DataType](StringType))),
      ("nation", t(graft.queries.Tables.nation),
        Map("n_nationkey" -> Set[DataType](IntegerType, LongType),
            "n_regionkey" -> Set[DataType](IntegerType, LongType),
            "n_name" -> Set[DataType](StringType))),
      ("customer", t(graft.queries.Tables.customer),
        Map("c_custkey" -> Set[DataType](LongType),
            "c_nationkey" -> Set[DataType](IntegerType, LongType),
            "c_acctbal" -> Set[DataType](DoubleType),
            "c_name" -> Set[DataType](StringType))),
      ("supplier", t(graft.queries.Tables.supplier),
        Map("s_suppkey" -> Set[DataType](LongType),
            "s_nationkey" -> Set[DataType](IntegerType, LongType),
            "s_acctbal" -> Set[DataType](DoubleType))),
      ("part", t(graft.queries.Tables.part),
        Map("p_partkey" -> Set[DataType](LongType),
            "p_retailprice" -> Set[DataType](DoubleType),
            "p_brand" -> Set[DataType](StringType),
            "p_size" -> Set[DataType](IntegerType, LongType))),
      ("orders", t(graft.queries.Tables.orders),
        Map("o_orderkey" -> Set[DataType](LongType),
            "o_custkey" -> Set[DataType](LongType),
            "o_totalprice" -> Set[DataType](DoubleType),
            "o_orderdate" -> eitherTs,
            "o_orderpriority" -> Set[DataType](StringType))),
      ("lineitem", t(graft.queries.Tables.lineitem),
        Map("l_orderkey" -> Set[DataType](LongType),
            "l_linenumber" -> Set[DataType](IntegerType, LongType),
            "l_quantity" -> Set[DataType](DoubleType),
            "l_extendedprice" -> Set[DataType](DoubleType),
            "l_discount" -> Set[DataType](DoubleType),
            "l_tax" -> Set[DataType](DoubleType),
            "l_returnflag" -> Set[DataType](StringType),
            "l_linestatus" -> Set[DataType](StringType),
            "l_shipdate" -> eitherTs)),
      // events goes through the normalizer: whatever physical type the
      // driver ships, downstream queries must see plain TIMESTAMP so
      // unix_micros/unix_timestamp stay analyzable (round-4 break).
      ("events", t(graft.queries.Tables.events),
        Map("event_id" -> Set[DataType](LongType),
            "ts" -> Set[DataType](TimestampType),
            "user_id" -> Set[DataType](LongType),
            "event_type" -> Set[DataType](StringType),
            "value" -> Set[DataType](DoubleType))),
      ("documents", t(graft.queries.Tables.documents),
        Map("doc_id" -> Set[DataType](LongType),
            "text" -> Set[DataType](StringType),
            "lang" -> Set[DataType](StringType),
            "source" -> Set[DataType](StringType),
            "n_chars" -> Set[DataType](LongType))),
      ("embeddings", t(graft.queries.Tables.embeddings),
        Map("vec_id" -> Set[DataType](LongType),
            "embedding" -> Set[DataType](ArrayType(FloatType),
              ArrayType(FloatType, containsNull = false)),
            "label" -> Set[DataType](IntegerType, LongType)))
    )
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    val dir = s"/root/testdata/$sf"
    test(s"$sf table schemas match the query contract") {
      assume(new java.io.File(dir).exists())
      val problems = expected.flatMap { case (name, load, cols) =>
        val schema = load(spark, dir).schema
        cols.flatMap { case (col, ok) =>
          schema.fields.find(_.name == col) match {
            case None => Some(s"$name.$col: MISSING")
            case Some(f) if !ok(f.dataType) =>
              Some(s"$name.$col: ${f.dataType.simpleString} not in " +
                ok.map(_.simpleString).mkString("{", ",", "}"))
            case _ => None
          }
        }
      }
      assert(problems.isEmpty,
        "testdata drifted from the query contract:\n  " +
          problems.mkString("\n  "))
    }
  }
}
