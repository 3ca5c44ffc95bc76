package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spark-level scan tests for the fstrec source: file bin-packing and
  * row fidelity across many small files.
  */
class FstScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeSmallFiles(path: String, rows: Int,
                              perFile: Int): Unit = {
    import spark.implicits._
    val df = (1 to rows).toDF("i").select(
      lit("TT").as("nomvar"), lit("P").as("typvar"),
      lit("TEST").as("etiket"), lit(2).as("ni"), lit(2).as("nj"),
      lit(1).as("nk"), lit(442998800L).as("dateo"),
      col("i").as("ip1"), lit(0).as("ip2"), lit(0).as("ip3"),
      lit(0).as("deet"), lit(0).as("npas"), lit(5).as("datyp"),
      lit(32).as("nbits"), lit("X").as("grtyp"), lit(0).as("ig1"),
      lit(0).as("ig2"), lit(0).as("ig3"), lit(0).as("ig4"),
      lit(442998800L).as("datev"),
      array(col("i").cast("float"), lit(1f), lit(2f), lit(3f)).as("d"))
    graft.sources.fst.FstWriter.write(df, path,
      maxRecordsPerFile = perFile, cleanup = false)
  }

  test("many small files pack into few partitions, all rows read") {
    val path = "/tmp/graft_scan_spec_pack"
    writeSmallFiles(path, rows = 400, perFile = 8)
    val fileCount = new java.io.File(path).listFiles().count(_.isFile)
    assert(fileCount >= 50, s"expected many files, got $fileCount")
    val back = spark.read.format("fstrec").load(path)
    assert(back.count() == 400)
    val parts = back.rdd.getNumPartitions
    assert(parts < fileCount,
      s"expected packed partitions, got $parts for $fileCount files")
    // row fidelity: every ip1 exactly once, payload head matches ip1
    val ok = back.select(col("ip1"), element_at(col("d"), 1).as("h"))
      .filter(col("h") === col("ip1").cast("float"))
    assert(ok.count() == 400)
    assert(back.select("ip1").distinct().count() == 400)
  }

  test("one scan reads a directory mixing compact and XDF containers") {
    import graft.sources.fst.{FstFormat, XdfFormat}
    val path = "/tmp/graft_scan_spec_mixed"
    writeSmallFiles(path, rows = 3, perFile = 8) // compact container
    val m = FstFormat.Meta("XX", "P", "MIXED", 2, 1, 1, 0L, 777, 0, 9,
      0, 0, 2, 16, "X", 0, 0, 0, 0, 442998800L, 0, 0)
    java.nio.file.Files.write(
      new java.io.File(path, "real.fst").toPath,
      XdfFormat.writeFile(Seq((m, Array(41.0, 42.0)))))
    val back = spark.read.format("fstrec").load(path)
    assert(back.count() == 4)
    val xdfRow = back.filter(col("nomvar") === "XX")
      .select(element_at(col("d"), 2)).head().getFloat(0)
    assert(xdfRow == 42f)
  }

  test("update auto-recovers a file left aside by an interrupted run") {
    val path = "/tmp/graft_scan_spec_updrecover"
    writeSmallFiles(path, rows = 4, perFile = 8) // one record file
    val patched = spark.read.format("fstrec").load(path)
      .withColumn("etiket", lit("RECOVERED"))
      .persist()
    patched.count() // rows (incl path/key) cached before the "crash"
    // simulate the crash window between update()'s two publish
    // renames: the data file exists only as the hidden backup
    val dir = new java.io.File(path)
    val baks = dir.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")).map { f =>
        val bak = new java.io.File(dir, s".${f.getName}.updbak")
        assert(f.renameTo(bak))
        bak
      }
    assert(spark.read.format("fstrec").load(path).count() == 0)
    // a re-run restores every backup and applies the patch
    graft.sources.fst.FstWriter.update(patched)
    patched.unpersist()
    val back = spark.read.format("fstrec").load(path)
    assert(back.count() == 4)
    assert(back.filter(col("etiket") === "RECOVERED").count() == 4)
    assert(baks.forall(!_.exists()))
  }

  test("user-supplied read schema validates names and types early") {
    val path = "/tmp/graft_scan_spec_schema"
    writeSmallFiles(path, rows = 8, perFile = 8)
    // correct subset works
    val ok = spark.read
      .schema("nomvar STRING, ni INT").format("fstrec").load(path)
    assert(ok.count() == 8)
    // mistyped column fails at planning, not as a runtime cast error
    val e1 = intercept[Exception] {
      spark.read.schema("ni LONG").format("fstrec").load(path).count()
    }
    assert(e1.getMessage.contains("ni") ||
      Option(e1.getCause).exists(_.getMessage.contains("ni")))
    // unknown column is rejected by name
    val e2 = intercept[Exception] {
      spark.read.schema("bogus INT").format("fstrec").load(path).count()
    }
    assert(e2.getMessage.contains("bogus") ||
      Option(e2.getCause).exists(_.getMessage.contains("bogus")))
  }

  test("compaction rewrites many small files into few, verbatim") {
    val src = "/tmp/graft_scan_spec_compact_src"
    val dst = "/tmp/graft_scan_spec_compact_dst"
    writeSmallFiles(src, rows = 400, perFile = 8)
    graft.sources.fst.FstWriter.compact(spark, src, dst)
    val files = (d: String) =>
      new java.io.File(d).listFiles().count(_.isFile)
    assert(files(dst) < files(src) / 4,
      s"expected far fewer files, got ${files(dst)} vs ${files(src)}")
    val back = spark.read.format("fstrec").load(dst)
    assert(back.count() == 400)
    assert(back.select("ip1").distinct().count() == 400)
    val ok = back.select(col("ip1"), element_at(col("d"), 1).as("h"))
      .filter(col("h") === col("ip1").cast("float"))
    assert(ok.count() == 400)
    intercept[IllegalArgumentException] {
      graft.sources.fst.FstWriter.compact(spark, src, src)
    }
    // dst inside src would write into the tree being read
    intercept[IllegalArgumentException] {
      graft.sources.fst.FstWriter.compact(spark, src, s"$src/out")
    }
    // src inside dst is worse: overwrite mode would truncate dst —
    // recursively deleting the SOURCE — before the lazy scan runs
    intercept[IllegalArgumentException] {
      graft.sources.fst.FstWriter.compact(spark, src,
        new java.io.File(src).getParent)
    }
  }

  test("metadata-only projection still prunes payload reads") {
    val path = "/tmp/graft_scan_spec_meta"
    writeSmallFiles(path, rows = 64, perFile = 16)
    val back = spark.read.format("fstrec").load(path)
      .select("nomvar", "ip1")
    assert(back.count() == 64)
    assert(back.schema.fieldNames.toSeq == Seq("nomvar", "ip1"))
  }

  test("DSv2 write path: save/overwrite/append with task-file commit") {
    import spark.implicits._
    val path = "/tmp/graft_scan_spec_dsv2_write"
    def df(base: Int, n: Int) = (1 to n).toDF("i").select(
      lit("GZ").as("nomvar"), lit("P").as("typvar"),
      lit("DSV2").as("etiket"), lit(1).as("ni"), lit(2).as("nj"),
      lit(1).as("nk"), lit(442998800L).as("dateo"),
      (col("i") + base).as("ip1"), lit(0).as("ip2"), lit(0).as("ip3"),
      lit(0).as("deet"), lit(0).as("npas"), lit(5).as("datyp"),
      lit(32).as("nbits"), lit("X").as("grtyp"), lit(0).as("ig1"),
      lit(0).as("ig2"), lit(0).as("ig3"), lit(0).as("ig4"),
      lit(442998800L).as("datev"),
      array(col("i").cast("float"), lit(9f)).as("d"))
    df(0, 300).write.format("fstrec").mode("overwrite").save(path)
    assert(spark.read.format("fstrec").load(path).count() == 300)
    df(1000, 50).write.format("fstrec").mode("append").save(path)
    val back = spark.read.format("fstrec").load(path)
    assert(back.count() == 350)
    assert(back.filter(col("ip1") > 1000).count() == 50)
    // overwrite truncates
    df(0, 10).write.format("fstrec").mode("overwrite").save(path)
    assert(spark.read.format("fstrec").load(path).count() == 10)
    // commit renamed every temp file: no in-progress names remain
    // (Hadoop's .crc checksum sidecars are expected and scan-hidden)
    val names = new java.io.File(path).listFiles().map(_.getName)
    assert(names.forall(n => !n.contains(".inprogress")),
      names.mkString(", "))
    assert(names.count(n => !n.startsWith(".")) > 0)
    // missing columns fail with a named error
    val e = intercept[Exception] {
      Seq(1).toDF("i").write.format("fstrec").mode("append").save(path)
    }
    assert(e.getMessage.contains("nomvar") ||
      Option(e.getCause).exists(_.getMessage.contains("nomvar")))
  }

  test("streaming offsets round-trip through JSON, incl. odd paths") {
    import graft.sources.fst.FstOffset
    val cases = Seq(
      Nil,
      Seq("file:/tmp/a.fst"),
      Seq("file:/tmp/a.fst", "file:/tmp/b.fst"),
      Seq("""file:/tmp/we"ird","x.fst""", "file:/tmp/back\\slash.fst"))
    cases.foreach { files =>
      val off = FstOffset(files)
      assert(FstOffset.fromJson(off.json) == off, off.json)
    }
  }

  test("pushed filter drops records before payload decode") {
    val path = "/tmp/graft_scan_spec_filter"
    writeSmallFiles(path, rows = 100, perFile = 10)
    val back = spark.read.format("fstrec").load(path)
      .filter(col("ip1") <= 10)
    assert(back.count() == 10)
  }

  test("partitioned layout prunes directories and reads back whole") {
    import org.apache.spark.sql.sources.{EqualTo, Filter}
    import graft.sources.fst.{FstScanBuilder, FstScan, FstInputPartition}
    import spark.implicits._
    val path = "/tmp/graft_scan_spec_partitioned"
    val df = (1 to 90).toDF("i").select(
      element_at(array(lit("TT"), lit("UU"), lit("GZ")),
        pmod(col("i"), lit(3)).cast("int") + 1).as("nomvar"),
      lit("P").as("typvar"), lit("PART").as("etiket"),
      lit(1).as("ni"), lit(1).as("nj"), lit(1).as("nk"),
      lit(442998800L).as("dateo"), col("i").as("ip1"),
      lit(0).as("ip2"), lit(0).as("ip3"), lit(0).as("deet"),
      lit(0).as("npas"), lit(5).as("datyp"), lit(32).as("nbits"),
      lit("X").as("grtyp"), lit(0).as("ig1"), lit(0).as("ig2"),
      lit(0).as("ig3"), lit(0).as("ig4"), lit(442998800L).as("datev"),
      array(col("i").cast("float")).as("d"))
    graft.sources.fst.FstWriter.write(df, path, cleanup = false,
      partitionBy = Seq("nomvar"))
    // layout: one name=value directory per nomvar, records intact
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq == Seq("nomvar=GZ", "nomvar=TT", "nomvar=UU"))
    val back = spark.read.format("fstrec").load(path)
    assert(back.count() == 90)
    assert(back.filter(col("nomvar") === "TT").count() == 30)
    // pushed equality lists ONLY the matching directory branch
    def plannedFiles(filters: Array[Filter]): Seq[String] = {
      val b = new FstScanBuilder(Seq(path))
      b.pushFilters(filters)
      b.build().asInstanceOf[FstScan].planInputPartitions()
        .flatMap(_.asInstanceOf[FstInputPartition].files).toSeq
    }
    val pruned = plannedFiles(Array(EqualTo("nomvar", "TT")))
    assert(pruned.nonEmpty &&
      pruned.forall(_.contains("nomvar=TT")), pruned.mkString(", "))
    val all = plannedFiles(Array.empty)
    assert(all.exists(_.contains("nomvar=GZ")))
    // join-driven runtime filters prune identically (the DSv2
    // dynamic-pruning hook delivers them before partition planning)
    val b2 = new FstScanBuilder(Seq(path))
    val scan2 = b2.build().asInstanceOf[FstScan]
    scan2.filter(Array[Filter](EqualTo("nomvar", "UU")))
    val rt = scan2.planInputPartitions()
      .flatMap(_.asInstanceOf[FstInputPartition].files).toSeq
    assert(rt.nonEmpty && rt.forall(_.contains("nomvar=UU")),
      rt.mkString(", "))
  }

  test("multi-page xdf file splits into page-run slices, rows intact") {
    import graft.sources.fst.{FstScanBuilder, FstScan, FstInputPartition}
    import spark.implicits._
    val path = "/tmp/graft_scan_spec_pagesplit"
    val rows = 600 // 3 directory pages at 256 entries/page
    val df = (1 to rows).toDF("i").select(
      lit("TT").as("nomvar"), lit("P").as("typvar"),
      lit("TEST").as("etiket"), lit(2).as("ni"), lit(2).as("nj"),
      lit(1).as("nk"), lit(442998800L).as("dateo"),
      col("i").as("ip1"), lit(0).as("ip2"), lit(0).as("ip3"),
      lit(0).as("deet"), lit(0).as("npas"), lit(5).as("datyp"),
      lit(32).as("nbits"), lit("X").as("grtyp"), lit(0).as("ig1"),
      lit(0).as("ig2"), lit(0).as("ig3"), lit(0).as("ig4"),
      lit(442998800L).as("datev"),
      array(col("i").cast("float"), lit(1f), lit(2f), lit(3f)).as("d"))
    graft.sources.fst.FstWriter.write(df.coalesce(1), path,
      maxRecordsPerFile = rows, cleanup = false, container = "xdf")
    val dataFiles = new java.io.File(path).listFiles()
      .filter(f => f.isFile && !graft.sources.fst.FstScan.hidden(f.getName))
    assert(dataFiles.length == 1, dataFiles.mkString(", "))
    // plan: the single multi-page file must yield >1 partition (one
    // task per page run), not serialize on one core. The fixture is
    // tiny, so shrink the partition budget to make it "giant"
    // relative to target (at defaults a 60 KB file correctly stays
    // whole under the 4 MB open-cost floor).
    val len = dataFiles.head.length()
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.conf.set("spark.sql.files.maxPartitionBytes", s"${len / 3}")
    try {
      val parts = new FstScanBuilder(Seq(path)).build()
        .asInstanceOf[FstScan].planInputPartitions()
        .map(_.asInstanceOf[FstInputPartition])
      assert(parts.length > 1,
        s"expected page-run split, got ${parts.length}")
      val slices = parts.flatMap(_.slices)
      assert(slices.forall(!_.wholeFile), slices.mkString(", "))
      // page ranges tile [0, nPages) without overlap
      val ranges = slices.map(s => (s.unitStart, s.unitEnd)).sortBy(_._1)
      assert(ranges.head._1 == 0)
      ranges.sliding(2).foreach {
        case Array((_, e), (s2, _)) =>
          assert(e == s2, ranges.mkString(", "))
        case _ => ()
      }
      // every slice carries its start page's address so the task
      // seeks straight there instead of re-walking the page chain
      assert(slices.forall(_.startAddr != 0), slices.mkString(", "))
      // row fidelity THROUGH the split read path: every record once,
      // keys distinct, payloads intact
      val back = spark.read.format("fstrec").load(path)
      assert(back.rdd.getNumPartitions > 1)
      assert(back.count() == rows)
      assert(back.select("path", "key").distinct().count() == rows)
      assert(back.agg(sum(element_at(col("d"), 1))).as[Double].head() ==
        (1 to rows).map(_.toDouble).sum)
    } finally {
      spark.conf.unset("spark.sql.files.openCostInBytes")
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("oversized compact container splits into record-range slices, rows intact") {
    import graft.sources.fst.{FstScanBuilder, FstScan, FstInputPartition}
    import spark.implicits._
    val path = "/tmp/graft_scan_spec_recsplit"
    val rows = 500
    val df = (1 to rows).toDF("i").select(
      lit("TT").as("nomvar"), lit("P").as("typvar"),
      lit("TEST").as("etiket"), lit(2).as("ni"), lit(2).as("nj"),
      lit(1).as("nk"), lit(442998800L).as("dateo"),
      col("i").as("ip1"), lit(0).as("ip2"), lit(0).as("ip3"),
      lit(0).as("deet"), lit(0).as("npas"), lit(5).as("datyp"),
      lit(32).as("nbits"), lit("X").as("grtyp"), lit(0).as("ig1"),
      lit(0).as("ig2"), lit(0).as("ig3"), lit(0).as("ig4"),
      lit(442998800L).as("datev"),
      array(col("i").cast("float"), lit(1f), lit(2f), lit(3f)).as("d"))
    // default container = compact ("fstrec"): one flat directory
    // block, no pages — the split unit is the RECORD index
    graft.sources.fst.FstWriter.write(df.coalesce(1), path,
      maxRecordsPerFile = rows, cleanup = false)
    val dataFiles = new java.io.File(path).listFiles()
      .filter(f => f.isFile && !graft.sources.fst.FstScan.hidden(f.getName))
    assert(dataFiles.length == 1, dataFiles.mkString(", "))
    val len = dataFiles.head.length()
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.conf.set("spark.sql.files.maxPartitionBytes", s"${len / 4}")
    try {
      val parts = new FstScanBuilder(Seq(path)).build()
        .asInstanceOf[FstScan].planInputPartitions()
        .map(_.asInstanceOf[FstInputPartition])
      assert(parts.length > 1,
        s"expected record-range split, got ${parts.length}")
      val slices = parts.flatMap(_.slices)
      assert(slices.forall(!_.wholeFile), slices.mkString(", "))
      // record ranges tile [0, nrecs) without overlap
      val ranges = slices.map(s => (s.unitStart, s.unitEnd)).sortBy(_._1)
      assert(ranges.head._1 == 0)
      assert(ranges.last._2 == rows, ranges.mkString(", "))
      ranges.sliding(2).foreach {
        case Array((_, e), (s2, _)) =>
          assert(e == s2, ranges.mkString(", "))
        case _ => ()
      }
      // row fidelity THROUGH the split read path: every record once,
      // keys identical to a whole-file read, payloads intact
      val back = spark.read.format("fstrec").load(path)
      assert(back.rdd.getNumPartitions > 1)
      assert(back.count() == rows)
      assert(back.select("key").distinct().count() == rows)
      assert(back.agg(sum(element_at(col("d"), 1))).as[Double].head() ==
        (1 to rows).map(_.toDouble).sum)
      // keys are the global record handles, unchanged by slicing
      val keys = back.select("key").as[Int].collect().sorted
      assert(keys.toSeq == (0 until rows).map(_ << 10),
        s"keys not global record handles: ${keys.take(5).mkString(",")}")
    } finally {
      spark.conf.unset("spark.sql.files.openCostInBytes")
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("oversized non-FST file plans whole; reader raises the real error") {
    import graft.sources.fst.{FstScanBuilder, FstScan, FstInputPartition}
    val path = "/tmp/graft_scan_spec_garbage"
    new java.io.File(path).mkdirs()
    // random-ish bytes, no STDR magic: the split probe must return
    // "not splittable" (whole-file slice) and leave the real error
    // to the task-side reader, which has full context
    val f = new java.io.File(path, "junk.fst")
    val out = new java.io.FileOutputStream(f)
    try out.write(Array.tabulate[Byte](64 * 1024)(i => (i * 31 + 7).toByte))
    finally out.close()
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try {
      val parts = new FstScanBuilder(Seq(path)).build()
        .asInstanceOf[FstScan].planInputPartitions()
        .map(_.asInstanceOf[FstInputPartition])
      val slices = parts.flatMap(_.slices)
      assert(slices.length == 1 && slices.head.wholeFile,
        slices.mkString(", "))
      val err = intercept[org.apache.spark.SparkException] {
        spark.read.format("fstrec").load(path).count()
      }
      assert(err.getMessage.contains("STDR") ||
        Option(err.getCause).exists(_.getMessage.contains("STDR")),
        s"expected the magic-sniff error, got: ${err.getMessage}")
    } finally {
      spark.conf.unset("spark.sql.files.openCostInBytes")
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("scan statistics shrink under metadata-only projection") {
    import graft.sources.fst.{FstScanBuilder, FstScan}
    import org.apache.spark.sql.types.StructType
    val path = "/tmp/graft_scan_spec_stats"
    writeSmallFiles(path, rows = 200, perFile = 50)
    def stats(fields: Seq[String]): Long = {
      val b = new FstScanBuilder(Seq(path))
      b.pruneColumns(StructType(
        graft.sources.fst.FstTable.Schema.filter(f =>
          fields.contains(f.name))))
      b.build().asInstanceOf[FstScan].estimateStatistics()
        .sizeInBytes().getAsLong
    }
    val full = stats(Seq("nomvar", "ip1", "d"))
    val metaOnly = stats(Seq("nomvar", "ip1"))
    assert(metaOnly < full,
      s"metadata-only estimate $metaOnly !< full $full")
    // full estimate equals the on-disk byte count
    val disk = new java.io.File(path).listFiles().filter(_.isFile)
      .filterNot(f => f.getName.startsWith(".") ||
        f.getName.startsWith("_"))
      .map(_.length()).sum
    assert(full == disk, s"full estimate $full != disk $disk")
  }
}
