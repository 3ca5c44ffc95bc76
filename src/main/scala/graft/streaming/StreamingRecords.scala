package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Decode, IpColumns}

/** Streaming extension point (SURVEY.md §2.10: the reference is
  * batch-only; this is the Spark-native growth path).
  *
  * Arriving CSV record files (CsvRecords cell format) become an
  * unbounded record catalog; the decode layer applies unchanged
  * because it is pure Column expressions. Includes the two canonical
  * streaming shapes over the catalog:
  *  - watermarked windowed counts on the decoded validity time;
  *  - streaming dedup on the 19-column record identity.
  */
object StreamingRecords {

  /** Raw schema of streamed record CSVs (payload still a string). */
  val CsvSchema: StructType = StructType(Seq(
    StructField("nomvar", StringType), StructField("typvar", StringType),
    StructField("etiket", StringType), StructField("dateo", LongType),
    StructField("datev", LongType), StructField("ip1", IntegerType),
    StructField("ip2", IntegerType), StructField("ip3", IntegerType),
    StructField("deet", IntegerType), StructField("npas", IntegerType),
    StructField("datyp", IntegerType), StructField("nbits", IntegerType),
    StructField("grtyp", StringType), StructField("ig1", IntegerType),
    StructField("ig2", IntegerType), StructField("ig3", IntegerType),
    StructField("ig4", IntegerType), StructField("d", StringType)))

  /** `readStream` over a directory of record CSVs -> streaming record
    * catalog with parsed payload and decoded validity timestamp.
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.readStream
      .schema(CsvSchema)
      .option("header", "true")
      .csv(path)
    graft.sources.CsvRecords.parsePayload(raw)
      .withColumn("nk", lit(1))
      .withColumn("date_of_validity",
        IpColumns.stampToTimestamp(col("datev")))
      .transform(Decode.addGrid)
  }

  /** Watermarked per-variable counts in 1-hour validity windows. */
  def windowedCounts(records: DataFrame): DataFrame =
    records
      .withWatermark("date_of_validity", "2 hours")
      .groupBy(window(col("date_of_validity"), "1 hour"), col("nomvar"))
      .agg(count(lit(1)).as("n_records"),
        approx_count_distinct("grid").as("n_grids"))

  /** Streaming dedup on the record identity (A2 semantics with a
    * watermark bounding the dedup state).
    *
    * NOTE: records whose datev is a dummy stamp decode to a NULL
    * validity time, and watermarked stateful operators drop
    * null-event-time rows — route such records through the batch
    * dedup path instead.
    */
  def dedup(records: DataFrame): DataFrame =
    records
      .withWatermark("date_of_validity", "2 hours")
      .dropDuplicatesWithinWatermark(
        graft.core.Constants.DedupColumns :+ "date_of_validity")

  /** A session closed by [[sessions]]. */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)

  /** Stateful streaming sessionization — the custom-state shape
    * (`flatMapGroupsWithState` + event-time timeout) and the streaming
    * twin of the batch q18 operator. Input needs `user_id` and a
    * timestamp column `ts`; a session closes (and is emitted) when a
    * same-user event arrives more than `gapUs` after it, or when the
    * watermark passes its end by the gap (timeout path).
    *
    * State per key is ONE open session (three longs) — bounded by
    * distinct active users, not event volume; the watermark timeout
    * guarantees eviction, so at 100 TB/day the state store holds only
    * the active-user working set.
    */
  def sessions(events: DataFrame, gapUs: Long,
               watermarkDelay: String = "10 seconds")
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val session = events.sparkSession
    import session.implicits._
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Long)]
    // state = (start_us, end_us, n) for the single open session
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, rows, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (st, en, n) = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, st, en, n))
          } else {
            // per-(key, micro-batch) rows are unordered; the sort is
            // bounded by one user's batch volume, not the stream
            val ts = rows.map(_._3).toArray.sorted
            // gap-merge the batch's own events first (exact batch-q18
            // semantics within the micro-batch): stragglers that fall
            // within the gap of EACH OTHER merge before any of them is
            // compared to the open session
            val intervals =
              scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
            ts.foreach { t =>
              intervals.lastOption match {
                case Some((a, b, m)) if t - b <= gapUs =>
                  intervals(intervals.length - 1) = (a, t, m + 1)
                case _ => intervals += ((t, t, 1L))
              }
            }
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            intervals.foreach { case (a, b, m) =>
              cur match {
                case Some((st, en, n)) if a - en > gapUs =>
                  // entirely past the open session by > gap: close it
                  closed ::= ClosedSession(uid, st, en, n)
                  cur = Some((a, b, m))
                case Some((st, _, _)) if st - b > gapUs =>
                  // above-watermark straggler run from before the open
                  // session by > gap: closes immediately. DOCUMENTED
                  // DIVERGENCE from batch q18: an even-later-arriving
                  // straggler in a FUTURE micro-batch that lands within
                  // this run's gap would have merged in batch; closing
                  // that too would need buffering candidate sessions in
                  // state until the watermark passes them (bounded by
                  // the watermark delay) — see the q19 oracle notes.
                  closed ::= ClosedSession(uid, a, b, m)
                case Some((st, en, n)) =>
                  // within the gap on either side: extend (an
                  // out-of-order run may move START earlier, matching
                  // the batch q18 semantics)
                  cur = Some((math.min(st, a), math.max(en, b), n + m))
                case None =>
                  cur = Some((a, b, m))
              }
            }
            cur.foreach { case (st, en, n) =>
              state.update((st, en, n))
              // never set a timeout at/behind the current watermark
              state.setTimeoutTimestamp(math.max(
                en / 1000L + gapUs / 1000L,
                state.getCurrentWatermarkMs + 1000L))
            }
            closed.reverse.iterator
          }
      }
  }
}
