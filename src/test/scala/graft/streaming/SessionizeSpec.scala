package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Cross-batch stateful sessionization via MemoryStream (controlled
  * micro-batches, no docker — SURVEY.md §7.4 risk 6). */
class SessionizeSpec extends SparkSuite {

  private def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)

  test("sessions close on gap in-stream and on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]

    val sessions = Sessionize.sessions(
      in.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.sql.Timestamp)])

    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: user 1 has two close events; user 2 one event
      in.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(1)))
      q.processAllAvailable()
      // batch 2: user 1 returns after 60 min -> closes their first session
      in.addData((1L, ts(65)))
      q.processAllAvailable()
      // batch 3: far-future event advances the watermark past all timeouts
      in.addData((3L, ts(600)))
      q.processAllAvailable()
      // one more empty-ish batch so timed-out state flushes
      in.addData((3L, ts(601)))
      q.processAllAvailable()

      val got = spark.table("sessions_out")
        .as[Sessionize.Session].collect()
        .map(s => (s.user_id, s.session_start.getTime, s.n_events)).toSet
      // user 1 session [t0, t0+5] n=2 closed by the gap in batch 2
      assert(got.contains((1L, ts(0).getTime, 2L)), s"got $got")
      // user 2 session closed by event-time timeout
      assert(got.contains((2L, ts(1).getTime, 1L)), s"got $got")
      // user 1's second session closed by timeout after batch 3
      assert(got.contains((1L, ts(65).getTime, 1L)), s"got $got")
    } finally q.stop()
  }

  test("an offline buffer flush merges into ONE late session, not n singles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    // a real allowed-lateness window: with 0s the engine's watermark
    // filter would drop the buffered events before they reach the fold
    val sessions = Sessionize.sessions(
      in.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "3 hours")
        .as[(Long, java.sql.Timestamp)])
    val q = sessions.writeStream
      .format("memory").queryName("late_sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1 opens a session at t=120min
      in.addData((1L, ts(120)))
      q.processAllAvailable()
      // batch 2: a device flushes three buffered offline events from
      // t=0..10 — all separated from the open session by > the gap,
      // but within the gap of each other: ONE late session [0, 10] n=3.
      // A fourth buffered event at t=60 is > gap from both the chain
      // and the open session: its own single.
      in.addData((1L, ts(0)), (1L, ts(5)), (1L, ts(10)), (1L, ts(60)))
      q.processAllAvailable()
      val got = spark.table("late_sessions_out")
        .as[Sessionize.Session].collect()
        .map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events))
        .toSet
      assert(got.contains((ts(0).getTime, ts(10).getTime, 3L)),
        s"buffered chain must merge: $got")
      assert(got.contains((ts(60).getTime, ts(60).getTime, 1L)),
        s"chain-breaking late event stays its own session: $got")
      assert(got.size == 2, s"open session must stay open: $got")
    } finally q.stop()
  }

  test("streaming sessions agree with the batch (oracle-checked) sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real data: the driver events table (user_id, ts)
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)].collect().toSeq

    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = Sessionize.sessions(
      in.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.sql.Timestamp)])
    val q = sessions.writeStream
      .format("memory").queryName("eq_sessions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData(ev: _*)
      q.processAllAvailable()
      // sentinel far-future events flush all real sessions via timeouts
      val far = new java.sql.Timestamp(ev.map(_._2.getTime).max + 365L * 86400000)
      in.addData((999999L, far)); q.processAllAvailable()
      in.addData((999999L, new java.sql.Timestamp(far.getTime + 60000)))
      q.processAllAvailable()

      // compare at second granularity: the batch operator formats
      // session_start to whole seconds
      val streamed = spark.table("eq_sessions").as[Sessionize.Session].collect()
        .filter(_.user_id != 999999L)
        .map(s => (s.user_id, s.session_start.getTime / 1000, s.n_events)).toSet
      // batch twin (the oracle-checked operator)
      val batch = graft.operators.Temporal.sessionize(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getLong(0),
          java.sql.Timestamp.valueOf(r.getString(3)).getTime / 1000, r.getLong(2))).toSet
      val onlyS = (streamed -- batch).take(3)
      val onlyB = (batch -- streamed).take(3)
      assert(streamed == batch, s"streamed-only: $onlyS; batch-only: $onlyB")
    } finally q.stop()
  }

  test("transformWithState twin emits exactly the flatMapGroupsWithState sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // scripted batches: in-stream gap close, cross-batch session extension
    // (exercises the twin's deleteTimer-then-register path), and
    // watermark-driven timer closes
    val script: Seq[Seq[(Long, java.sql.Timestamp)]] = Seq(
      Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(1))),
      Seq((1L, ts(40))), // > 30-min gap: closes user 1's first session
      Seq((1L, ts(50))), // extends the open session, replacing its timer
      Seq((3L, ts(600))), // watermark jump expires every pending timer
      Seq((3L, ts(601))))

    def run(name: String,
        mk: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)] =>
          org.apache.spark.sql.Dataset[Sessionize.Session]): Set[(Long, Long, Long, Long)] = {
      val in = MemoryStream[(Long, java.sql.Timestamp)]
      val q = mk(in.toDS().toDF("user_id", "ts")
          .withWatermark("ts", "0 seconds")
          .as[(Long, java.sql.Timestamp)])
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        script.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[Sessionize.Session].collect()
          .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
          .toSet
      } finally q.stop()
    }

    val legacy = run("tws_eq_legacy", Sessionize.sessions(_))
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val tws =
      try run("tws_eq_new", Sessionize.sessionsTws(_))
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    assert(legacy.nonEmpty)
    // both observed the gap close, the extension, and the timer closes
    assert(legacy.contains((1L, ts(0).getTime, ts(5).getTime, 2L)))
    assert(legacy.contains((1L, ts(40).getTime, ts(50).getTime, 2L)))
    assert(legacy.contains((2L, ts(1).getTime, ts(1).getTime, 1L)))
    assert(tws === legacy, s"tws-only: ${(tws -- legacy).take(3)}; legacy-only: ${(legacy -- tws).take(3)}")
  }

  test("late-but-in-watermark event extends the session backwards, not end-first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = Sessionize.sessions(
      in.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "2 minutes")
        .as[(Long, java.sql.Timestamp)])
    val q = sessions.writeStream
      .format("memory").queryName("late_sessions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData((1L, ts(10)))
      q.processAllAvailable()
      // 1 minute EARLIER than the open session, within the watermark
      in.addData((1L, ts(9)))
      q.processAllAvailable()
      // far-future events push the watermark past the timeout, twice so the
      // timed-out state flushes
      in.addData((9L, ts(600))); q.processAllAvailable()
      in.addData((9L, ts(601))); q.processAllAvailable()
      val got = spark.table("late_sessions").as[Sessionize.Session].collect()
        .filter(_.user_id == 1L)
      assert(got.nonEmpty, "session for user 1 not flushed")
      val s1 = got.head
      assert(s1.session_start.getTime == ts(9).getTime, s"start ${s1.session_start}")
      assert(s1.session_end.getTime == ts(10).getTime, s"end ${s1.session_end}")
      assert(s1.session_end.getTime >= s1.session_start.getTime)
      assert(s1.n_events == 2)
    } finally q.stop()
  }
}
