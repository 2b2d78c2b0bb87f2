package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.streaming.{Event, StatefulOps}

/** Scale-path behaviors: salted joins, stream-stream joins, checkpoint
  * recovery, partition pruning on the event-date layout. */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("saltedJoin equals plain join on a skewed key distribution") {
    val fact = (Seq.fill(500)((7L, "hot")) ++ Seq((1L, "a"), (2L, "b")))
      .toDF("k", "v")
    val dim = Seq((7L, "HOT"), (1L, "A"), (3L, "C")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("k", "name").count()
      .collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy("k", "name").count().collect().toSet
    assert(salted === plain)
    val hist = Skew.keyHistogram(fact, "k").as[(Long, Long)].collect()
    assert(hist.head === ((7L, 500L)))
  }

  test("stream-stream interval join with watermarks on both sides") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val views = MemoryStream[Event]
    val p = purchases.toDF().select(col("user_id"), col("ts").as("p_ts"),
      col("event_id").as("p_id")).withWatermark("p_ts", "30 minutes")
    val v = views.toDF().select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("event_id").as("v_id")).withWatermark("v_ts", "30 minutes")
    val joined = p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 minutes") &&
        col("v_ts") <= col("p_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      views.addData(Event(10, ts(1), 7, "view", 0), Event(11, ts(25), 7, "view", 0))
      purchases.addData(Event(20, ts(8), 7, "purchase", 9.99))
      q.processAllAvailable()
      val rows = spark.table("ssj").select("p_id", "v_id")
        .as[(Long, Long)].collect().toSet
      assert(rows === Set((20L, 10L))) // view at 00:25 outside [–10m, 0] of 00:08
    } finally q.stop()
  }

  test("stateful dedup state survives a query restart from checkpoint (T1)") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ms = MemoryStream[Event]
    def start() = StatefulOps
      .dedupWithinWatermark(ms.toDF(), "2 hours", Seq("event_id"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val q1 = start()
    ms.addData(Event(1, ts(1), 7, "a", 1.0))
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // same checkpoint → dedup state recovered
    ms.addData(Event(1, ts(2), 7, "a", 1.0), Event(2, ts(3), 7, "b", 2.0))
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 2) // event 1 emitted once despite the restart
  }

  test("keep-latest on the transformWithState API (RocksDB state)") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StatefulOps.keepLatestPerUserTws(ms.toDS())
        .writeStream.format("memory").queryName("tws").outputMode("update").start()
      try {
        ms.addData(Event(1, ts(5), 7, "a", 1.0), Event(2, ts(3), 7, "b", 2.0))
        q.processAllAvailable()
        ms.addData(Event(3, ts(4), 7, "c", 3.0)) // older → no emission
        q.processAllAvailable()
        assert(spark.table("tws").as[Event].collect().map(_.event_id).toSet === Set(1L))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("observe() exposes per-action metrics (F10 observability)") {
    val obs = new org.apache.spark.sql.Observation("stats")
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
      .observe(obs, count(lit(1)).as("rows"), sum(col("v")).as("total"))
    df.collect()
    assert(obs.get("rows") === 3L && obs.get("total") === 6.0)
  }

  test("bucketed tables join without any shuffle (co-located join)") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val ord = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    // the in-memory catalog forgets tables across JVMs but their files
    // survive in the warehouse dir — clear both before (re)creating
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$t")
      if (loc.exists()) {
        java.nio.file.Files.walk(loc.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")

    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").count()
      val plan = j.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key → no Exchange anywhere
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(j.count() === li.select("l_orderkey").distinct().count())
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("sharded packing (q78) plans no single-partition window; totals match q77") {
    val d = "/root/testdata/sf0.001"
    val sharded = graft.queries.Text.sqlPackingSharded(spark, d)
    val plan = sharded.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition stage in:\n$plan")
    // contrast: the globally-sequential form (q77) needs one
    val global = SparkEntry.queries("q77_packing")(spark, d)
    assert(global.queryExecution.executedPlan.toString.contains("SinglePartition"))
    // sharding re-buckets the same chunk stream: token totals are invariant
    val tokSharded = sharded.agg(sum("n_tokens")).head().getLong(0)
    val tokGlobal = global.agg(sum("n_tokens")).head().getLong(0)
    assert(tokSharded === tokGlobal)
  }

  test("semantic dedup (q82) pair join is cell-keyed, never a global cross join") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q82_semantic_dedup")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // the centroid broadcasts are the ONLY nested-loop joins (k rows
    // each): one per Lloyd iteration, one for final assignment — whose
    // subtree appears twice because both the pair join and the verdict
    // join consume it (4 = 2 iterations' worth of headroom); the
    // vector-pair comparison must be an equi-join on `cell`
    val nested = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nested <= 4, s"unexpected nested-loop joins ($nested):\n$plan")
    assert(plan.contains("cell"), "pair join not keyed on cell")
    assert(!plan.contains("CartesianProduct"), "global cartesian in q82")
  }

  test("event-date partitioned layout prunes partitions on time-range scans (S9)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00"), 2.0),
      (3L, Timestamp.valueOf("2024-01-03 10:00:00"), 3.0)
    ).toDF("event_id", "ts", "value")
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").parquet(s"$dir/t")

    val scan = spark.read.parquet(s"$dir/t")
      .filter(col("event_date") === "2024-01-02")
    assert(scan.count() === 1)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(event_date"))
  }

  test("staged-signature incremental dedup (q112) scans documents exactly once") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q112_staged_incremental_dedup")(spark, d)
    // AQE wraps the plan in AdaptiveSparkPlanExec (a leaf to typed
    // collect), so assert on the rendered plan like the other plan tests:
    // each FileSourceScanExec prints its Location exactly once
    val plan = df.queryExecution.executedPlan.toString
    // the whole point of staging: the corpus is NOT re-shingled per batch,
    // so the only documents scan is the new batch; the old side comes from
    // the signature table
    assert("documents\\.parquet".r.findAllIn(plan).size === 1,
      s"documents scanned more than once:\n$plan")
    assert("graft_staged_sigs".r.findAllIn(plan).size === 1,
      s"staged signature table not scanned exactly once:\n$plan")
    // and the verdicts round-trip the staging unchanged
    val inline = SparkEntry.queries("q85_incremental_dedup")(spark, d)
    assert(df.collect().toSeq === inline.collect().toSeq)
  }

  test("staged span stats ≡ inline dupSpanStats; probe never scans the corpus") {
    import graft.operators.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("span_stats_").toString
    try {
      // physically separate corpus and batch tables, so the plan itself
      // can prove which one the probe reads
      docs.filter(col("doc_id") < 250).write.parquet(s"$dir/corpus")
      docs.filter(col("doc_id") >= 250).write.parquet(s"$dir/batch")
      // the corpus's span groupBy is paid once, at staging time...
      Dedup.stageSpanStats(spark.read.parquet(s"$dir/corpus"), "doc_id",
        "text", s"$dir/stats", span = 8, seed = 11, numFiles = 4)
      val staged = Dedup.dupSpanStatsStaged(
        spark.read.parquet(s"$dir/stats"),
        spark.read.parquet(s"$dir/batch"), "doc_id", "text",
        span = 8, seed = 11)
      // ...and the probe must match the full-union inline computation
      // bit-for-bit on the batch's rows (the q112 staged≡inline contract)
      val inline = Dedup.dupSpanStats(docs, "doc_id", "text", span = 8,
        seed = 11).filter(col("doc_id") >= 250)
      assert(staged.orderBy("doc_id").collect().toSeq ===
        inline.orderBy("doc_id").collect().toSeq)
      // the whole point of staging: the probe plan reads the batch and
      // the staged stats table only — the corpus is never re-tokenized
      // (the inline form scans it on every run)
      val plan = staged.queryExecution.executedPlan.toString
      assert(!plan.contains(s"$dir/corpus"),
        s"probe plan re-scans the corpus:\n$plan")
      assert(plan.contains(s"$dir/stats"),
        s"staged span-stats table not in plan:\n$plan")
      assert(plan.contains(s"$dir/batch"),
        s"batch scan missing from plan:\n$plan")

      // merge lifecycle: folding the batch into the staged table must be
      // bit-for-bit a restage over the union — the corpus is never
      // re-tokenized, only the span-vocab-sized table is rewritten
      Dedup.mergeSpanStats(s"$dir/stats",
        spark.read.parquet(s"$dir/batch"), "doc_id", "text",
        span = 8, seed = 11, numFiles = 4)
      Dedup.stageSpanStats(docs, "doc_id", "text", s"$dir/stats_full",
        span = 8, seed = 11, numFiles = 4)
      assert(spark.read.parquet(s"$dir/stats").orderBy("h").collect().toSeq ===
        spark.read.parquet(s"$dir/stats_full").orderBy("h").collect().toSeq)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("staged postings ≡ inline q129; probe reads only the index") {
    import graft.operators.Postings
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("postings_").toString
    try {
      Postings.stagePostings(
        spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text", dir,
        numFiles = 4)
      val terms = Seq("vector", "stream", "filter", "spark", "customer")
      val probe = Postings.searchStaged(spark, dir, terms, k = 10)
      // bit-equality with the full-scan inline query (oracle-gated)
      val inline = SparkEntry.queries("q129_keyword_search")(spark, d)
      assert(probe.collect().toSeq === inline.collect().toSeq)
      val plan = probe.queryExecution.executedPlan.toString
      // scan-free over documents: only the index tables are in the plan
      assert(!plan.contains("documents.parquet"),
        s"probe plan scans the documents table:\n$plan")
      assert(plan.contains(s"$dir/postings") && plan.contains(s"$dir/weights"),
        s"index tables missing from plan:\n$plan")
      // the IN predicate reaches the parquet scan, so the token-range
      // clustering can footer-skip non-matching posting files
      // (AQE renders the plan twice — initial + final — so 2 scans show
      // ≥2 pushed-filter lines)
      assert("PushedFilters: \\[In\\(tok".r.findAllIn(plan).size >= 2,
        s"tok IN (...) not pushed to both index scans:\n$plan")
      // top-k is per-partition heaps, never a global sort
      assert(plan.contains("TakeOrderedAndProject"), plan)

      // commit protocol: a crash stranded between the two commit renames
      // leaves .old-<name> and no <name> — the next stage call restores
      // it before restaging, and the committed index answers identically
      val before = probe.collect().toSeq
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val aside = new org.apache.hadoop.fs.Path(root.getParent,
        s".old-${root.getName}")
      assert(fs.rename(root, aside))
      Postings.stagePostings(
        spark.read.parquet(s"$d/documents.parquet"), "doc_id", "text", dir,
        numFiles = 4)
      assert(!fs.exists(aside), "move-aside dir must be cleaned up")
      assert(Postings.searchStaged(spark, dir, terms, k = 10)
        .collect().toSeq === before)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q112 staging is content-addressed: repeat invocations reuse the staged table") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q112_staged_incremental_dedup")
    val df1 = q(spark, d) // builds (or reuses) the staged signature table
    val plan = df1.queryExecution.executedPlan.toString
    val dir = "graft_staged_sigs_[0-9a-f]+".r.findFirstIn(plan)
    assert(dir.isDefined, s"staged path not in plan:\n$plan")
    val success = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/${dir.get}", "_SUCCESS")
    assert(success.exists, s"missing commit marker at $success")
    val t0 = success.lastModified
    Thread.sleep(1100) // fs mtime granularity
    // staging is once-per-snapshot: a repeat invocation over the same
    // corpus + params must probe the existing table, not rewrite it
    q(spark, d).collect()
    assert(success.lastModified === t0, "staged table was rewritten")
  }

  test("adaptive quality floor (q114) windows per stratum, never single-partition") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q114_adaptive_quality_floor")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // exact rank selection must parallelize across strata: every window
    // sort is keyed on source — a SinglePartition exchange would mean a
    // global sort that serializes the corpus through one task
    assert(!plan.contains("SinglePartition"),
      s"single-partition stage in q114:\n$plan")
  }

  test("staged IVF probe (q131) prunes the assignment scan to probed cells (DPP)") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q131_ann_ivf_staged")(spark, d)
    assert(df.count() > 0)
    // the probe's cell equi-join against the hive-partitioned assignment
    // table must plan a dynamic partition-pruning filter on the scan —
    // at scale that is the difference between reading nprobe·|queries|
    // cells and re-reading the whole index per query batch
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the staged assignment scan:\n$plan")
  }

  test("keyword search (q129) is filtered postings + broadcast weights + top-k heaps") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q129_keyword_search")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // the global top-10 must be per-partition heaps (q02's shape), the
    // query-term weight frame must broadcast, and the token filter must
    // sit on the exploded tokens (postings pruned map-side) — a global
    // sort or a shuffled weight join would be corpus-sized work for a
    // 10-row answer
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k heap in q129:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"weights not broadcast in q129:\n$plan")
  }

  test("repeated-run detector (q130) windows per doc, never single-partition") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q130_repeated_run")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // both windows (run grouping, per-doc best) key on doc_id — the
    // gaps-and-islands sort must parallelize across docs; the final
    // ORDER BY range-partitions, so SinglePartition anywhere means a
    // stratum-serial window snuck in
    assert(!plan.contains("SinglePartition"),
      s"single-partition stage in q130:\n$plan")
  }

  test("span novelty (q115) is equi-join keyed on span hash, no cartesian") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q115_span_novelty")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // first-owner lookup must be a hash equi-join on the span hash (the
    // q86 shape); a nested-loop/cartesian here would be all-pairs over
    // the exploded span list
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in q115:\n$plan")
  }

  test("bloom probe is map-only: broadcast bitmap, no batch-side shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") < 250).select(md5(col("text")).as("fp"))
    val batch = docs.filter(col("doc_id") >= 250)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val sketch = graft.operators.Dedup.bloomBitmap(corpus, col("fp"))
    val plan = graft.operators.Dedup.bloomFlags(batch, sketch, col("fp"))
      .queryExecution.executedPlan.toString
    // the one-row bitmap joins by broadcast; the batch side must reach the
    // probe projection with NO hash exchange — the whole point of the
    // pre-filter is that the batch never shuffles
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }

  test("corpus-sized ANN (q125 path) shuffle-joins buckets — query side never broadcast") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = graft.operators.Similarity.lshTopKMulti(emb, col("vec_id") >= 0,
      planes = 4, dim = 64, k = 2, sets = 2, broadcastQueries = Some(false))
    assert(df.count() > 0)
    // assert on the FINAL adaptive plan (post-execution render): the
    // bucket join must be a sort-merge on (set, bucket) with no
    // BroadcastExchange anywhere — the hint has to survive both the
    // static planner's size guess and AQE's re-planning, or a
    // corpus-sized query set would OOM the broadcast at scale
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no sort-merge bucket join:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"query side was broadcast despite Some(false):\n$plan")
    // same contract for the single-table variant
    val one = graft.operators.Similarity.lshTopK(emb, col("vec_id") >= 0,
      planes = 4, dim = 64, k = 2, broadcastQueries = Some(false))
    assert(one.count() > 0)
    val p1 = one.queryExecution.executedPlan.toString
    assert(p1.contains("SortMergeJoin") && !p1.contains("BroadcastExchange"), p1)
  }

  test("q41 simhash join sides carry only fixed-width columns (no lying-stats broadcast trap)") {
    // VERDICT r14 item 4: q49's r14 bug was a planner broadcast of a
    // frame whose PER-ROW payload (shingle arrays) was 50–100× what the
    // parquet-derived stats priced. q41's band self-join takes the same
    // planner path, but its carry is structurally immune: every column
    // on either join side is a fixed-width primitive, so relation bytes
    // = rows × constant and the row count IS what stats/AQE shuffle
    // metrics measure (measured at sf0.1: 15k rows broadcast, ~34 B/row
    // marginal — the 64 MiB LongToUnsafeRowMap allocation floor
    // dominates, constant in corpus size). This pin fails if the carry
    // ever grows a variable-width column (array/string/map), which
    // would reopen the trap.
    val df = graft.SparkEntry.queries("q41_simhash_near_dup")(
      spark, "/root/testdata/sf0.001")
    assert(df.count() >= 0) // finalize AQE
    def joins(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        joins(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        joins(q.plan)
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        j +: j.children.flatMap(joins)
      case o => (o.children ++ o.subqueries).flatMap(joins)
    }
    val js = joins(df.queryExecution.executedPlan)
    assert(js.nonEmpty, "no joins found in q41's executed plan")
    for (j <- js; side <- j.children) {
      val fixedWidth: org.apache.spark.sql.types.DataType => Boolean = {
        case _: org.apache.spark.sql.types.NumericType => true
        case org.apache.spark.sql.types.BooleanType => true
        case org.apache.spark.sql.types.DateType => true
        case org.apache.spark.sql.types.TimestampType => true
        case _ => false // string/array/map/struct: variable or nested
      }
      val wide = side.output.filterNot(a => fixedWidth(a.dataType))
      assert(wide.isEmpty,
        s"q41 join side carries variable/wide columns ${wide.map(_.name)} — " +
          "the q49 lying-stats broadcast trap applies again")
    }
  }

  test("tokenBudgetSample shards the stratum window by hash bucket (no stratum-serial sort)") {
    // ONE giant stratum: the old single-window shape would sort it in
    // one task; the bucketed form must (a) key the row window on
    // (stratum, __b) and (b) prune rows past the budget BEFORE the sort
    val df = (1L to 2000L).map(i => (i, "one", 10L)).toDF("id", "src", "nt")
    val out = graft.operators.Sampling.tokenBudgetSample(df, Seq("src"), "id",
      col("nt"), lit(500L), seed = 5, shardBits = 10)
    assert(out.count() === 50) // 500 / 10 tokens each
    val plan = out.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(src#\\d+, __b#\\d+".r.findFirstIn(plan).isDefined,
      s"row window not sharded by bucket:\n$plan")
    // the bucket-offset prune sits before the window: rows in buckets
    // whose starting offset exceeds the budget never reach the sort
    assert(plan.contains("__off"), s"no offset prune in plan:\n$plan")
  }

  test("systematicPps shards the stratum window by hash bucket (no stratum-serial sort)") {
    // ONE giant stratum: the old single-window shape would sort it in
    // one task; the sharded form keys the row window on (stratum, __b)
    // — offsets make off + in-bucket running sum the exact global sum
    val df = (1L to 2000L).map(i => (i, "one", 10L)).toDF("id", "src", "w")
    val out = graft.operators.Sampling.systematicPps(df, Seq("src"), "id",
      col("w"), step = 100L, seed = 5, shardBits = 10)
    assert(out.count() === 200) // 20000 tokens / 100-token step
    val plan = out.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(src#\\d+, __b#\\d+".r.findFirstIn(plan).isDefined,
      s"row window not sharded by bucket:\n$plan")
  }

  test("sampler shardBits auto rule: small stats pick the join-free single window, big stats shard") {
    import graft.operators.Sampling
    val tiny = (1L to 100L).map(i => (i, "one", 10L)).toDF("id", "src", "nt")
    // a LocalRelation's stats are its actual bytes — far under 256 MB
    assert(Sampling.resolveShardBits(tiny, -1) === 0)
    // explicit shardBits always wins over the statistic
    assert(Sampling.resolveShardBits(tiny, 10) === 10)
    // range's stats are computed from its parameters (8 bytes/row), so
    // 50M rows report ~400 MB without materializing anything
    assert(Sampling.resolveShardBits(
      spark.range(50000000L).toDF("id"), -1) === 10)
    // the auto single-window plan really is join-free: no subtotal
    // aggregation, no __b bucket column anywhere
    val out = Sampling.tokenBudgetSample(tiny, Seq("src"), "id",
      col("nt"), lit(500L), seed = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("__b"), s"auto path unexpectedly sharded:\n$plan")
    assert(!plan.contains("Join"), s"auto path has a join:\n$plan")
    assert(out.count() === 50)
    // and it matches the sharded draw row-for-row (the standing
    // equality contract between the two shapes)
    val sharded = Sampling.tokenBudgetSample(tiny, Seq("src"), "id",
      col("nt"), lit(500L), seed = 5, shardBits = 10)
    assert(out.orderBy("id").collect().toSeq ===
      sharded.select(out.columns.map(col): _*).orderBy("id").collect().toSeq)
  }

  test("clusteredWrite produces disjoint per-file ranges (file-skipping layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_shipdate", "l_quantity")
    graft.sources.Layout.clusteredWrite(li, s"$dir/t", Seq("l_shipdate"), 8)

    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    // each file covers a contiguous slice of the l_shipdate order; equal
    // keys never split, so ranges sorted by min must be strictly disjoint
    val ranges = files.map { f =>
      spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("l_shipdate").cast("string")),
          max(col("l_shipdate").cast("string")))
        .as[(String, String)].head()
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, prevMax), (nextMin, _)) =>
        assert(nextMin > prevMax, s"file ranges overlap: $prevMax vs $nextMin")
      case _ =>
    }
    // nothing lost in the rewrite
    assert(spark.read.parquet(s"$dir/t").count() === li.count())
  }

  test("dominantDirection's final plan reads checkpoints, not the corpus (lineage cut)") {
    // each unrolled power iteration references the cov frame and the
    // previous matvec more than once; without the localCheckpoint cuts
    // the covariance subtree (and its corpus scan) replicates ~3^iters
    // times through the plan — 84 parquet scans measured at iters=3.
    // The materialized frames pin the corpus cost to exactly one pass.
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Similarity.dominantDirection(emb, dim = 64, iters = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"corpus scan leaked into the iteration plan:\n${plan.take(2000)}")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected checkpointed frames in the final plan:\n${plan.take(2000)}")
  }
}
