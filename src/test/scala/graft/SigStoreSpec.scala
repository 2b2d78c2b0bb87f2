package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.operators.Dedup
import graft.sources.{Layout, ParquetStats}

/** r15 pins: the metadata-priced text-volume probe (ParquetStats) and
  * the staged-signature store format sidecar (ADVICE r14 medium +
  * VERDICT r14 item 1).
  *
  *  - the footer probe must NEVER under-count (under-counting flips the
  *    LSH family's broadcast gate open on a corpus-sized frame), must
  *    run ZERO Spark jobs (that is the whole point: metadata, not a
  *    scan), and must refuse lineages it cannot price;
  *  - the sidecar must fail-fast a mixed-format or mixed-parameter
  *    append/probe BEFORE any corrupting write, and must carry the
  *    measured text volume through stage → append accumulation so the
  *    path-based staged probe prices its join regime without scanning.
  */
class SigStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sig-$tag").toString

  private def docs(n: Int, repeatEvery: Int = 0): DataFrame =
    (0 until n).map { i =>
      val body =
        if (repeatEvery > 0) s"shared body text ${i % repeatEvery} common tail"
        else s"unique document $i with its own words ${i * 37} and tail $i"
      (i.toLong, body)
    }.toDF("doc_id", "text")

  private def exactBytes(df: DataFrame): Long =
    df.agg(coalesce(sum(octet_length(col("text"))), lit(0L)))
      .head().getLong(0)

  // ---- ParquetStats ------------------------------------------------------

  test("footer probe: never under-counts, on plain AND dictionary-heavy corpora") {
    for ((tag, d) <- Seq(("plain", docs(400)), ("dict", docs(4000, repeatEvery = 7)))) {
      val dir = tmpDir(s"probe-$tag")
      d.repartition(3).write.mode("overwrite").parquet(s"$dir/t.parquet")
      val back = spark.read.parquet(s"$dir/t.parquet")
      val exact = exactBytes(back)
      ParquetStats.textBytesUpperBound(back, "text") match {
        case Some(priced) =>
          assert(priced >= exact,
            s"$tag: footer price $priced UNDER-counts exact $exact")
          assert(priced <= exact * 2 + 8192,
            s"$tag: footer price $priced wildly over exact $exact — useless bound")
        case None => // refusing is always safe; but a Spark-4-written
          // plain corpus should be priceable (SizeStatistics or
          // EncodingStats must be present)
          fail(s"$tag: Spark-written parquet was not footer-priceable")
      }
    }
  }

  /** A corpus as an OLDER writer would produce it: no SizeStatistics
    * (parquet < 1.15 — most existing data lakes), chosen page version /
    * dictionary setting. Spark's own writer always emits SizeStatistics
    * (the conf flag isn't wired through ParquetOutputFormat in this
    * build), so the EncodingStats fallback path needs parquet-mr's
    * writer directly. */
  private def writeLegacyStyle(dir: String, v2: Boolean, n: Int): Unit = {
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.column.ParquetProperties.WriterVersion
    val schema = MessageTypeParser.parseMessageType(
      "message doc { required int64 doc_id; required binary text (UTF8); }")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/part-0.parquet"))
      .withType(schema)
      .withSizeStatisticsEnabled(false)
      .withDictionaryEncoding(false) // v2 emits DELTA_BYTE_ARRAY, v1 PLAIN
      .withWriterVersion(
        if (v2) WriterVersion.PARQUET_2_0 else WriterVersion.PARQUET_1_0)
      .withConf(spark.sessionState.newHadoopConf())
      .build()
    val f = new SimpleGroupFactory(schema)
    try (0 until n).foreach { i =>
      w.write(f.newGroup().append("doc_id", i.toLong)
        .append("text", s"unique document $i with its own words ${i * 37}"))
    } finally w.close()
  }

  test("footer probe refuses v2-writer DELTA_BYTE_ARRAY pages (prefix-sharing under-counts)") {
    // The EncodingStats fallback path (writers without SizeStatistics)
    // must be a WHITELIST: DELTA_BYTE_ARRAY prefix-shares consecutive
    // values, so total_uncompressed_size can UNDER-count — the unsafe
    // direction for the broadcast gate.
    val dir = tmpDir("v2pages")
    writeLegacyStyle(s"$dir/v2.parquet", v2 = true, n = 300)
    assert(ParquetStats.textBytesUpperBound(
      spark.read.parquet(s"$dir/v2.parquet"), "text").isEmpty,
      "DELTA_BYTE_ARRAY pages must disqualify the footer bound")
    // same writer vintage, v1 PLAIN pages: priceable and an upper bound
    writeLegacyStyle(s"$dir/v1.parquet", v2 = false, n = 300)
    val v1 = spark.read.parquet(s"$dir/v1.parquet")
    val priced = ParquetStats.textBytesUpperBound(v1, "text")
      .getOrElse(fail("plain v1 pages without size stats must be priceable"))
    assert(priced >= exactBytes(v1), "PLAIN fallback bound under-counts")
  }

  test("footer probe runs ZERO Spark jobs (metadata only) and traces spread/alias lineage") {
    val dir = tmpDir("nojobs")
    docs(300).write.mode("overwrite").parquet(s"$dir/t.parquet")
    // the q49-family lineage shape: load → repartition (Tables.spread)
    // → project-alias (bandedSignatures' src0)
    val frame = spark.read.parquet(s"$dir/t.parquet").repartition(4)
      .select(col("doc_id").as("id"), col("text").as("__text"))
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val priced = ParquetStats.textBytesUpperBound(frame, "__text")
      // listener delivery is async; a job started during the probe is
      // delivered well within this bound
      Thread.sleep(500)
      assert(priced.isDefined, "lineage should be footer-priceable")
      assert(jobs == 0, s"footer probe launched $jobs Spark jobs — it scanned")
      val exact = exactBytes(
        spark.read.parquet(s"$dir/t.parquet").select(col("text")))
      assert(priced.get >= exact)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("distributed footer sweep (files > driver max) prices identically to the driver sweep") {
    val dir = tmpDir("dist")
    docs(500).repartition(10).write.mode("overwrite").parquet(s"$dir/t.parquet")
    val t = spark.read.parquet(s"$dir/t.parquet")
    val onDriver = ParquetStats.textBytesUpperBound(t, "text")
    assert(onDriver.isDefined)
    System.setProperty("graft.footer.driver.max", "4") // 10 files > 4 → Spark job
    try {
      val distributed = ParquetStats.textBytesUpperBound(t, "text")
      assert(distributed == onDriver,
        s"distributed sweep $distributed != driver sweep $onDriver")
    } finally System.clearProperty("graft.footer.driver.max")
  }

  test("footer probe refuses unpriceable lineages (filter, computed column, non-parquet)") {
    val dir = tmpDir("refuse")
    docs(100).write.mode("overwrite").parquet(s"$dir/t.parquet")
    val t = spark.read.parquet(s"$dir/t.parquet")
    // a filtered frame prices what flows, not the corpus → exact scan path
    assert(ParquetStats.textBytesUpperBound(
      t.filter(col("doc_id") < 10), "text").isEmpty)
    // computed column: footer bytes don't describe it
    assert(ParquetStats.textBytesUpperBound(
      t.select(concat(col("text"), col("text")).as("text")), "text").isEmpty)
    // non-parquet source (in-memory): nothing to price
    assert(ParquetStats.textBytesUpperBound(docs(10), "text").isEmpty)
  }

  // ---- staged-signature sidecar ------------------------------------------

  test("stage writes the format sidecar; append accumulates measured textBytes") {
    val path = tmpDir("sidecar") + "/sigs"
    val base = docs(200)
    val batch = docs(60).withColumn("doc_id", col("doc_id") + 1000L)
    Dedup.stageSignatureBuckets(base, "doc_id", "text", path, nGroups = 4)
    val f0 = Dedup.readSigFormat(spark, path)
      .getOrElse(fail("stage wrote no sidecar"))
    assert(f0.version == Dedup.SigFormatVersion)
    assert((f0.numHashes, f0.bands, f0.shingleSize) == ((8, 4, 3)))
    assert(f0.textBytes == exactBytes(base),
      "staged textBytes must equal the measured corpus volume")
    Dedup.appendSignatureBuckets(batch, "doc_id", "text", path, nGroups = 4)
    val f1 = Dedup.readSigFormat(spark, path).get
    assert(f1.textBytes == exactBytes(base) + exactBytes(batch),
      "append must accumulate the batch's measured volume")
  }

  test("append fails fast on parameter mismatch, BEFORE writing") {
    val path = tmpDir("mismatch") + "/sigs"
    Dedup.stageSignatureBuckets(docs(50), "doc_id", "text", path, nGroups = 4)
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[String] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids.filter(_.isFile).map(_.getPath) ++ kids.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(path)).toSet
    }
    val before = files()
    val e = intercept[IllegalStateException] {
      Dedup.appendSignatureBuckets(docs(10), "doc_id", "text", path,
        numHashes = 16, bands = 8, nGroups = 4)
    }
    assert(e.getMessage.contains("restage"), s"not actionable: ${e.getMessage}")
    assert(files() == before, "mismatched append mutated the store")
  }

  test("append into a flat clustered store fails fast (layout guard)") {
    val path = tmpDir("layout") + "/sigs"
    Dedup.stageSignatures(docs(40), "doc_id", "text", path, numFiles = 2)
    val e = intercept[IllegalStateException] {
      Dedup.appendSignatureBuckets(docs(10), "doc_id", "text", path)
    }
    assert(e.getMessage.contains("layout") ||
      e.getMessage.contains("stageSignatureBuckets"), e.getMessage)
    // adopted store without a sidecar: the directory shape still tells
    val bare = tmpDir("layout-bare") + "/sigs"
    Dedup.stageSignatures(docs(40), "doc_id", "text", bare, numFiles = 2)
    val fs = new java.io.File(bare, Dedup.SigFormatName)
    assert(fs.delete(), "fixture: could not remove sidecar")
    val e2 = intercept[IllegalStateException] {
      Dedup.appendSignatureBuckets(docs(10), "doc_id", "text", bare)
    }
    assert(e2.getMessage.contains("band-buckets"), e2.getMessage)
  }

  test("append and probe fail fast on a v1 (string-shingle) store") {
    val path = tmpDir("v1") + "/sigs"
    // fake a v1 store: sh as ARRAY<STRING>, no sidecar, bucket layout
    // (bgrp-partitioned so the layout guard passes and the format
    // check is what fires)
    Seq((1L, Seq("a b c"), 0, "k", 0))
      .toDF("doc_id", "sh", "band", "bkey", "bgrp")
      .write.partitionBy("bgrp").parquet(path)
    val eApp = intercept[IllegalStateException] {
      Dedup.appendSignatureBuckets(docs(5), "doc_id", "text", path)
    }
    assert(eApp.getMessage.contains("restage"))
    val eProbe = intercept[IllegalStateException] {
      Dedup.incrementalNearDupsStaged(spark.read.parquet(path), docs(5),
        "doc_id", "text")
    }
    assert(eProbe.getMessage.contains("restage"))
  }

  test("append crash between sidecar and data write over-counts (never under-counts); retry converges") {
    // appendSignatureBuckets writes the accumulated-volume sidecar BEFORE
    // the bucket append by design: a crash between the two must leave
    // textBytes OVER-counting (batch priced, rows absent — a conservative
    // regime choice), never under-counting (which could flip the staged
    // probe's broadcast gate open on a frame larger than priced).
    val path = tmpDir("crash") + "/sigs"
    val base = docs(80)
    val batch = docs(30).withColumn("doc_id", col("doc_id") + 1000L)
    Dedup.stageSignatureBuckets(base, "doc_id", "text", path, nGroups = 4)
    val stagedRows = spark.read.parquet(path).count()

    // a shingler that passes analysis but throws on every row at
    // execution time — textBytes is measured on the raw text (no
    // shingler), so the failure lands exactly between the sidecar
    // write and the data append
    val bomb: Column => Column =
      c => split(assert_true(length(c) < 0).cast("string"), " ")
    intercept[Exception] {
      Dedup.appendSignatureBuckets(batch, "doc_id", "text", path,
        nGroups = 4, shingler = bomb)
    }

    val f = Dedup.readSigFormat(spark, path).get
    assert(f.textBytes == exactBytes(base) + exactBytes(batch),
      "crashed append must leave the sidecar counting the batch (over-count)")
    assert(spark.read.parquet(path).count() == stagedRows,
      "crashed append committed data rows")

    // an invalid-parameter append must fail BEFORE touching the sidecar
    intercept[IllegalArgumentException] {
      Dedup.appendSignatureBuckets(batch, "doc_id", "text", path, nGroups = 0)
    }
    assert(Dedup.readSigFormat(spark, path).get == f,
      "invalid-parameter append mutated the sidecar")

    // retry with a working shingler: data lands, volume accumulates again
    // (the documented over-count drift — still the conservative direction)
    Dedup.appendSignatureBuckets(batch, "doc_id", "text", path, nGroups = 4)
    val f2 = Dedup.readSigFormat(spark, path).get
    assert(f2.textBytes == exactBytes(base) + 2 * exactBytes(batch))
    assert(spark.read.parquet(path).count() > stagedRows,
      "retried append wrote no rows")

    // the over-counted store still probes correctly (volume is regime
    // input, never a correctness input)
    val hits = Dedup.incrementalNearDupsStaged(spark, path,
      docs(5).withColumn("doc_id", col("doc_id") + 5000L), // base text, new ids
      "doc_id", "text", numHashes = 8, bands = 4,
      shingleSize = 3, threshold = 0.5, shingler = null).collect()
    assert(hits.nonEmpty, "staged store no longer probes after crash+retry")
  }

  test("path-based staged probe: sidecar-verified, regime from persisted volume, verdict parity") {
    val all = docs(120, repeatEvery = 30) // repeats → real near-dups
    val corpus = all.filter(col("doc_id") < 90)
    val batch = all.filter(col("doc_id") >= 90)
    val path = tmpDir("probe-parity") + "/sigs"
    Dedup.stageSignatures(corpus, "doc_id", "text", path, numFiles = 2)

    // parameter mismatch fails fast instead of silently zero candidates
    intercept[IllegalStateException] {
      Dedup.incrementalNearDupsStaged(spark, path, batch, "doc_id", "text",
        numHashes = 16, bands = 8, shingleSize = 3, threshold = 0.5,
        shingler = null).collect()
    }

    val viaPath = Dedup.incrementalNearDupsStaged(spark, path, batch,
      "doc_id", "text", numHashes = 8, bands = 4, shingleSize = 3,
      threshold = 0.5, shingler = null).orderBy("doc_id").collect()
    val inline = Dedup.incrementalNearDups(corpus, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(viaPath.nonEmpty, "fixture produced no near-dups")
    assert(viaPath.toSeq == inline.toSeq,
      "path-based staged probe diverged from the inline probe")

    // an over-cap persisted volume must deny the corpus side the
    // broadcast — but a MEASURED under-cap batch beside it is broadcast
    // explicitly (the big-corpus/small-batch ingest shape): the
    // BroadcastExchange must sit on the batch (left/x) side
    Layout.writeSidecar(spark, path, Dedup.SigFormatName,
      s"""{"version":2,"sh":"array<bigint>","layout":"bkey-clustered",""" +
        s""""num_hashes":8,"bands":4,""" +
        s""""shingle_size":3,"text_bytes":${Long.MaxValue / 64}}""")
    val big = Dedup.incrementalNearDupsStaged(spark, path, batch,
      "doc_id", "text", numHashes = 8, bands = 4, shingleSize = 3,
      threshold = 0.5, shingler = null)
    big.collect()
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildLeft"),
      s"under-cap batch beside an over-cap corpus should broadcast the " +
        s"batch side:\n$plan")

    // the gate arithmetic must be overflow-safe: Long.MaxValue/10 × 20
    // wraps to -16, so a product-form gate would return UNDER-cap and
    // open the corpus broadcast on a corrupted-volume sidecar
    assert(Dedup.overCarryCap(Long.MaxValue / 10), "overflow opened the gate")
    assert((Long.MaxValue / 10) * Dedup.CarriedBytesPerTextByte < 0,
      "fixture no longer overflows — pick a volume whose ×20 wraps negative")
    assert(Dedup.overCarryCap(-1L), "unknown volume must be over-cap")
    assert(!Dedup.overCarryCap(1024L))
  }

  test("both sides over-cap pins sort-merge (batch measured, corpus from sidecar)") {
    // ~9 MB of batch text > MaxBroadcastCarryBytes/CarriedBytesPerTextByte
    // (6.7 MB): the batch's MEASURED volume must deny the planner the
    // batch-side broadcast its lying stats would otherwise allow
    val corpus = docs(60)
    val path = tmpDir("bothover") + "/sigs"
    Dedup.stageSignatureBuckets(corpus, "doc_id", "text", path, nGroups = 2)
    Layout.writeSidecar(spark, path, Dedup.SigFormatName,
      s"""{"version":2,"sh":"array<bigint>","layout":"band-buckets",""" +
        s""""num_hashes":8,"bands":4,""" +
        s""""shingle_size":3,"text_bytes":${Long.MaxValue / 64}}""")
    val filler = (0 until 600).map(j => s"word$j token${j * 13}").mkString(" ")
    val bigBatch = (0 until 1200).map(i => (i + 9000L, s"doc $i $filler"))
      .toDF("doc_id", "text")
      // corpus-duplicate rows keep the result non-empty so AQE cannot
      // collapse the join out of the final plan
      .unionByName(docs(5).withColumn("doc_id", col("doc_id") + 90000L))
    val res = Dedup.incrementalNearDupsStaged(spark, path, bigBatch,
      "doc_id", "text", numHashes = 8, bands = 4, shingleSize = 3,
      threshold = 0.5, shingler = null)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"a side was broadcast with BOTH sides over-cap:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected pinned SMJ:\n$plan")
  }

  test("a pre-layout sidecar infers layout from directory shape (no permissive default)") {
    // a store staged by the intermediate r15 build wrote sidecars
    // WITHOUT the layout key; defaulting those to the append-able
    // layout would wave a bgrp append into a flat clustered store —
    // mixed directory layouts, every later reader fails discovery
    val flat = tmpDir("prelayout-flat") + "/sigs"
    Dedup.stageSignatures(docs(30), "doc_id", "text", flat, numFiles = 2)
    Layout.writeSidecar(spark, flat, Dedup.SigFormatName,
      """{"version":2,"sh":"array<bigint>","num_hashes":8,"bands":4,""" +
        """"shingle_size":3,"text_bytes":100}""")
    assert(Dedup.readSigFormat(spark, flat).get.layout == "bkey-clustered")
    intercept[IllegalStateException] {
      Dedup.appendSignatureBuckets(docs(5), "doc_id", "text", flat)
    }
    val buckets = tmpDir("prelayout-bkt") + "/sigs"
    Dedup.stageSignatureBuckets(docs(30), "doc_id", "text", buckets, nGroups = 2)
    Layout.writeSidecar(spark, buckets, Dedup.SigFormatName,
      """{"version":2,"sh":"array<bigint>","num_hashes":8,"bands":4,""" +
        """"shingle_size":3,"text_bytes":100}""")
    assert(Dedup.readSigFormat(spark, buckets).get.layout == "band-buckets")
    // and a truncated sidecar (regex would match a number's PREFIX) is
    // refused outright, never silently under-counted
    Layout.writeSidecar(spark, buckets, Dedup.SigFormatName,
      """{"version":2,"sh":"array<bigint>","num_hashes":8,"bands":4,""" +
        """"shingle_size":3,"text_bytes":52""")
    val e = intercept[IllegalStateException] {
      Dedup.readSigFormat(spark, buckets)
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("footer probe: suffix-free part files are priced; a corrupt file disqualifies, not throws") {
    // Hive/Impala-style part files carry no .parquet suffix — a name
    // filter would silently DROP them from the sweep (an under-counted
    // bound, the forbidden direction)
    val dir = tmpDir("suffixfree")
    docs(200).repartition(2).write.mode("overwrite").parquet(s"$dir/t")
    val d = new java.io.File(s"$dir/t")
    var i = 0
    for (f <- d.listFiles() if f.getName.endsWith(".parquet")) {
      assert(f.renameTo(new java.io.File(d, f"$i%06d_0"))); i += 1
    }
    val t = spark.read.parquet(s"$dir/t")
    val priced = ParquetStats.textBytesUpperBound(t, "text")
      .getOrElse(fail("suffix-free part files were not footer-priced"))
    assert(priced >= exactBytes(t))

    // a 0-byte crash leftover: the exact-scan fallback honors
    // ignoreCorruptFiles, so the metadata path must disqualify (None),
    // never abort the dedup call
    val dir2 = tmpDir("corrupt")
    docs(50).repartition(1).write.mode("overwrite").parquet(s"$dir2/t")
    new java.io.FileOutputStream(s"$dir2/t/part-zero.parquet").close()
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val back = spark.read.parquet(s"$dir2/t")
      assert(ParquetStats.textBytesUpperBound(back, "text").isEmpty,
        "an unreadable footer must disqualify the bound")
      assert(exactBytes(back) > 0) // the fallback the caller takes
    } finally spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
  }
}
