package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Metadata-priced text-volume probe (VERDICT r14 item 1): when a frame's
  * column traces straight to a parquet scan, `sum(octet_length(col))` can
  * be read from the files' FOOTERS — per-chunk `total_uncompressed_size` —
  * instead of scanning the data. At 100 TB that turns the LSH family's
  * regime probe (see [[graft.operators.Dedup]]'s textBytesCache: parquet
  * sizeInBytes stats under-count repetitive text 10–20×, so the budget
  * needs REAL bytes) from a corpus-wide column scan into a footer sweep.
  *
  * SAFETY — the bound must never under-count. The probe's two consumers
  * (expansion-stage re-spread sizing, the broadcast-vs-merge join gate)
  * are both safe under OVER-counting (more partitions / a denied
  * broadcast → merely slower) and both unsafe under UNDER-counting (a
  * corpus-sized broadcast HashedRelation — the exact OOM class the gate
  * exists to prevent). Footer accounting, per column chunk:
  *
  *  - BEST: parquet-format 2.10 `SizeStatistics.unencoded_byte_array_
  *    data_bytes` is the EXACT value-byte sum regardless of encoding
  *    (writers: parquet-mr ≥ 1.14, arrow ≥ 17 opt-in). Used when
  *    present and valid. Otherwise:
  *
  *  - PLAIN data pages: uncompressed size = Σ(len + 4-byte prefix) ≥ the
  *    true byte sum — a faithful ~2–3% over-count (measured on the
  *    driver corpus). DELTA_LENGTH_BYTE_ARRAY (v2 writer, dictionary
  *    off) concatenates every value's bytes verbatim and only
  *    delta-packs the lengths — also ≥ the true sum. These two are the
  *    WHITELIST.
  *  - DICTIONARY-encoded data pages: uncompressed size counts each
  *    DISTINCT value once plus RLE indices — measured 33,000× UNDER on a
  *    dictionary-collapsed repetitive fixture. DELTA_BYTE_ARRAY (the v2
  *    writer's dictionary-fallback for strings) prefix-shares
  *    consecutive values, so it under-counts on any corpus with shared
  *    prefixes (URLs, paths, sorted text). The chunk-level `encodings`
  *    set cannot even distinguish the dictionary cases (the dictionary
  *    page itself is PLAIN, so {PLAIN, RLE_DICTIONARY} appears either
  *    way); only `EncodingStats` records the DATA pages' value
  *    encodings. Any chunk whose data-page encodings are not all in the
  *    whitelist — or with no EncodingStats at all (writers that predate
  *    the thrift field) — disqualifies the whole probe: the caller
  *    falls back to the exact scan.
  *
  * Driver cost: footers are KB-sized; up to [[DriverFooterMax]] files
  * they are read on the driver (the bounded-driver-work shape the IVF
  * static-IN probe documents). Above that — a 100 TB corpus is ~10⁵–10⁶
  * files — the sweep runs as ONE Spark job over the file list, each task
  * reading footers only, so pricing scales with the cluster like any
  * other metadata pass.
  */
object ParquetStats {

  /** Files at or below this count are footer-swept on the driver; above
    * it the sweep is a Spark job. The system property lets tests force
    * the distributed path on a small fixture (env is fixed at JVM
    * launch; a property can be set per-test). */
  def DriverFooterMax: Int = {
    // each source parsed independently: a malformed knob must neither
    // throw from inside every dedup probe nor shadow the other,
    // still-valid source
    def parsed(v: Option[String]) = v.flatMap(_.trim.toIntOption).filter(_ > 0)
    parsed(sys.props.get("graft.footer.driver.max"))
      .orElse(parsed(sys.env.get("GRAFT_FOOTER_DRIVER_MAX")))
      .getOrElse(256)
  }

  /** An upper bound of `sum(octet_length(df(colName)))` priced purely
    * from parquet footers, or None when the lineage or the files' page
    * encodings make metadata pricing unsafe (caller then runs the exact
    * scan). `colName` must be an output column of `df`; it is traced
    * through row-preserving, value-preserving operators only (project
    * aliasing, subquery aliases, repartitions — NOT filters: a filter
    * keeps the bound valid but callers cache per-lineage, and pricing a
    * heavily-filtered frame at full-corpus bytes would deny the
    * broadcast regime everywhere, so filtered lineages take the exact
    * scan which prices what actually flows). */
  def textBytesUpperBound(df: DataFrame, colName: String): Option[Long] = {
    val plan = df.queryExecution.analyzed
    for {
      attr <- plan.output.find(_.name == colName)
      (rel, physName) <- traceToParquet(plan, attr)
      bytes <- footerColumnBytes(df.sparkSession, rel, physName)
    } yield bytes
  }

  /** Resolve `attr` down to (parquet relation, source column name), or
    * None if anything on the way could compute/alter values. */
  private def traceToParquet(plan: LogicalPlan,
      attr: Attribute): Option[(HadoopFsRelation, String)] = plan match {
    case p: Project =>
      p.projectList.find(_.exprId == attr.exprId).flatMap {
        case a: Alias => a.child match {
          case ar: AttributeReference => traceToParquet(p.child, ar)
          case _ => None // computed column — footer bytes don't apply
        }
        case ar: AttributeReference => traceToParquet(p.child, ar)
        case _ => None
      }
    case s: SubqueryAlias => traceToParquet(s.child, attr)
    case r: Repartition => traceToParquet(r.child, attr)
    // round-robin/hash repartition (Tables.spread's shape): row- and
    // value-preserving, partition expressions don't touch values
    case r: RepartitionByExpression => traceToParquet(r.child, attr)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
        l.output.find(_.exprId == attr.exprId).map(a => (fs, a.name))
      case _ => None
    }
    case _ => None
  }

  /** Sum of the named column's `total_uncompressed_size` across every
    * row group of every file, or None if any chunk has
    * dictionary-encoded data pages / missing EncodingStats (under-count
    * risk — see class doc). A file lacking the column entirely (schema
    * evolution) contributes 0: absent values have zero bytes. */
  private def footerColumnBytes(spark: org.apache.spark.sql.SparkSession,
      rel: HadoopFsRelation, colName: String): Option[Long] = {
    // every listed file participates — the file index already excludes
    // hidden (_, .) entries, and a name filter here (e.g. on a .parquet
    // suffix) would silently DROP Hive-style part files like 000000_0,
    // under-counting the bound: the one direction the contract forbids.
    // A listed file that is not readable parquet disqualifies the probe
    // in fileColumnBytes instead.
    val files = rel.location.inputFiles
    if (files.isEmpty) return Some(0L)
    val hconf = spark.sessionState.newHadoopConf()
    if (files.length <= DriverFooterMax) {
      val sums = files.iterator.map(fileColumnBytes(hconf, _, colName))
      foldDisqualifying(sums)
    } else {
      // one metadata job: each task reads only footers. The Hadoop conf
      // travels as a plain entry map (self-contained; no reliance on
      // spark-internal serializable wrappers) rebuilt over the
      // classpath defaults on each executor.
      import scala.jdk.CollectionConverters._
      val entries = hconf.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
      val col = colName
      val parts = math.min(files.length, 2048)
      val perFile = spark.sparkContext.parallelize(files.toSeq, parts)
        .mapPartitions { fs =>
          // one Configuration per task, not per file: rebuilding parses
          // the classpath defaults each time
          val c = new Configuration(true)
          entries.foreach { case (k, v) => c.set(k, v) }
          fs.map(fileColumnBytes(c, _, col))
        }
        .collect()
      foldDisqualifying(perFile.iterator)
    }
  }

  /** None short-circuits: one disqualified chunk kills the whole bound. */
  private def foldDisqualifying(sums: Iterator[Option[Long]]): Option[Long] = {
    var total = 0L
    while (sums.hasNext) sums.next() match {
      case Some(b) => total += b
      case None => return None
    }
    Some(total)
  }

  /** True iff every data page's VALUE encoding carries each value's
    * bytes in full, making `total_uncompressed_size` an upper bound of
    * the value-byte sum. Whitelist, not blacklist: PLAIN (len-prefixed
    * verbatim bytes) and DELTA_LENGTH_BYTE_ARRAY (verbatim bytes,
    * delta-packed lengths). Everything else under-counts or is
    * unknown-by-default — RLE_DICTIONARY/PLAIN_DICTIONARY collapse
    * repeats, DELTA_BYTE_ARRAY prefix-shares, and any future encoding
    * must prove itself in, not be assumed safe. */
  private def valueCompleteDataEncodings(
      es: org.apache.parquet.column.EncodingStats): Boolean = {
    import org.apache.parquet.column.Encoding._
    val it = es.getDataEncodings.iterator()
    var ok = true
    while (ok && it.hasNext) {
      val e = it.next()
      ok = (e == PLAIN) || (e == DELTA_LENGTH_BYTE_ARRAY)
    }
    ok
  }

  /** One file's footer contribution for `colName`; None = disqualified.
    * An unreadable footer (truncated write, 0-byte crash leftover)
    * disqualifies rather than throws: the exact-scan fallback honors
    * `spark.sql.files.ignoreCorruptFiles`, so a corrupt file the scan
    * would tolerate must not make the metadata fast-path abort the
    * whole dedup call. One retry first — on an object store a ~10⁵-file
    * sweep will see transient throttles, and a single blip should not
    * silently demote the whole probe to a corpus-wide scan — and the
    * terminal failure is logged with the file so a real corrupt file is
    * attributable. */
  private def fileColumnBytes(conf: Configuration, file: String,
      colName: String): Option[Long] = {
    def once(): Option[Long] = readFooterColumnBytes(conf, file, colName)
    try once() catch {
      case scala.util.control.NonFatal(_) =>
        try once() catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft] footer probe disqualified by " +
              s"$file after retry (${e.getClass.getSimpleName}: " +
              s"${e.getMessage}) — falling back to the exact scan")
            None
        }
    }
  }

  private def readFooterColumnBytes(conf: Configuration, file: String,
      colName: String): Option[Long] = {
    val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf)
    val reader = ParquetFileReader.open(in)
    try {
      var total = 0L
      var disqualified = false
      val rgs = reader.getFooter.getBlocks.iterator()
      while (!disqualified && rgs.hasNext) {
        val chunks = rgs.next().getColumns.iterator()
        while (!disqualified && chunks.hasNext) {
          val chunk = chunks.next()
          if (chunk.getPath.toDotString == colName) {
            // preferred: parquet-format 2.10 SizeStatistics records the
            // EXACT unencoded byte-array volume (= sum(octet_length),
            // nulls contributing 0) independent of page encoding
            val sz = chunk.getSizeStatistics
            val exact: Option[Long] =
              if (sz != null && sz.isValid) {
                val u = sz.getUnencodedByteArrayDataBytes
                if (u.isPresent) Some(u.get(): Long) else None
              } else None
            exact match {
              case Some(b) => total += b
              case None =>
                val es = chunk.getEncodingStats
                if (es == null || !valueCompleteDataEncodings(es))
                  disqualified = true
                else total += chunk.getTotalUncompressedSize
            }
          }
        }
      }
      if (disqualified) None else Some(total)
    } finally reader.close()
  }
}
