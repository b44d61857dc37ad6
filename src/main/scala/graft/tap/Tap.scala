package graft.tap

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Typed source/sink binding: (paths, format, options[, schema]) — the
  * Spark-native analog of the reference's `Tap` (a `[FilePath]` plus a
  * `Protocol` codec, /root/reference/src/Hadron/Controller.hs:334-338).
  *
  * Where hadron pairs paths with a byte-level codec (`Protocol`,
  * Protocol.hs:84-88), Spark pairs paths with a DataSource format whose
  * reader/writer already handles framing, compression and schema; the
  * `Protocol` catalog (lines/CSV/base64-binary/gzip, Protocol.hs:138-183)
  * collapses into `format` + `options`.
  *
  * Design for scale: a Tap is pure metadata — constructing one does no IO;
  * `read` produces a lazy DataFrame whose scan supports predicate pushdown
  * and column pruning (keep filters relational so they reach the scan).
  */
final case class Tap(
    paths: Seq[String],
    format: String = "parquet",
    options: Map[String, String] = Map.empty,
    schema: Option[StructType] = None) {

  def read(spark: SparkSession): DataFrame = {
    val r0 = spark.read.format(format).options(options)
    val r = schema.fold(r0)(r0.schema)
    r.load(paths: _*)
  }

  def write(df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(paths.size == 1, s"write target must be a single path, got $paths")
    df.write.format(format).options(options).mode(mode).save(paths.head)
  }

  /** Equality by location, like the reference (Controller.hs:342-343). */
  def sameLocation(other: Tap): Boolean = paths.toSet == other.paths.toSet

  /** The same binding as an unbounded source: files that appear under the
    * path after the query starts flow through incrementally. File stream
    * sources can't infer schemas, so one must be set. (No reference
    * analog — hadron is batch-only, SURVEY §2.8 — but the point of
    * sharing the Tap is that a batch pipeline re-binds to a stream
    * without rewriting its transforms.)
    */
  def readStream(spark: SparkSession): DataFrame = {
    require(paths.size == 1, s"stream source must be a single path, got $paths")
    require(schema.nonEmpty, "file stream sources require an explicit schema")
    spark.readStream.format(format).options(options)
      .schema(schema.get).load(paths.head)
  }

  /** Sink side of the stream binding: append-mode file sink with exactly-
    * once semantics via the checkpoint. Returns the running query.
    */
  def writeStream(
      df: DataFrame,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    require(paths.size == 1, s"stream sink must be a single path, got $paths")
    df.writeStream.format(format).options(options)
      .option("checkpointLocation", checkpointDir)
      .option("path", paths.head)
      .start()
  }
}

object Tap {
  def parquet(paths: String*): Tap = Tap(paths, "parquet")
  def csv(paths: String*): Tap =
    Tap(paths, "csv", Map("header" -> "true", "inferSchema" -> "true"))
  def text(paths: String*): Tap = Tap(paths, "text")
  def json(paths: String*): Tap = Tap(paths, "json")

  /** Columnar alternative to parquet for interop with ORC-based
    * warehouses (Spark-native reader/writer: predicate pushdown,
    * column pruning, and vectorized scan all apply, same as parquet).
    */
  def orc(paths: String*): Tap = Tap(paths, "orc")

  /** `binaryDirTap` analog (Controller.hs:701-707): read every file under a
    * directory matching a glob as (path, length, content) rows. Replaces the
    * reference's file-list-of-paths workaround for binary inputs
    * (`fileListTap`, Controller.hs:463-471) — Spark's binaryFile source
    * splits on files, never on newlines, so no workaround is needed.
    */
  def binaryDir(dir: String, glob: String = "*"): Tap =
    Tap(Seq(dir), "binaryFile", Map("pathGlobFilter" -> glob))

  /** `concatTaps` analog (Controller.hs:364-376): several same-schema taps
    * read as one DataFrame. Multi-path load keeps per-file parallelism and
    * partition pruning; per-TAP dispatch suffices when each tap owns its
    * paths — for mixed-format files interleaved in ONE directory (the
    * reference's per-FILE stem match) use [[concatByFile]].
    */
  def concat(spark: SparkSession, taps: Seq[Tap]): DataFrame = {
    require(taps.nonEmpty, "concat of zero taps")
    if (taps.map(t => (t.format, t.options, t.schema)).distinct.size == 1)
      taps.head.copy(paths = taps.flatMap(_.paths)).read(spark)
    else taps.map(_.read(spark)).reduce(_ unionByName _)
  }

  /** Per-FILE decoder dispatch within one directory — the exact
    * `concatTaps` case the reference implements by matching the CURRENT
    * FILENAME against each tap's location stem (Controller.hs:364-376)
    * to pick that file's decoder. Relationally: one load per tap with a
    * `pathGlobFilter`, unioned by name. The glob prunes at file-LISTING
    * time, so each decoder only ever opens its own files — same
    * dispatch, no driver-side file loop, and each side keeps its own
    * pushdown/pruning. Globs should partition the directory; a file
    * matching two globs is read twice (same as two reference taps
    * claiming one stem).
    */
  def concatByFile(
      spark: SparkSession,
      dir: String,
      tapsByGlob: Seq[(String, Tap)]): DataFrame = {
    require(tapsByGlob.nonEmpty, "concatByFile of zero taps")
    tapsByGlob.map { case (glob, t) =>
      t.copy(paths = Seq(dir),
        options = t.options + ("pathGlobFilter" -> glob)).read(spark)
    }.reduce(_ unionByName _)
  }

  /** `readTap` analog (Controller.hs:383-412): load a whole tap into
    * driver memory. Small data only — same caveat the reference's own
    * comment makes (:381-382); the retry/QSem machinery it needs for raw
    * HDFS cats is subsumed by Spark's task retries.
    */
  def readAll(spark: SparkSession, tap: Tap): Array[org.apache.spark.sql.Row] =
    tap.read(spark).collect()

  /** `fileListTap` analog (Controller.hs:463-471): the input is a text
    * file OF file paths; the data is whatever those paths hold. Hadron
    * needed this to keep Hadoop from newline-splitting binary files —
    * Spark's readers split on files, so this is just an indirection read.
    */
  def fromFileList(
      spark: SparkSession,
      listFile: String,
      format: String = "binaryFile"): DataFrame = {
    val paths = spark.read.textFile(listFile)
      .collect().map(_.trim).filter(_.nonEmpty)
    spark.read.format(format).load(paths.toIndexedSeq: _*)
  }

  /** Bucketed sink: pre-shuffle the data into `n` buckets on the join/
    * group key at WRITE time, so every later equi-join or aggregation on
    * that key runs with NO exchange — the co-located-join lever for
    * pipelines whose stages repeatedly meet on one key (no reference
    * analog; hadron re-shuffles every MR round). Bucketed tables live in
    * the session catalog (bucket metadata has to live somewhere; plain
    * parquet paths can't carry it).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // a dropped-but-undeleted location (e.g. a previous JVM's run) blocks
    // managed-table creation; clear both the catalog entry and the dir
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** `mergeTaps` analog (Controller.hs:422-439): two taps of different
    * schemas merged into one tagged union. Hadron dispatches per-file on
    * decode and per-record on encode; relationally this is a `side` tag
    * column + null-padded `unionByName` — downstream code filters on the tag
    * (the `Either` pattern) and Catalyst prunes the untouched columns.
    */
  def merge(
      spark: SparkSession,
      left: Tap,
      right: Tap,
      tagCol: String = "side"): DataFrame = {
    val l = left.read(spark).withColumn(tagCol, lit("left"))
    val r = right.read(spark).withColumn(tagCol, lit("right"))
    l.unionByName(r, allowMissingColumns = true)
  }

  /** `eitherProtocol` analog (/root/reference/src/Hadron/Protocol.hs:283-287:
    * try the left protocol's decoder per record, fall back to the right) —
    * per-RECORD fallback decode within one path, where `merge` dispatches
    * per-TAP. Each line is parsed against the left schema first, then the
    * right; "parses" = well-formed JSON that satisfies the schema's field
    * types (a malformed line or type clash trips the corrupt-record
    * column) AND materializes at least one declared field — JSON is
    * self-describing enough that "valid but none of the schema's fields
    * present" means the OTHER protocol, where hadron's binary decoders
    * simply failed. Rows that fit neither keep the raw line under tag
    * "corrupt" — the dead-letter residue hadron would have thrown as a
    * decode error mid-job (at 100 TB a single bad record must not kill
    * the run).
    *
    * All parsing is `from_json` Columns — codegen'd, pushed past the
    * scan, no UDF — and each schema is parsed EXACTLY ONCE per record:
    * the parsed structs materialize in a dedicated projection and every
    * downstream test (tag, field presence, output struct) references
    * those attributes. Catalyst keeps that projection separate precisely
    * because collapsing it would duplicate a non-cheap expression
    * (CollapseProject's reference-count guard), so the shape is stable
    * under optimization — TapSpec counts `from_json` in the optimized
    * plan to pin it. Output: (value, tag, left struct | null, right
    * struct | null).
    */
  def readEither(
      spark: SparkSession,
      lines: Tap,
      left: StructType,
      right: StructType,
      tagCol: String = "side"): DataFrame = {
    import org.apache.spark.sql.types.StringType
    require(left.fields.nonEmpty && right.fields.nonEmpty,
      "readEither schemas must declare at least one field")
    def parsed(s: StructType) =
      from_json(col("value"), s.add("_corrupt", StringType),
        Map("columnNameOfCorruptRecord" -> "_corrupt"))
    // ONE from_json per schema, materialized here; everything below
    // reads these attributes instead of re-parsing
    val base = lines.read(spark).select(
      col("value"), parsed(left).as("__l"), parsed(right).as("__r"))
    def ok(c: Column, s: StructType) =
      c.isNotNull && c("_corrupt").isNull &&
        s.fieldNames.map(f => c(f).isNotNull).reduce(_ || _)
    base
      .withColumn(tagCol,
        when(ok(col("__l"), left), lit("left"))
          .when(ok(col("__r"), right), lit("right"))
          .otherwise(lit("corrupt")))
      .select(
        col("value"),
        col(tagCol),
        when(col(tagCol) === "left", col("__l").dropFields("_corrupt"))
          .as("left"),
        when(col(tagCol) === "right", col("__r").dropFields("_corrupt"))
          .as("right"))
  }

  /** Write side of `mergeTaps` (Controller.hs:436-439: `enc` dispatches
    * per-record on Left/Right) — a merged tagged union routed back through
    * both taps, each side re-encoded with its own format. Hadron dispatches
    * record-at-a-time inside one conduit; relationally the dispatch is a
    * per-side filter + projection, which Catalyst pushes into the scan, so
    * each write reads only its own rows and columns.
    *
    * Each side's column set comes from the tap's explicit schema when set
    * (the heterogeneous-types case), else every non-tag column (the
    * homogeneous case). Round-trips `merge`: null-padded columns that the
    * union added are dropped again by the per-side projection.
    *
    * When a target tap overlaps the paths `df` is lazily reading from
    * (the in-place round-trip: merge a/b → writeMerged back to a/b), the
    * Overwrite would race its own scan — Spark rejects it with "Cannot
    * overwrite a path that is also being read from". That case is
    * detected from the plan's input files and the DataFrame is
    * materialized (localCheckpoint severs the lineage) before either
    * side writes. The checkpoint is a full materialization — fine for
    * the re-encode scale this mirrors (hadron rewrites the merged file
    * in place too); at corpus scale prefer fresh target paths, which
    * skip the checkpoint entirely.
    */
  def writeMerged(
      df: DataFrame,
      left: Tap,
      right: Tap,
      tagCol: String = "side",
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    def sideCols(t: Tap): Seq[String] =
      t.schema.map(_.fieldNames.toSeq)
        .getOrElse(df.columns.toSeq.filterNot(_ == tagCol))
    // fully qualify both sides (scheme + authority + absolute path)
    // before comparing: a bare-path match would see s3://bucket/x and
    // file:/x as the same location (spurious checkpoint) and would miss
    // a relative tap path against absolute inputFiles (missed
    // checkpoint → "Cannot overwrite a path that is also being read
    // from" at the write)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    def qualify(p: String): java.net.URI = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp).toUri
    }
    val targets = (left.paths ++ right.paths).map(qualify)
    val overlaps = df.inputFiles.exists { f =>
      val u = qualify(f)
      targets.exists(t =>
        t.getScheme == u.getScheme && t.getAuthority == u.getAuthority &&
          (u.getPath == t.getPath || u.getPath.startsWith(t.getPath + "/")))
    }
    val src = if (overlaps) df.localCheckpoint(true) else df
    left.write(
      src.filter(col(tagCol) === "left").select(sideCols(left).map(col): _*),
      mode)
    right.write(
      src.filter(col(tagCol) === "right").select(sideCols(right).map(col): _*),
      mode)
  }
}
