package graft.store

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native keyed upsert table — the Spark-first re-implementation of the
  * reference's Iceberg v2 upsert sink semantics
  * (flink_json_to_iceberg.py:61-91: `PRIMARY KEY … NOT ENFORCED`,
  * `'write.upsert.enabled'='true'`; connect-iceberg-sink.json:12-14,28-29:
  * auto-create, schema-evolve, upsert/delete by id-columns).
  *
  * Layout under `location`:
  * {{{
  *   data/v{N}/__bucket={b}/part-*.parquet   (files written by commit N)
  *   _snapshots/v{N}.json                    (manifest; current = max N)
  * }}}
  *
  * Scale design: rows are hash-bucketed by key. A merge only reads and
  * rewrites the buckets that contain batch keys — at 100 TB with e.g.
  * 4096 buckets, a small CDC batch touches a handful of buckets instead
  * of rewriting the table (the analog of Iceberg equality-delete
  * locality). Reads are plain vectorized parquet scans over the current
  * snapshot's file list, so Catalyst pushdown/pruning apply untouched.
  */
class UpsertTable(spark: SparkSession, val location: String) {
  import UpsertTable._

  private def root: Path = Paths.get(location)

  def exists: Boolean = SnapshotLog.current(location).isDefined

  def currentSnapshot: Option[Snapshot] = SnapshotLog.current(location)

  def schema: StructType =
    DataType.fromJson(snapshotOrFail.schemaJson).asInstanceOf[StructType]

  def keyCols: Seq[String] = snapshotOrFail.keyCols

  private def snapshotOrFail: Snapshot =
    currentSnapshot.getOrElse(
      throw new IllegalStateException(s"table does not exist: $location"))

  /** Explicit create (reference `CREATE TABLE IF NOT EXISTS`, py:61-75).
    * `numBuckets <= 0` (the default) resolves to the session conf
    * `graft.store.numBuckets`, falling back to [[UpsertTable.DefaultBuckets]] —
    * a 100 TB deployment sets the conf to 4096+ so a CDC batch rewrites
    * only a tiny fraction of the table.
    */
  def create(schema: StructType, keys: Seq[String],
      numBuckets: Int = 0): Unit = {
    val buckets =
      if (numBuckets > 0) numBuckets
      else spark.conf.getOption(BucketsConf).map(_.toInt).getOrElse(DefaultBuckets)
    require(keys.nonEmpty, "upsert table needs key columns")
    keys.foreach(k => require(schema.fieldNames.contains(k), s"missing key col $k"))
    if (exists) return
    Files.createDirectories(root)
    SnapshotLog.commit(location, Snapshot(
      version = 1L,
      schemaJson = allNullable(schema).json,
      keyCols = keys,
      numBuckets = buckets,
      files = Seq.empty,
      committed = Map.empty,
      timestampMs = System.currentTimeMillis(),
      operation = "create",
      lookupCols = spark.conf.getOption(LookupBloomsConf)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)))
  }

  /** Current-state read: a plain vectorized scan when the snapshot is
    * all base files; with deltas present (merge-on-read commits, see
    * [[merge]]'s `delta` flag) the base is overlaid with the delta
    * changelog by latest-`__seq`-per-key before tombstones drop.
    */
  def read(): DataFrame = readSnapshot(snapshotOrFail)

  /** Whether the current snapshot carries merge-on-read delta files
    * (readers need the overlay; [[compact]] restores pure base).
    */
  def hasDeltas: Boolean = hasDeltasAt(None)

  /** [[hasDeltas]] for a pinned version (time-travel reads). */
  def hasDeltasAt(version: Option[Long]): Boolean = {
    val snap = version.map(SnapshotLog.read(location, _)).getOrElse(snapshotOrFail)
    snap.files.exists(FileEntry.isDelta)
  }

  /** Time travel: read a specific committed version (Iceberg snapshot
    * read analog; enables the expiry semantics of snapshot_mgmt.py).
    */
  def readVersion(version: Long): DataFrame =
    readSnapshot(SnapshotLog.read(location, version))

  /** Merkle-style logical content fingerprints, one row per key
    * bucket: `(bucket, n_rows, fp)` where `fp` is the SUM of per-row
    * hash integers (60-bit md5 prefix of the row's sorted-column JSON)
    * as an exact decimal(38,0) — a commutative SET hash, so it is a
    * mergeable partial aggregate (scales like any groupBy at 100 TB),
    * layout-independent (same logical rows ⇒ same fp under any file
    * arrangement, compaction, or partitioning), and INCREMENTALLY
    * maintainable: fp(after) − fp(before) = Σ hash(new rows) −
    * Σ hash(replaced rows), which is how q371 audits a delta commit
    * in O(batch) instead of re-reading the table. The root (whole
    * table) fingerprint is the sum over buckets. Collision note: a
    * forged collision needs md5-prefix sums to match — fine for
    * corruption/drift AUDITS (the Iceberg manifest-checksum role),
    * not a cryptographic commitment.
    */
  def bucketFingerprints(version: Option[Long] = None): DataFrame = {
    val snap = version.map(SnapshotLog.read(location, _))
      .getOrElse(snapshotOrFail)
    val df = version.map(readVersion).getOrElse(read())
    df.withColumn("__rh", UpsertTable.rowFingerprint(df.columns))
      .withColumn("__b",
        UpsertTable.bucketExpr(snap.keyCols, snap.numBuckets))
      .groupBy(col("__b").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("cast(__rh as decimal(38,0))")).as("fp"))
  }

  /** Schema as of a committed version (time-travel reads). */
  def schemaAt(version: Long): StructType =
    DataType.fromJson(SnapshotLog.read(location, version).schemaJson)
      .asInstanceOf[StructType]

  /** Commit history, newest first: (version, operation, timestampMs) —
    * the DESCRIBE HISTORY surface. */
  def history(): Seq[(Long, String, Long)] =
    SnapshotLog.listVersions(location).reverse.map { v =>
      val s = SnapshotLog.read(location, v)
      (s.version, s.operation, s.timestampMs)
    }

  /** Incremental change feed (the Delta CDF / Iceberg incremental-scan
    * / Paimon changelog role): the exact row-level changes committed in
    * versions `(fromVersionExclusive, toVersionInclusive]`, as the data
    * columns plus `_change_op` (`u` upsert / `d` delete) and
    * `_commit_version`. This is what lets a downstream pipeline consume
    * a 100 TB table INCREMENTALLY — O(changed rows) per poll instead of
    * re-reading state.
    *
    * Served from the delta files each `delta`-merge recorded in its own
    * manifest, which stay readable after later compaction folds them
    * out of the current snapshot (until snapshot expiry deletes them —
    * the feed's retention window). Commits that rewrite state without
    * recording row-level deltas (full `merge`, `overwrite`, `rollback`)
    * make a range unservable and FAIL LOUDLY rather than return an
    * incomplete feed; layout-only commits (`compact` / `cluster` /
    * `rewrite` / `evolve` / `create`) are transparent. Rows are aligned
    * to the schema at `toVersionInclusive` (cast/null-fill across
    * evolution).
    */
  def readChanges(fromVersionExclusive: Long,
      toVersionInclusive: Long): DataFrame = {
    val targetSchema = schemaAt(toVersionInclusive)
    val frames = changeFeedEntries(fromVersionExclusive, toVersionInclusive)
      .map { case (v, s, deltas) =>
        val sch = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
        val deltaSchema = StructType(sch.fields ++ Seq(
          StructField(OpCol, StringType), StructField(SeqCol, LongType)))
        alignTypes(readFiles(deltas, deltaSchema), targetSchema)
          .select((targetSchema.fieldNames.map(col) :+
            // delta files hold the raw source op (Debezium r|c|u|d) —
            // normalize to the feed's documented u/d contract so
            // consumers filtering on "u" don't drop 'c' inserts
            when(col(OpCol) === "d", "d").otherwise("u").as("_change_op") :+
            lit(v).as("_commit_version")): _*)
      }
    frames.reduceOption(_ unionByName _).getOrElse {
      val empty = StructType(targetSchema.fields ++ Seq(
        StructField("_change_op", StringType),
        StructField("_commit_version", LongType)))
      spark.createDataFrame(java.util.Collections.emptyList[Row](), empty)
    }
  }

  /** The delta-file evidence serving a change feed over
    * `(fromVersionExclusive, toVersionInclusive]`: one (version,
    * snapshot, that commit's delta files) triple per contributing
    * commit, enforcing [[readChanges]]'s servability contract —
    * expired versions and data commits that recorded no row-level
    * deltas fail loudly; layout-only commits are transparent. Shared
    * by the batch [[readChanges]] and the streaming source
    * ([[graft.streaming.ChangeFeed]]), so both serve IDENTICAL feeds.
    */
  def changeFeedEntries(fromVersionExclusive: Long,
      toVersionInclusive: Long): Seq[(Long, Snapshot, Seq[FileEntry])] = {
    require(fromVersionExclusive < toVersionInclusive,
      s"need fromVersionExclusive < toVersionInclusive, got " +
        s"($fromVersionExclusive, $toVersionInclusive]")
    val present = SnapshotLog.listVersions(location).toSet
    val wanted = (fromVersionExclusive + 1) to toVersionInclusive
    val missing = wanted.filterNot(present)
    require(missing.isEmpty,
      s"change feed over ($fromVersionExclusive, $toVersionInclusive] " +
        s"unservable: version(s) ${missing.mkString(",")} expired")
    val layoutOnly = Set("compact", "cluster", "rewrite", "evolve", "create")
    wanted.toSeq.flatMap { v =>
      val s = SnapshotLog.read(location, v)
      val deltas = s.files.filter(f => FileEntry.isDelta(f) && f.seq == v)
      s.operation match {
        case "delta-merge" => Some((v, s, deltas))
        // manifests from before the operation field: trust the file
        // evidence — delta files recorded at v mean a delta commit
        case "" if deltas.nonEmpty => Some((v, s, deltas))
        case op if layoutOnly.contains(op) => None
        case "" if s.files.isEmpty => None // pre-field create
        case op => throw new IllegalStateException(
          s"change feed over ($fromVersionExclusive, $toVersionInclusive] " +
            s"unservable: v$v is a '$op' commit whose changes were not " +
            "recorded as row-level deltas")
      }
    }
  }

  /** Bucket id for a full primary-key value tuple, or None if any key
    * column is missing — the same murmur3(42) % n as [[UpsertTable.bucketExpr]],
    * evaluated driver-side (a literal hashes identically to a column).
    */
  def bucketFor(keyValues: Map[String, Any]): Option[Int] = {
    val snap = snapshotOrFail
    if (!snap.keyCols.forall(keyValues.contains)) return None
    val sch = schema
    val exprs = snap.keyCols.map { k =>
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(keyValues(k), sch(k).dataType)
    }
    val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(exprs)
      .eval(null).asInstanceOf[Int]
    Some(((h % snap.numBuckets) + snap.numBuckets) % snap.numBuckets)
  }

  /** Bucket-pruned read for a full-key equality lookup: touches only
    * the one bucket's files — at 4096 buckets a point query on a
    * 100 TB table scans ~1/4096 of it. The result still contains the
    * bucket's OTHER keys; callers (Spark's residual filter, through
    * the catalog) re-apply the predicate.
    */
  def readWhere(keyValues: Map[String, Any]): DataFrame =
    bucketFor(keyValues) match {
      case Some(b) =>
        val snap = snapshotOrFail
        mergedView(snap.files.filter(_.bucket == b), schema, snap.keyCols)
      case None => read()
    }

  /** The file subset a reverse lookup `column IN values` must read:
    * every DELTA file (recent commits — always kept, so tombstones and
    * re-keyed updates can never be skipped into staleness) plus the
    * BASE files whose Bloom filter admits at least one value (no bloom
    * recorded = kept). Bloom no-false-negatives makes the prune sound
    * unconditionally: a base key at most once per bucket means a
    * pruned base file can only hide row versions that either don't
    * match the lookup or are superseded by a delta that IS read.
    */
  def lookupFiles(column: String, values: Seq[Any]): Seq[FileEntry] = {
    val snap = snapshotOrFail
    snap.files.filter { f =>
      FileEntry.isDelta(f) || (f.blooms.get(column) match {
        case None => true
        case Some(b64) =>
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(
              java.util.Base64.getDecoder.decode(b64)))
          values.exists {
            case l: Long => bf.mightContainLong(l)
            case i: Int => bf.mightContainLong(i.toLong)
            case s: String => bf.mightContainString(s)
            case other => bf.mightContain(other)
          }
      })
    }
  }

  /** Reverse lookup by a declared secondary column (the GDPR
    * user→rows path): the merged current-state view restricted to
    * [[lookupFiles]] with the residual predicate re-applied — exactly
    * `read().where(column IN values)`, at the cost of the admitted
    * files instead of the table. At 100 TB with per-user blooms an
    * erasure request opens the handful of files that ever stored the
    * user, not the fact table.
    */
  def readLookup(column: String, values: Seq[Any]): DataFrame = {
    val snap = snapshotOrFail
    val sch = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    mergedView(lookupFiles(column, values), sch, snap.keyCols)
      .where(col(column).isin(values: _*))
  }

  /** Absolute data-file paths of a snapshot (current when `version` is
    * None), restricted to the single key bucket when a full
    * key-equality map is given, then skipped against each file's
    * manifest column bounds for the pushed `filters` (planning-time
    * data skipping; see [[FileStats]]) — feeds the catalog's DSv2
    * scan, which hands them straight to Spark's vectorized parquet
    * reader.
    */
  def dataFiles(version: Option[Long] = None,
      pruneKeys: Option[Map[String, Any]] = None,
      filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
      : Seq[String] = {
    val snap = version.map(SnapshotLog.read(location, _)).getOrElse(snapshotOrFail)
    val bucketed = pruneKeys.flatMap(bucketFor) match {
      case Some(b) => snap.files.filter(_.bucket == b)
      case None => snap.files
    }
    val sch = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val kept = bucketed.filter(f =>
      filters.forall(FileStats.mightMatch(f.stats, sch, _)))
    kept.map(f => s"$location/${f.path}")
  }

  private def readSnapshot(s: Snapshot): DataFrame = {
    val schema = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    mergedView(s.files, schema, s.keyCols)
  }

  /** Current-state view over a file subset: base files verbatim when
    * no deltas are present (the zero-overhead fast path — a single
    * vectorized scan); otherwise base ∪ deltas normalized to the
    * latest `__seq` per key (base rows rank 0, every delta carries its
    * committing version) with `d` tombstones dropped.
    *
    * The overlay is declarative — two parquet scans, a union, and a
    * `max_by` partial aggregation — so Catalyst plans it like any
    * query: key filters push through the aggregation into both scans,
    * and the shuffle is bounded by distinct keys per partition
    * (see [[ChangelogNormalize]]). This is the read tax merge-on-read
    * trades for O(batch) commits; [[compact]] pays it down.
    */
  private def mergedView(files: Seq[FileEntry], schema: StructType,
      keys: Seq[String]): DataFrame = {
    val (deltas, bases) = files.partition(FileEntry.isDelta)
    if (deltas.isEmpty) return readFiles(bases, schema)
    val deltaSchema = StructType(schema.fields ++ Seq(
      StructField(OpCol, StringType), StructField(SeqCol, LongType)))
    val base = readFiles(bases, schema)
      .withColumn(OpCol, lit("u")).withColumn(SeqCol, lit(0L))
    val delta = readFiles(deltas, deltaSchema)
    val latest = ChangelogNormalize.latestByKey(
      base.unionByName(delta), keys, SeqCol)
    latest.where(col(OpCol) =!= "d")
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  private def readFiles(files: Seq[FileEntry], schema: StructType): DataFrame =
    if (files.isEmpty) {
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    } else {
      // explicit schema: older files lacking newly-added columns yield
      // nulls — additive evolution without rewrites
      spark.read.schema(schema).parquet(files.map(f => s"$location/${f.path}"): _*)
    }

  /** CDC/upsert merge of one micro-batch (SURVEY.md §2.3 C1/C2/C4).
    *
    * @param batch    rows holding the table's data columns (+ opCol/orderCol)
    * @param opCol    optional column with Debezium ops `r|c|u|d`; `d`
    *                 removes the key, anything else upserts. None = all upserts.
    * @param orderCol optional column giving arrival order inside the
    *                 batch (offset/LSN); highest wins per key. None is
    *                 only valid when every key appears at most once in
    *                 the batch (validated) — with duplicate keys and no
    *                 order, "last wins" would be partition-order
    *                 dependent and silently nondeterministic at scale.
    * @param streamId/batchId exactly-once replay guard: a (streamId,
    *                 batchId) at or below the recorded watermark is a
    *                 no-op (reference checkpoint/commit cycle, C4).
    * @param autoCreateKeys create the table from the batch schema with
    *                 these keys if absent (sink auto-create, S6).
    * @param delta    merge-on-read commit: append the normalized batch
    *                 as per-bucket DELTA files (O(batch) write — no
    *                 bucket rewrite) instead of rewriting affected
    *                 buckets. Readers overlay deltas by latest
    *                 `__seq` per key; [[compact]] collapses them back
    *                 into base. This is how a 10 s-cadence stream over
    *                 random keys avoids rewriting the whole table
    *                 every commit at 100 TB (the Iceberg-v2
    *                 equality-delete / Paimon changelog pattern the
    *                 reference sink relies on). A widening the parquet
    *                 reader cannot serve falls back to the full
    *                 rewrite (the manifest schema must stay readable
    *                 over every live file).
    */
  def merge(
      batch: DataFrame,
      opCol: Option[String] = None,
      orderCol: Option[String] = None,
      streamId: Option[String] = None,
      batchId: Option[Long] = None,
      autoCreateKeys: Seq[String] = Seq.empty,
      autoCreateBuckets: Int = 0,
      delta: Boolean = false): Unit = synchronized {
    val metaCols = opCol.toSeq ++ orderCol.toSeq
    val batchDataSchema = StructType(
      batch.schema.fields.filterNot(f => metaCols.contains(f.name)))

    if (!exists) {
      require(autoCreateKeys.nonEmpty,
        s"table $location does not exist and no autoCreateKeys given")
      create(batchDataSchema, autoCreateKeys, autoCreateBuckets)
    }
    val snap = snapshotOrFail

    // exactly-once: replayed micro-batches are no-ops (C4)
    val replayed = for {
      sid <- streamId; bid <- batchId; last <- snap.committed.get(sid)
    } yield bid <= last
    if (replayed.contains(true)) return

    // schema evolution (S6): additive columns; numeric widening;
    // anything else incompatible is rejected
    val oldSchema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val (newSchema, _) = evolve(oldSchema, batchDataSchema)
    val dataCols = newSchema.fieldNames.toSeq

    // align batch to evolved schema (missing cols → null, widen casts);
    // opCol/orderCol meta columns ride along untouched
    val aligned0 = alignTypes(batch, newSchema)
    // in-batch changelog-normalize: last row per key wins (C1), as a
    // max_by aggregation, not a row_number window: partial
    // aggregation bounds the shuffle by distinct keys and keeps
    // skewed keys parallel (see ChangelogNormalize). Without an order
    // column there is no defined arrival order, so duplicate keys in
    // the batch are an error rather than a partition-order-dependent
    // coin flip — detected via the __cnt that rides the SAME
    // aggregation (checked against the cached result below), not a
    // second full-batch shuffle.
    val pre = aligned0
      .withColumn("__ord", orderCol.map(col).getOrElse(lit(0L)))
      .withColumn("__op", opCol.map(col).getOrElse(lit("u")))
      .select((dataCols.map(col) :+ col("__op") :+ col("__ord")): _*)
    val counted = ChangelogNormalize
      .latestByKey(pre, snap.keyCols, "__ord", withCount = orderCol.isEmpty)
      .cache()
    val normalized =
      if (orderCol.isEmpty) counted.drop("__cnt") else counted

    try {
      if (orderCol.isEmpty)
        require(counted.where(col("__cnt") > 1).limit(1).count() == 0L,
          s"batch has duplicate keys for $location but no orderCol; " +
            "pass orderCol so last-wins is deterministic")
      val bucketOf = bucketExpr(snap.keyCols, snap.numBuckets)

      // buckets touched by this batch — bounded by numBuckets, safe to
      // collect. A READ-PROMOTABLE widening does not touch extra
      // buckets: files in untouched buckets keep their narrow physical
      // type and are served by cast-on-read under the manifest schema;
      // the physical rewrite is deferred to [[rewriteData]]
      // maintenance. A 100 TB table therefore absorbs an int→long
      // evolution without a full rewrite inside a merge commit. Only a
      // widening the parquet reader cannot serve (long→double) still
      // forces the full rewrite — the manifest schema must stay
      // readable over every live file.
      val unservableWiden = oldSchema.fields.exists { f =>
        newSchema.fields.find(_.name == f.name).exists(nf =>
          nf.dataType != f.dataType && !promotableOnRead(f.dataType, nf.dataType))
      }
      val affected: Set[Int] =
        if (unservableWiden) (0 until snap.numBuckets).toSet
        else normalized.select(bucketOf.as("b")).distinct()
          .collect().map(_.getInt(0)).toSet

      val version = snap.version + 1
      // unique per-attempt dir: a racing/crashed writer can never
      // clobber files another attempt already committed (the manifest
      // references only its own attempt's paths; losers leave orphans
      // that never become visible)
      val outDir = s"$location/data/v$version-$attemptId"

      if (delta && !unservableWiden) {
        // merge-on-read commit: write ONLY the normalized batch, as
        // per-bucket delta files carrying the op and this commit's
        // sequence — existing files are untouched, so the write cost
        // is O(batch) regardless of how many buckets the keys span
        normalized.withColumn(SeqCol, lit(version))
          .withColumn("__bucket", bucketOf)
          .repartition(math.max(affected.size, 1), col("__bucket"))
          .sortWithinPartitions(col("__bucket") +: snap.keyCols.map(col): _*)
          .write.partitionBy("__bucket").mode("overwrite").parquet(outDir)
        val newFiles = newFileEntries(outDir, newSchema)
          .map(_.copy(kind = FileEntry.Delta, seq = version))
        SnapshotLog.commit(location, snap.copy(
          version = version,
          schemaJson = newSchema.json,
          files = snap.files ++ newFiles,
          committed = snap.committed ++
            (for { s <- streamId; b <- batchId } yield s -> b),
          timestampMs = System.currentTimeMillis(),
          operation = "delta-merge"))
        return
      }

      val (oldAffected, untouched) = snap.files.partition(f => affected(f.bucket))
      // current-state view of the rewritten buckets under the OLD
      // manifest schema (every live file is promotable-readable under
      // it by invariant; pending deltas in these buckets are overlaid
      // and absorbed by this rewrite), then align-cast to the evolved
      // schema
      val oldDf = align(mergedView(oldAffected, oldSchema, snap.keyCols), newSchema)

      // keys present in the batch replace (or delete) stored rows
      val batchKeys = normalized.select(snap.keyCols.map(col): _*)
      val survivors = oldDf.join(batchKeys, snap.keyCols, "left_anti")
      val upserts = normalized.where(col("__op") =!= "d").select(dataCols.map(col): _*)

      val out = survivors.unionByName(upserts)
        .withColumn("__bucket", bucketOf)
      // sortWithinPartitions on (__bucket, keys): no extra shuffle, but
      // data files get key-clustered row groups, so parquet min/max
      // stats prune key-range scans inside a bucket too; __bucket leads
      // so the writer's partition ordering is satisfied and it never
      // inserts its own (unstable) re-sort
      out.repartition(math.max(affected.size, 1), col("__bucket"))
        .sortWithinPartitions(col("__bucket") +: snap.keyCols.map(col): _*)
        .write.partitionBy("__bucket").mode("overwrite").parquet(outDir)

      val newFiles = newFileEntries(outDir, newSchema)

      SnapshotLog.commit(location, snap.copy(
        version = version,
        schemaJson = newSchema.json,
        files = untouched ++ newFiles,
        committed = snap.committed ++
          (for { s <- streamId; b <- batchId } yield s -> b),
        timestampMs = System.currentTimeMillis(),
        operation = "merge"))
    } finally counted.unpersist()
  }

  /** Rewrite the table under a new bucket count (the growth path:
    * a table created at 16 buckets that reaches terabytes moves to
    * 4096 so merges keep touching a sliver). One full rewrite — like
    * Iceberg's rewrite with a new partition spec — committed as a
    * normal snapshot, so readers never see a half-rebucketed table
    * and time travel still works across the boundary.
    */
  def rebucket(newNumBuckets: Int): Unit = synchronized {
    require(newNumBuckets > 0, "bucket count must be positive")
    val snap = snapshotOrFail
    if (snap.numBuckets == newNumBuckets) return
    rewriteAll(snap, newNumBuckets)
  }

  /** Maintenance rewrite of every data file under the current manifest
    * schema and bucket count: completes deferred widening (files whose
    * physical types are narrower than the manifest, served by
    * cast-on-read until now) and compacts accumulated small files.
    * A normal snapshot commit — concurrent readers and time travel are
    * never disturbed.
    */
  def rewriteData(): Unit = synchronized {
    rewriteAll(snapshotOrFail, snapshotOrFail.numBuckets)
  }

  /** Targeted compaction: collapse ONLY the buckets holding more than
    * `maxFilesPerBucket` files back into a single tombstone-free base
    * file each, leaving every other bucket's manifest entries
    * untouched. Returns the number of buckets compacted.
    *
    * This is the pay-down half of merge-on-read: each delta commit
    * (reference cadence: one per 10 s checkpoint,
    * flink_json_to_iceberg.py:89) adds a file per touched bucket, so
    * read overlays deepen until maintenance folds base ∪ deltas into
    * base — Iceberg's binpack rewrite with a file-count filter, or
    * Paimon's full-compaction trigger. The default threshold 1 means
    * "restore every bucket to scan-optimal"; a steady-state pipeline
    * passes e.g. 4 to amortize. Cost is proportional to the
    * over-threshold buckets only — never a 100 TB table rewrite.
    * Committed as a normal snapshot: concurrent readers keep their
    * pinned file lists and prior versions stay time-travelable.
    */
  def compact(maxFilesPerBucket: Int = 1): Int = synchronized {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    val snap = snapshotOrFail
    val over = snap.files.groupBy(_.bucket)
      .collect { case (b, fs) if fs.size > maxFilesPerBucket => b }.toSet
    if (over.isEmpty) return 0
    val (toRewrite, untouched) = snap.files.partition(f => over(f.bucket))
    val sch = schema
    val version = snap.version + 1
    val outDir = s"$location/data/v$version-$attemptId"
    // current-state view of just those buckets (delta overlay applied,
    // tombstones dropped), written back bucket-partitioned
    mergedView(toRewrite, sch, snap.keyCols)
      .withColumn("__bucket", bucketExpr(snap.keyCols, snap.numBuckets))
      .repartition(over.size, col("__bucket"))
      // __bucket first: satisfies the writer's partition ordering so no
      // unstable re-sort is inserted and key clustering survives
      .sortWithinPartitions(col("__bucket") +: snap.keyCols.map(col): _*)
      .write.partitionBy("__bucket").mode("overwrite").parquet(outDir)
    SnapshotLog.commit(location, snap.copy(
      version = version,
      files = untouched ++ newFileEntries(outDir, sch),
      timestampMs = System.currentTimeMillis(),
      operation = "compact"))
    over.size
  }

  /** Z-order clustering rewrite: re-lay every bucket's data along the
    * Morton curve of `zCols` and split it into ≤ `maxRowsPerFile`-row
    * files, so each file covers a narrow range of EVERY clustered
    * column and [[FileStats]] skipping prunes scans by predicates on
    * any of them — the layout-optimization maintenance pass next to
    * [[compact]] (Delta OPTIMIZE ZORDER / Iceberg sort-order rewrite).
    *
    * Key-bucket partitioning is preserved (point lookups and the merge
    * path are untouched); only the order WITHIN buckets and the file
    * split change. Committed as a normal snapshot — readers and time
    * travel undisturbed. The min/max stats pass collects 2·|zCols|
    * scalars on the driver (bounded, like the affected-bucket set).
    */
  def cluster(zCols: Seq[String], maxRowsPerFile: Long = 1L << 20): Unit =
    synchronized {
      require(zCols.nonEmpty, "cluster needs at least one column")
      require(maxRowsPerFile > 0, "maxRowsPerFile must be positive")
      val snap = snapshotOrFail
      val sch = schema
      zCols.foreach(c => require(sch.fieldNames.contains(c),
        s"no such column to cluster by: $c"))
      val df = read()
      val statAggs = zCols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
      val statsRow = df.agg(statAggs.head, statAggs.tail: _*).head()
      def d(i: Int): Double =
        if (statsRow.isNullAt(i)) 0d else statsRow.getDouble(i)
      val mins = zCols.indices.map(i => d(2 * i))
      val maxs = zCols.indices.map(i => d(2 * i + 1))
      val z = ZOrder.zValue(zCols.map(col), mins, maxs)
      val version = snap.version + 1
      val outDir = s"$location/data/v$version-$attemptId"
      df.withColumn("__bucket", bucketExpr(snap.keyCols, snap.numBuckets))
        .withColumn("__z", z)
        .repartition(snap.numBuckets, col("__bucket"))
        // __bucket leads the sort so the writer's required partition
        // ordering is already satisfied — otherwise FileFormatWriter
        // inserts its own (unstable) sort on __bucket and the z order
        // inside each bucket is lost
        .sortWithinPartitions(col("__bucket"), col("__z"))
        .drop("__z")
        .write.partitionBy("__bucket")
        .option("maxRecordsPerFile", maxRowsPerFile)
        .mode("overwrite").parquet(outDir)
      SnapshotLog.commit(location, snap.copy(
        version = version,
        files = newFileEntries(outDir, sch),
        timestampMs = System.currentTimeMillis(),
        operation = "cluster"))
    }

  private def rewriteAll(snap: Snapshot, numBuckets: Int): Unit =
    commitRewrite(snap, numBuckets, schema, read())

  private def commitRewrite(snap: Snapshot, numBuckets: Int,
      schema: StructType, df: DataFrame,
      operation: String = "rewrite"): Unit = {
    val bucketOf = bucketExpr(snap.keyCols, numBuckets)
    val version = snap.version + 1
    val outDir = s"$location/data/v$version-$attemptId"
    df.withColumn("__bucket", bucketOf)
      .repartition(numBuckets, col("__bucket"))
      // __bucket first: see compact — keeps the writer from re-sorting
      .sortWithinPartitions(col("__bucket") +: snap.keyCols.map(col): _*)
      .write.partitionBy("__bucket").mode("overwrite").parquet(outDir)
    val newFiles = newFileEntries(outDir, schema)
    SnapshotLog.commit(location, snap.copy(
      version = version,
      schemaJson = schema.json,
      numBuckets = numBuckets,
      files = newFiles,
      timestampMs = System.currentTimeMillis(),
      operation = operation))
  }

  /** DDL-driven schema evolution (`ALTER TABLE … ADD COLUMN` / type
    * widening, reference connect-iceberg-sink.json:14 evolve mode as
    * SQL): commits a MANIFEST-ONLY snapshot under the evolved schema —
    * no data rewrite — whenever the parquet reader can serve existing
    * files by cast-on-read (added columns → null; int→long,
    * int→double, float→double promotions). Only a read-unservable
    * widening (long→double) rewrites the data in the same commit, so
    * the manifest schema always stays readable over every live file.
    */
  def evolveSchema(incoming: StructType): Unit = synchronized {
    val snap = snapshotOrFail
    val old = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val (newSchema, _) = evolve(old, incoming)
    if (newSchema == old) return
    val unservable = old.fields.exists { f =>
      newSchema.fields.find(_.name == f.name).exists(nf =>
        nf.dataType != f.dataType && !promotableOnRead(f.dataType, nf.dataType))
    }
    if (unservable)
      commitRewrite(snap, snap.numBuckets, newSchema,
        align(readFiles(snap.files, old), newSchema), operation = "evolve")
    else
      SnapshotLog.commit(location, snap.copy(
        version = snap.version + 1,
        schemaJson = newSchema.json,
        timestampMs = System.currentTimeMillis(),
        operation = "evolve"))
  }

  /** Align a frame's columns to `schema` types: missing columns become
    * typed nulls, differing (wider) types are cast. Extra columns
    * (merge meta like op/order) are preserved. Struct columns align
    * recursively — Spark's `cast` refuses struct→struct with
    * different field counts, so a batch missing an evolved-in nested
    * field is rebuilt field-by-field with typed nulls instead.
    */
  private def alignTypes(df: DataFrame, schema: StructType): DataFrame =
    schema.fields.foldLeft(df) { (d, f) =>
      if (!d.columns.contains(f.name)) d.withColumn(f.name, lit(null).cast(f.dataType))
      else if (d.schema(f.name).dataType != f.dataType)
        d.withColumn(f.name,
          alignExpr(col(f.name), d.schema(f.name).dataType, f.dataType))
      else d
    }

  /** Recursive alignment of one column to a (wider) target type. */
  private def alignExpr(cur: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (f, t) if f == t => cur
      case (fs: StructType, ts: StructType) =>
        val rebuilt = struct(ts.fields.toSeq.map { tf =>
          fs.fields.find(_.name == tf.name) match {
            case Some(ff) =>
              alignExpr(cur.getField(tf.name), ff.dataType, tf.dataType)
                .as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }: _*)
        // struct() of a null parent would yield a struct of nulls —
        // preserve the parent's own nullness
        when(cur.isNull, lit(null).cast(to)).otherwise(rebuilt)
      case (ArrayType(fe, _), ArrayType(te, _)) =>
        transform(cur, x => alignExpr(x, fe, te))
      case (_, t) => cur.cast(t)
    }

  /** [[alignTypes]] plus projection to exactly `schema`'s columns. */
  private def align(df: DataFrame, schema: StructType): DataFrame =
    alignTypes(df, schema).select(schema.fieldNames.map(col).toSeq: _*)

  /** Truncate-commit (SQL `INSERT OVERWRITE`): the new snapshot
    * references only the inserted rows' files, so the table becomes
    * exactly `batch` while every prior snapshot stays time-travelable
    * until expiry. Duplicate keys in the batch are rejected — an
    * overwrite carries no arrival order to break ties with.
    */
  def overwrite(batch: DataFrame): Unit = synchronized {
    val snap = snapshotOrFail
    val oldSchema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val (newSchema, _) = evolve(oldSchema, batch.schema)
    val aligned = align(batch, newSchema)
    val dups = aligned.groupBy(snap.keyCols.map(col): _*)
      .count().where(col("count") > 1).limit(1).count()
    require(dups == 0L,
      s"INSERT OVERWRITE batch has duplicate keys for $location")
    val bucketOf = bucketExpr(snap.keyCols, snap.numBuckets)
    val version = snap.version + 1
    val outDir = s"$location/data/v$version-$attemptId"
    aligned.withColumn("__bucket", bucketOf)
      .repartition(snap.numBuckets, col("__bucket"))
      .sortWithinPartitions(col("__bucket") +: snap.keyCols.map(col): _*)
      .write.partitionBy("__bucket").mode("overwrite").parquet(outDir)
    val newFiles = newFileEntries(outDir, newSchema)
    SnapshotLog.commit(location, snap.copy(
      version = version,
      schemaJson = newSchema.json,
      files = newFiles,
      timestampMs = System.currentTimeMillis(),
      operation = "overwrite"))
  }

  /** Roll the table back to an earlier version — as a NEW commit whose
    * file list is the target snapshot's (Iceberg's
    * `rollback_to_snapshot` procedure, the recovery move after a
    * bad-data incident). History is preserved: the bad versions stay
    * time-travelable until expiry, and the rollback itself is one more
    * manifest entry — no data files move. The current `committed`
    * (streamId → batchId) replay guards are carried FORWARD, not rolled
    * back: a restarted streaming writer must still no-op batches it
    * already applied, or exactly-once breaks the moment someone rolls
    * back under a live stream.
    */
  def rollback(toVersion: Long): Unit = synchronized {
    val cur = snapshotOrFail
    require(toVersion < cur.version,
      s"rollback target v$toVersion is not before current v${cur.version}")
    require(SnapshotLog.listVersions(location).contains(toVersion),
      s"rollback target v$toVersion does not exist (expired?) for $location")
    val target = SnapshotLog.read(location, toVersion)
    val missing = target.files.filterNot(f => Files.exists(root.resolve(f.path)))
    require(missing.isEmpty,
      s"cannot roll back to v$toVersion: ${missing.size} data file(s) " +
        s"already expired, e.g. ${missing.headOption.map(_.path).getOrElse("")}")
    SnapshotLog.commit(location, target.copy(
      version = cur.version + 1,
      committed = cur.committed,
      timestampMs = System.currentTimeMillis(),
      operation = "rollback"))
  }

  /** Orphan-file GC (the `remove_orphan_files` half of warehouse
    * maintenance, next to [[expireSnapshots]]): delete data files on
    * disk that NO snapshot in the log references — the leftovers of
    * commit attempts that lost the atomic-exclusive publish race or
    * crashed between writing data and publishing the manifest. Only
    * files older than `olderThanMs` are touched: an in-flight
    * attempt's freshly written files must survive until its publish
    * or loss is decided, so the retention has to exceed the LONGEST
    * plausible commit write. The default is 3 days — Iceberg's
    * `remove_orphan_files` default, chosen for exactly this hazard —
    * and retentions under 24 h are refused unless
    * `allowShortRetention = true` is passed explicitly (at 100 TB a
    * multi-hour data write is routine; GC'ing its files mid-commit
    * corrupts the snapshot it is about to publish). Empty
    * attempt/bucket directories are pruned. Returns the deleted
    * manifest-relative paths.
    */
  def removeOrphanFiles(olderThanMs: Long = OrphanGcDefaultMs,
      allowShortRetention: Boolean = false): Seq[String] =
    synchronized {
      require(olderThanMs >= OrphanGcMinMs || allowShortRetention,
        s"orphan GC retention ${olderThanMs}ms is under 24h — an " +
          "in-flight commit's files could be deleted before its " +
          "manifest publishes; pass allowShortRetention = true to " +
          "override (tests/teardown only)")
      val live: Set[String] = SnapshotLog.listVersions(location)
        .flatMap(v => SnapshotLog.read(location, v).files.map(_.path)).toSet
      val dataRoot = root.resolve("data")
      val cutoff = System.currentTimeMillis() - olderThanMs
      val deleted = scala.collection.mutable.ListBuffer.empty[String]
      graft.Fs.children(dataRoot).foreach { cdir =>
        graft.Fs.children(cdir).filter(Files.isDirectory(_)).foreach { bdir =>
          graft.Fs.children(bdir).foreach { f =>
            val rel = root.relativize(f).toString
            if (f.getFileName.toString.endsWith(".parquet") && !live(rel) &&
                Files.getLastModifiedTime(f).toMillis < cutoff) {
              Files.deleteIfExists(f)
              deleted += rel
            }
          }
          if (graft.Fs.children(bdir).isEmpty) Files.deleteIfExists(bdir)
        }
        if (graft.Fs.children(cdir).isEmpty) Files.deleteIfExists(cdir)
      }
      deleted.toList.sorted
    }

  // ---- Named refs: Iceberg-style tags + the WAP publish branch ----

  /** Immutable named pin of a committed version (Iceberg tag). Fails
    * if the name exists — tags never move; [[dropRef]] removes them.
    */
  def createTag(name: String, version: Option[Long] = None): Unit =
    synchronized { writeRef(name, "tag", version, mustBeNew = true) }

  /** Fast-forwardable named pointer (Iceberg branch). The WAP shape:
    * writers advance the table HEAD commit by commit; readers consume
    * a branch ref (e.g. "main") that [[fastForward]] advances only
    * after the audit passes — unpublished commits stay visible to the
    * auditor on the head, invisible through the ref, and nothing is
    * ever rolled back (q348 shows the rollback WAP style; this is the
    * branch style). O(1) metadata either way.
    */
  def createBranch(name: String, version: Option[Long] = None): Unit =
    synchronized { writeRef(name, "branch", version, mustBeNew = true) }

  private def writeRef(name: String, kind: String, version: Option[Long],
      mustBeNew: Boolean): Unit = {
    require(!mustBeNew || RefLog.read(location, name).isEmpty,
      s"ref '$name' already exists for $location")
    val v = version.getOrElse(snapshotOrFail.version)
    require(SnapshotLog.listVersions(location).contains(v),
      s"ref '$name' target v$v does not exist for $location")
    RefLog.write(location, TableRef(name, kind, v))
  }

  /** All named refs, sorted by name. */
  def refs(): Seq[TableRef] = RefLog.list(location)

  /** Time-travel read through a named ref. */
  def readRef(name: String): DataFrame =
    readVersion(refOrFail(name).version)

  /** Version a ref currently pins. */
  def refVersion(name: String): Long = refOrFail(name).version

  private def refOrFail(name: String): TableRef =
    RefLog.read(location, name).getOrElse(
      throw new IllegalStateException(s"no ref '$name' for $location"))

  /** Advance a BRANCH ref to a later committed version (default: the
    * current head) — the WAP publish step. Tags refuse; moving
    * backward refuses (that is what [[rollback]] + a fresh ref are
    * for, keeping publish history monotonic).
    */
  def fastForward(name: String, toVersion: Option[Long] = None): Unit =
    synchronized {
      val ref = refOrFail(name)
      require(ref.kind == "branch",
        s"ref '$name' is a ${ref.kind} — tags are immutable")
      val to = toVersion.getOrElse(snapshotOrFail.version)
      require(to >= ref.version,
        s"fast-forward of '$name' to v$to would move backward " +
          s"from v${ref.version}")
      require(SnapshotLog.listVersions(location).contains(to),
        s"fast-forward target v$to does not exist for $location")
      RefLog.write(location, ref.copy(version = to))
    }

  /** Remove a ref (tag or branch); its pinned version becomes
    * expirable again. Returns whether it existed.
    */
  def dropRef(name: String): Boolean =
    synchronized { RefLog.delete(location, name) }

  /** Snapshot expiry (C6; reference snapshot_mgmt.py:17-18
    * `expire_snapshots(retention_threshold => '6h')`): drop manifests
    * older than the retention (never the current one, never a version
    * pinned by a named ref — the Iceberg rule that makes tags/branches
    * safe against maintenance) and delete data files no remaining
    * manifest references.
    */
  def expireSnapshots(retentionMs: Long): Unit = synchronized {
    val versions = SnapshotLog.listVersions(location)
    if (versions.size <= 1) return
    val cutoff = System.currentTimeMillis() - retentionMs
    val pinned = RefLog.list(location).map(_.version).toSet
    val (latest, older) = (versions.last, versions.init)
    val expired = older.filter(v => !pinned(v) &&
      SnapshotLog.read(location, v).timestampMs < cutoff)
    if (expired.isEmpty) return
    val live = (versions.diff(expired)).map(SnapshotLog.read(location, _))
    val liveFiles = live.flatMap(_.files.map(_.path)).toSet
    expired.foreach { v =>
      SnapshotLog.read(location, v).files
        .filterNot(f => liveFiles(f.path))
        .foreach(f => Files.deleteIfExists(root.resolve(f.path)))
      SnapshotLog.delete(location, v)
    }
  }

  private def attemptId: String =
    java.util.UUID.randomUUID().toString.take(8)

  private def listBucketFiles(outDir: String): Seq[(String, Int)] =
    graft.Fs.children(Paths.get(outDir))
      .filter(p => p.getFileName.toString.startsWith("__bucket="))
      .flatMap { bdir =>
        val b = bdir.getFileName.toString.stripPrefix("__bucket=").toInt
        graft.Fs.children(bdir)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => (s"${bdir.getFileName}/${f.getFileName}", b))
      }

  /** Manifest entries for a commit's freshly written files, with
    * column bounds harvested from each footer (metadata-only reads,
    * bounded by the commit's own file count) and, for declared lookup
    * columns, a per-file Bloom filter (one single-column scan of each
    * freshly written file — the same bounded-by-the-commit cost class
    * as the footer reads; Iceberg pays it in the same place for its
    * puffin blobs).
    */
  private def newFileEntries(outDir: String, schema: StructType): Seq[FileEntry] = {
    val conf = spark.sessionState.newHadoopConf()
    val lookups = effectiveLookupCols(schema)
    val files = listBucketFiles(outDir)
    val blooms = collectBlooms(outDir, files.map(_._1), lookups)
    files.map { case (rel, b) =>
      FileEntry(outDir.stripPrefix(s"$location/") + s"/$rel", b,
        FileStats.collect(conf, s"$outDir/$rel", schema),
        blooms = blooms.getOrElse(rel, Map.empty))
    }
  }

  /** Declared lookup columns present in `schema` at a bloomable type:
    * the manifest's persisted declaration plus any session-conf
    * additions (so an existing table can start collecting without a
    * schema change).
    */
  private def effectiveLookupCols(schema: StructType): Seq[String] = {
    val declared = currentSnapshot.map(_.lookupCols).getOrElse(Nil) ++
      spark.conf.getOption(LookupBloomsConf)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    declared.distinct.filter(c => schema.fields.exists(f =>
      f.name == c && (f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == StringType)))
  }

  /** Base64 spark-sketch blooms over each commit file's non-null
    * values per lookup column, for ALL of a commit's files in TWO
    * Spark jobs total (a per-(file,col) non-null count, then one
    * partition-local bloom-build pass merged on the driver) — never
    * per-file jobs, whose scheduling overhead alone would tax every
    * commit by O(files × cols) round trips (the r8 bench caught
    * exactly that as a 3.5× q190 regression). Put/probe semantics are
    * `DataFrameStatFunctions.bloomFilter`'s (putLong for integral,
    * putString for strings — what [[lookupFiles]] probes with), so
    * blooms persisted by earlier versions stay compatible. Any
    * anomaly → entries omitted (blooms are an optimization; absence
    * always reads as "cannot prune").
    *
    * @return rel-path → (col → base64 bloom)
    */
  private def collectBlooms(outDir: String, rels: Seq[String],
      cols: Seq[String]): Map[String, Map[String, String]] =
    if (cols.isEmpty || rels.isEmpty) Map.empty
    else scala.util.Try {
      import org.apache.spark.util.sketch.BloomFilter
      val paths = rels.map(r => s"$outDir/$r")
      val df = spark.read.parquet(paths: _*)
      val present = cols.filter(df.columns.contains)
      require(present.nonEmpty, "no lookup columns present")
      val wide = df.select(
        (input_file_name().as("__f") +: present.map(col)): _*)
      // job 1: per-(file,col) non-null counts — sizes each bloom
      val counts: Map[(String, String), Long] = wide.groupBy("__f")
        .agg(count(col(present.head)).as(present.head),
          present.tail.map(c => count(col(c)).as(c)): _*)
        .collect()
        .flatMap(r => present.zipWithIndex.map { case (c, i) =>
          (r.getString(0), c) -> r.getLong(i + 1)
        }).toMap
      val fpp = LookupBloomFpp
      val bc = spark.sparkContext.broadcast(
        counts.map { case (k, n) => k -> math.max(n, 64L) })
      // job 2: partition-local blooms, merged driver-side (equal-size
      // blooms per key by construction, so mergeInPlace is legal)
      val partial = wide.rdd.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap
          .empty[(String, String), BloomFilter]
        it.foreach { row =>
          val f = row.getString(0)
          var i = 0
          while (i < present.size) {
            val v = row.get(i + 1)
            if (v != null) {
              val bf = m.getOrElseUpdate((f, present(i)),
                BloomFilter.create(bc.value((f, present(i))), fpp))
              v match {
                case l: java.lang.Long => bf.putLong(l)
                case n: java.lang.Integer => bf.putLong(n.toLong)
                case s: String => bf.putString(s)
                case other => bf.put(other)
              }
            }
            i += 1
          }
        }
        m.iterator
      }.collect()
      val merged = scala.collection.mutable.HashMap
        .empty[(String, String), BloomFilter]
      partial.foreach { case (k, bf) =>
        merged.get(k) match {
          case Some(a) => a.mergeInPlace(bf)
          case None => merged(k) = bf
        }
      }
      // a col with zero non-null values in a file still gets a bloom
      // (an empty one prunes every probe — the old per-file behavior)
      counts.keys.foreach { k =>
        if (!merged.contains(k))
          merged(k) = BloomFilter.create(64L, fpp)
      }
      merged.toSeq.flatMap { case ((f, c), bf) =>
        // input_file_name is a URI; recover the commit-relative path
        // by exact segment equality on the DECODED path (URI.getPath
        // handles any percent-encoding, not just '='), requiring a
        // UNIQUE match — a wrong match would attach the wrong file's
        // bloom and make lookup pruning silently unsound (false
        // negatives), so ambiguity drops the bloom (absence is always
        // safe: it reads as "cannot prune")
        val fSegs = scala.util.Try(new java.net.URI(f).getPath)
          .toOption.filter(_ != null).getOrElse(f)
          .split('/').filter(_.nonEmpty)
        val rel = rels.filter { r =>
          val rSegs = r.split('/').filter(_.nonEmpty)
          fSegs.length >= rSegs.length &&
            fSegs.takeRight(rSegs.length).sameElements(rSegs)
        } match {
          case Seq(only) => Some(only)
          case _ => None
        }
        rel.map { r =>
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          (r, c, java.util.Base64.getEncoder.encodeToString(bos.toByteArray))
        }
      }.groupBy(_._1).map { case (r, s) =>
        r -> s.map(t => t._2 -> t._3).toMap
      }
    }.getOrElse(Map.empty)
}

object UpsertTable {
  /** Session conf key overriding the default bucket count for newly
    * created tables (the manifest records it per table thereafter).
    */
  val BucketsConf = "graft.store.numBuckets"

  /** Session conf declaring secondary-lookup columns (comma-separated)
    * for newly created tables: every commit then records a per-file
    * Bloom filter on each, so reverse lookups ([[UpsertTable.readLookup]])
    * prune files at planning time. The declaration persists in the
    * manifest ([[Snapshot.lookupCols]]).
    */
  val LookupBloomsConf = "graft.store.lookupBloomCols"

  /** False-positive rate for per-file lookup blooms: at 0.01 a
    * reverse lookup over F files admits the ~true files + 0.01·F noise
    * — each bloom is ~1.2 KiB per 1000 rows in the manifest.
    */
  val LookupBloomFpp = 0.01

  /** Default orphan-GC retention: 3 days, matching Iceberg's
    * `remove_orphan_files` default — long enough that any plausible
    * in-flight commit write finishes (publish or loss) first.
    */
  val OrphanGcDefaultMs: Long = 3L * 24 * 3600 * 1000

  /** Shortest orphan-GC retention accepted without the explicit
    * `allowShortRetention` override (Iceberg refuses < 24 h the same
    * way).
    */
  val OrphanGcMinMs: Long = 24L * 3600 * 1000

  /** Changelog-op column stored in delta files (`u` upsert / `d`
    * tombstone) — also the in-flight op column name inside [[merge]].
    */
  val OpCol = "__op"

  /** Commit-sequence column stored in delta files; base rows rank 0. */
  val SeqCol = "__seq"

  /** Default key-space partitioning. Local tests stay small; a 100 TB
    * deployment sets [[BucketsConf]] to 4096+ or passes numBuckets
    * explicitly so each merge touches only a sliver of the table.
    */
  val DefaultBuckets = 16

  def bucketExpr(keys: Seq[String], numBuckets: Int): Column =
    pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Per-row 60-bit content hash over the given columns in NAME order
    * (sorted, so projection order can't change the fingerprint) —
    * the row term of [[UpsertTable.bucketFingerprints]]'s commutative
    * set hash. md5 (not xxhash) so audits are reproducible across
    * engines and releases.
    */
  def rowFingerprint(columns: Seq[String]): Column = expr(
    s"cast(conv(substring(md5(to_json(struct(${
      columns.sorted.mkString(", ")}))), 1, 15), 16, 10) as bigint)")

  /** Widenings the parquet reader serves by CAST-ON-READ over files
    * written at the narrower type (probed against Spark 4.1's
    * vectorized reader): int32→int64, int32→double, float→double.
    * int64→double is NOT servable — that evolution must physically
    * rewrite the files in the same commit.
    */
  def promotableOnRead(from: DataType, to: DataType): Boolean =
    (from == to) || ((from, to) match {
      case (IntegerType, LongType) => true
      case (IntegerType, DoubleType) => true
      case (FloatType, DoubleType) => true
      // a struct evolution is read-servable when every stored subfield
      // is itself servable under its evolved type; subfields ADDED by
      // the evolution are absent from old files and null-fill (the
      // parquet reader clips nested schemas)
      case (fs: StructType, ts: StructType) =>
        fs.fields.forall(f =>
          ts.fields.find(_.name == f.name)
            .exists(nf => promotableOnRead(f.dataType, nf.dataType)))
      case (ArrayType(ea, _), ArrayType(eb, _)) => promotableOnRead(ea, eb)
      case _ => false
    })

  /** Stored columns are always nullable (additive evolution fills nulls). */
  def allNullable(s: StructType): StructType =
    StructType(s.fields.map(_.copy(nullable = true)))

  /** Schema evolution à la the Iceberg sink's evolve mode
    * (connect-iceberg-sink.json:14): additive columns plus int→long /
    * float→double widening; everything else incompatible is rejected.
    * Returns the evolved schema and whether an existing column widened
    * — widened files stay on disk at the narrow type and are served by
    * cast-on-read until [[UpsertTable.rewriteData]] maintenance.
    */
  def evolve(old: StructType, incoming: StructType): (StructType, Boolean) = {
    var widened = false
    val existing = old.fields.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(in) if in.dataType == f.dataType => f
        case Some(in) =>
          val t = widerOf(f.dataType, in.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"incompatible evolution of ${f.name}: ${f.dataType} vs ${in.dataType}"))
          if (t != f.dataType) widened = true
          f.copy(dataType = t)
        case None => f
      }
    }
    val added = incoming.fields.filterNot(f => old.fieldNames.contains(f.name))
    (allNullable(StructType(existing ++ added)), widened)
  }

  private def widerOf(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case _ if a == b => Some(a)
    case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    // integral -> double: the canonical CDC drift (a JSON-inferred
    // long column starts carrying decimals). Precision caveat above
    // 2^53 accepted — the alternative is nulling or wedging the stream.
    case (IntegerType, DoubleType) | (DoubleType, IntegerType) => Some(DoubleType)
    case (LongType, DoubleType) | (DoubleType, LongType) => Some(DoubleType)
    // nested structs evolve recursively: additive subfields + leaf
    // widening, same rules as the top level (a new field inside a CDC
    // payload's source/after struct must not wedge — or silently
    // drop — the stream)
    case (sa: StructType, sb: StructType) =>
      val merged = sa.fields.map { f =>
        sb.fields.find(_.name == f.name) match {
          case Some(in) =>
            widerOf(f.dataType, in.dataType).map(t =>
              f.copy(dataType = t, nullable = true))
          case None => Some(f.copy(nullable = true))
        }
      }
      if (merged.exists(_.isEmpty)) None
      else Some(StructType(merged.map(_.get) ++
        sb.fields.filterNot(x => sa.fieldNames.contains(x.name))
          .map(_.copy(nullable = true))))
    case (ArrayType(ea, _), ArrayType(eb, _)) =>
      widerOf(ea, eb).map(ArrayType(_, containsNull = true))
    case _ => None
  }

  def apply(spark: SparkSession, location: String): UpsertTable =
    new UpsertTable(spark, location)
}
