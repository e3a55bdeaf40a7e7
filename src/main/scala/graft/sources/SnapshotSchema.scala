package graft.sources

import java.net.{URLDecoder, URLEncoder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.Tables

/** Schema evolution ON the snapshot table layer — the authoritative
  * merged schema lives in the MANIFEST ROOT (a `#schema=` tag), not in
  * file footers, which retires [[SchemaEvolution]]'s documented 100 TB
  * caveat: `mergeSchema` reads every footer at planning time, a
  * catalog/manifest schema is O(1). Same design center as
  * Delta's metadata action / Iceberg's schema in table metadata,
  * reduced to this layer's primitives:
  *
  *  - **Add-column = one metadata-only commit.** [[evolve]] re-commits
  *    the CURRENT file set with the widened schema tag — every shard
  *    pointer is reused (the base file set is unchanged), no data file
  *    is touched, commit IO is O(partitions). Only ADDS are accepted:
  *    renames/retypes need a rewrite and are refused loudly.
  *  - **The tag rides the normal carry-forward.** Mutations copy
  *    unknown `#` tags verbatim ([[SnapshotOps.expireTags]] carries
  *    non-versioned kinds as-is), so appends/upserts/compactions after
  *    an evolve all keep the declared schema without knowing about it.
  *  - **Merged reads NULL-fill from the declared schema.**
  *    [[readMerged]] passes the manifest schema to the parquet scan
  *    (`spark.read.schema(...)`) — files that predate a column yield
  *    NULL for it (never a positional mis-bind), files that carry it
  *    serve it, and NO footer is read at planning time. Predicates on
  *    common columns still push down to every file's scan
  *    (spec-asserted — evolution must not cost pushdown).
  *
  * Reference behavior: doc/index.rst's append-only log model plus the
  * add-column evolution every table format ships; the plain-layout
  * twin (`schema_evolution`, SchemaEvolution.scala) pins the same
  * NULL-fill semantics via `mergeSchema`, this operator pins them via
  * the manifest so the contract holds without footer IO.
  */
object SnapshotSchema {

  private val SchemaTag = "#schema="

  private[sources] def encodeSchema(schema: StructType): String =
    SchemaTag + URLEncoder.encode(schema.json, "UTF-8")

  /** The declared schema of a committed version, if any. */
  def schemaOf(fs: org.apache.hadoop.fs.FileSystem, root: Path,
               v: Long): Option[StructType] =
    Snapshot.tagsOf(fs, root, v).collectFirst {
      case t if t.startsWith(SchemaTag) =>
        DataType.fromJson(URLDecoder.decode(t.stripPrefix(SchemaTag), "UTF-8"))
          .asInstanceOf[StructType]
    }

  /** The table's authoritative schema: the manifest tag when declared,
    * else derived once from one data file's footer (pre-evolution
    * tables) — the fallback a production catalog would backfill.
    */
  def tableSchema(spark: SparkSession, dir: String): StructType = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val p = Snapshot.pin(spark, dir)
    schemaOf(fs, root, p.version).getOrElse {
      require(p.files.nonEmpty,
        s"$dir has no declared schema and no data files to derive one from")
      spark.read.parquet(s"$dir/${p.files.head}").schema
    }
  }

  /** Declare added columns: one METADATA-ONLY commit carrying the
    * widened `#schema=` tag — the current file set is re-committed
    * with every partition's shard pointer reused, so no data file is
    * read, written or rewritten. Existing columns must keep their
    * exact type (add-only is the one evolution that needs no rewrite);
    * re-declaring an existing column identically is a no-op add.
    * Returns the committed version.
    */
  def evolve(spark: SparkSession, dir: String,
             addCols: Seq[StructField]): Long = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    SnapshotOps.retryConflicts(3) {
      val cur = Snapshot.currentVersion(fs, root).getOrElse(
        throw new IllegalStateException(s"$dir is not snapshot-managed"))
      val base = schemaOf(fs, root, cur).getOrElse {
        val files = Snapshot.filesOf(fs, root, cur)
        require(files.nonEmpty,
          s"$dir has no declared schema and no data files to derive one from")
        spark.read.parquet(s"$dir/${files.head}").schema
      }
      val byName = base.fields.map(f => f.name -> f).toMap
      addCols.foreach { f =>
        byName.get(f.name).foreach { existing =>
          require(existing.dataType == f.dataType,
            s"cannot evolve ${f.name}: declared ${existing.dataType}, " +
              s"got ${f.dataType} — retypes need a rewrite, not an evolve")
        }
      }
      val merged = StructType(
        base.fields ++ addCols.filterNot(f => byName.contains(f.name)))
      val files = Snapshot.filesOf(fs, root, cur)
      val tags = Snapshot.tagsOf(fs, root, cur)
        .filterNot(_.startsWith(SchemaTag)) :+ encodeSchema(merged)
      // baseFiles = the same set → every shard pointer reuses; the
      // commit writes ONE root file
      Snapshot.commit(fs, root, files, cur, tags,
        baseFiles = Some(files))
    }
  }

  /** Snapshot-isolated merged read: scan the pinned file set under
    * the DECLARED schema — columns a file predates come back NULL, no
    * footer is consulted at planning time, and common-column
    * predicates push down into every file's scan.
    */
  def readMerged(spark: SparkSession, dir: String): DataFrame = {
    val p = Snapshot.pin(spark, dir)
    require(p.files.nonEmpty, s"snapshot v${p.version} of $dir is empty")
    spark.read.schema(tableSchema(spark, dir))
      .parquet(p.files.map(f => s"$dir/$f"): _*)
  }

  // ---- gate fixture + query ----

  private val fixtureCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** The evolution lifecycle fixture: base events committed WITHOUT
    * the new column, one metadata-only [[evolve]] adding
    * `quality_bp`, one post-evolution append whose batch CARRIES the
    * column (values a deterministic function of event_id, so the
    * oracle rebuilds them), then one unrelated append proving the
    * schema tag carries forward through mutations that know nothing
    * about it.
    */
  private[graft] def evolutionFixture(spark: SparkSession,
                                      dir: String): String =
    graft.Memo.once(fixtureCache,
      (spark.sparkContext.applicationId, dir), {
        val tmp = TmpDir.scoped("snapschema",
          spark.sparkContext.applicationId, dir)
        val root = new Path(tmp)
        root.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(root, true)
        val events = Tables.events(spark, dir)
          .withColumn("date", expr("date(timestamp_micros(ts div 1000))"))
          .withColumn("ym", date_format(col("date"), "yyyy-MM"))
          .select("event_id", "user_id", "event_type", "date", "ym")
        SnapshotOps.append(spark, tmp, events, "ym", Some("schema-base"))
        evolve(spark, tmp, Seq(StructField("quality_bp",
          org.apache.spark.sql.types.LongType)))
        // wave with the NEW column: shifted re-ingest slice, quality
        // derived from the shifted id (oracle-reconstructible)
        val wave = events.filter(pmod(col("user_id"), lit(13)) === 5)
          .withColumn("event_id", col("event_id") + lit(4000000000L))
          .withColumn("quality_bp", pmod(col("event_id"), lit(97)) * 100L)
        SnapshotOps.append(spark, tmp, wave, "ym", Some("schema-wave"))
        // an evolution-unaware append: no quality column in the batch,
        // tag must carry forward anyway
        val plain = events.filter(pmod(col("user_id"), lit(17)) === 3)
          .withColumn("event_id", col("event_id") + lit(5000000000L))
        SnapshotOps.append(spark, tmp, plain, "ym", Some("schema-plain"))
        tmp
      })

  /** Gate query: the merged rollup over all three generations — the
    * NULL-fill semantics are IN the output (null counts + coalesced
    * sums per event_type/date), so the hash gate proves old files
    * NULL-fill, new files serve the column, and nothing mis-binds.
    */
  def snapshotSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val tmp = evolutionFixture(spark, dir)
    readMerged(spark, tmp)
      .groupBy(col("event_type"), col("date"))
      .agg(count(lit(1)).as("n"),
        sum("event_id").as("sum_id"),
        sum(when(col("quality_bp").isNull, 1L).otherwise(0L)).as("n_null_q"),
        sum(coalesce(col("quality_bp"), lit(0L))).as("sum_q"))
      .orderBy("event_type", "date")
  }
}
