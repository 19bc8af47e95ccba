package graft

import graft.ops.SkewTools
import graft.sources.TableOps
import org.apache.spark.sql.functions._

/** Plan-shape tests for the 100 TB techniques in SCALING.md: salted
  * joins must preserve results; bucketed joins must eliminate the
  * shuffle. */
class ScaleToolsSpec extends SparkSpec {

  test("salted inner join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity", "l_linenumber")
    val o = Tables.orders(spark, sf001).select(
      col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"), "inner")
    val salted = SkewTools.saltedInnerJoin(li, o, "l_orderkey", 8, col("l_linenumber"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("joining two same-bucketed tables plans without a shuffle") {
    TableOps.resetBucketedTable(spark, "orders_b",
      Tables.orders(spark, sf001), "o_custkey", 4)
    TableOps.resetBucketedTable(spark, "customer_b",
      Tables.customer(spark, sf001)
        .withColumn("o_custkey", col("c_custkey")), "o_custkey", 4)
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b").hint("merge"), Seq("o_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    val expected = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001),
        col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("pii redaction plans as a pure projection chain — no shuffle at all") {
    // The cleaning family's contract: per-row regexp work stays inside
    // whole-stage codegen; a shuffle anywhere means the operator broke
    // its linear-scan posture (the presentation sort lives in SparkEntry,
    // not in the operator, so the operator plan must be Exchange-free).
    val plan = graft.ext.TextAnalysis.piiRedact(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pii redaction should be shuffle-free, got:\n$plan")
  }

  test("scene cuts shuffle only the per-doc histogram rows, exactly once") {
    // Decode runs map-side; the single Exchange is the per-doc window
    // over <= 8 sixteen-long histogram rows — video bytes never shuffle.
    val plan = graft.ext.Multimodal.sceneCuts(spark, sf001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly one Exchange (the per-doc window), got $exchanges:\n$plan")
  }

  test("winnowing fingerprint selection is shuffle-free") {
    // Window-minimum selection is per-row HOF algebra: the fingerprint
    // index builds in a single map pass over the corpus.
    val plan = graft.ext.TextAnalysis.winnow(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"winnowing should be shuffle-free, got:\n$plan")
  }

  test("bucketed band table makes the dedup pair join Exchange-free") {
    import graft.ext.Dedup
    val docs = Tables.documents(spark, sf001)
    val pairs = Dedup.bandPairsBucketed(spark, docs, table = "bands_rt")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed band pair join should plan without a shuffle, got:\n$plan")
    // same candidate set as the shuffling generator
    val got = pairs.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.bandCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"bucketed candidates diverged: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
    spark.sql("DROP TABLE IF EXISTS bands_rt")
  }

  test("saved IVF-PQ index serves the same results as in-memory e_ann_ivfpq") {
    import graft.ext.Similarity
    Similarity.annIndexWrite(spark, sf001, prefix = "ann_rt")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSet
    val saved = rows(Similarity.annIndexLookup(spark, sf001, prefix = "ann_rt"))
    val mem = rows(Similarity.annIvfPq(spark, sf001))
    assert(saved == mem,
      s"saved-index lookup diverged from in-memory IVF-PQ: " +
        s"only-saved=${(saved -- mem).take(3)} only-mem=${(mem -- saved).take(3)}")
    Seq("codes", "centroids", "codebooks")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ann_rt_$t"))
  }

  test("OPQ rank memo hits across separately-constructed DataFrames") {
    // The memo exists to eliminate the repeated variance scan+collect;
    // keyed on the RAW analyzed plan it never hit (fresh expression ids
    // per instantiation made every key unique). The canonicalized key
    // must map two independently constructed reads of the same files to
    // ONE entry — and a genuinely different source to a second.
    import graft.ext.Similarity
    Similarity.opqRankCache.clear()
    val a = Tables.embeddings(spark, sf001).select(col("vec_id"), col("embedding"))
    val b = Tables.embeddings(spark, sf001).select(col("vec_id"), col("embedding"))
    val pa = Similarity.opqPermutation(a, "embedding")
    val pb = Similarity.opqPermutation(b, "embedding")
    assert(pa.toSeq == pb.toSeq)
    assert(Similarity.opqRankCache.size == 1,
      s"one corpus must occupy one memo entry, got ${Similarity.opqRankCache.size}")
    val dirC = java.nio.file.Files.createTempDirectory("graft_opqmemo").toString
    Tables.embeddings(spark, sf001)
      .withColumn("embedding",
        expr("transform(embedding, x -> CAST(x * x AS FLOAT))"))
      .write.mode("overwrite").parquet(s"$dirC/embeddings.parquet")
    Similarity.opqPermutation(
      Tables.embeddings(spark, dirC).select(col("vec_id"), col("embedding")),
      "embedding"): Unit
    assert(Similarity.opqRankCache.size == 2,
      "a different corpus must not collide into the same memo entry")
  }

  test("serve-path model caches invalidate on rebuild, never serve stale state") {
    // The round-12 resident-model memos (ivfPqModelCache keyed on the
    // codes table's createTime; ann_exact_gt keyed on the source-dir
    // property) must never outlive the artifacts they cache: rebuild
    // the index/ground truth from a DIFFERENT corpus and the serve
    // path must answer from the NEW model in the same JVM.
    import graft.ext.Similarity
    // corpus B: same schema, elementwise-squared vectors — changes both
    // distance magnitudes (ADC values) and neighbor structure
    val dirB = java.nio.file.Files.createTempDirectory("graft_annb").toString
    Tables.embeddings(spark, sf001)
      .withColumn("embedding",
        expr("transform(embedding, x -> CAST(x * x AS FLOAT))"))
      .write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSet

    Similarity.annIndexEnsure(spark, sf001, prefix = "ann_inv")
    val servedA = rows(Similarity.annIndexLookup(spark, sf001, prefix = "ann_inv"))
    // same source dir: ensure is a no-op, the memoized model serves
    Similarity.annIndexEnsure(spark, sf001, prefix = "ann_inv")
    assert(rows(Similarity.annIndexLookup(spark, sf001, prefix = "ann_inv")) == servedA)
    // different source dir: ensure rebuilds, the createTime key rolls,
    // and the lookup must answer from corpus B's model — proven by
    // agreeing with the fully in-memory build over B
    Similarity.annIndexEnsure(spark, dirB, prefix = "ann_inv")
    val servedB = rows(Similarity.annIndexLookup(spark, dirB, prefix = "ann_inv"))
    val memB = rows(Similarity.annIvfPq(spark, dirB))
    assert(servedB == memB,
      s"serve path answered stale model state after rebuild: " +
        s"only-served=${(servedB -- memB).take(3)} only-mem=${(memB -- servedB).take(3)}")
    assert(servedB != servedA, "corpus B fixture failed to change the results")

    // the persisted exact ground truth follows the same contract
    Similarity.annExactEnsure(spark, sf001)
    def gt() = spark.table("ann_exact_gt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def fresh(dir: String) = Similarity.knnPerVec(spark, dir)
      .filter(col("q_id") < 10).select(col("q_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gt() == fresh(sf001))
    Similarity.annExactEnsure(spark, dirB)
    assert(gt() == fresh(dirB),
      "ann_exact_gt served a stale corpus after the source dir changed")
    // leave the shared table rebuilt from the standard fixture so later
    // suites' ensure calls see a consistent (dir, table) pair
    Similarity.annExactEnsure(spark, sf001)
    Seq("codes", "centroids", "codebooks")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ann_inv_$t"))
  }

  test("compaction collapses a fragmented table without changing its rows") {
    val src = Tables.orders(spark, sf001)
    TableOps.resetTable(spark, "orders_frag", src.repartition(64))
    val wantRows = src.count()
    val (before, after) = TableOps.compactTable(spark, "orders_frag")
    assert(before >= 64, s"fixture should start fragmented, had $before files")
    assert(after < before / 8,
      s"compaction barely helped: $before -> $after files")
    val got = spark.table("orders_frag")
    assert(got.count() == wantRows)
    assert(got.exceptAll(src).count() == 0 && src.exceptAll(got).count() == 0,
      "compaction changed the data")
    // identity properties carrying PARSER-HOSTILE values (a path with a
    // quote is legal on Linux) must ride the rewrite: the restore goes
    // through the catalog API, not interpolated SQL — an unescaped SQL
    // restore would throw AFTER the drop+rename and strand the table
    // propertyless (the silent-retrain hazard)
    val hostile = "/data/bob's corpus"
    spark.sessionState.catalog.alterTable {
      val m = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("orders_frag"))
      m.copy(properties = m.properties + ("graft.source.dir" -> hostile))
    }
    TableOps.compactTable(spark, "orders_frag")
    assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("orders_frag"))
      .properties.get("graft.source.dir").contains(hostile),
      "quote-bearing graft.* property did not survive compaction")
    spark.sql("DROP TABLE IF EXISTS orders_frag")
    // partitioned tables must be refused, not silently flattened
    TableOps.resetTable(spark, "orders_part",
      src.withColumn("part_col", col("o_orderstatus")), Seq("part_col"))
    val err = intercept[IllegalArgumentException] {
      TableOps.compactTable(spark, "orders_part")
    }
    assert(err.getMessage.contains("partition subdirectories"))
    spark.sql("DROP TABLE IF EXISTS orders_part")
    // bucketed tables must be refused too: a flat rewrite would drop the
    // bucket spec and every Exchange-free join keyed on it would silently
    // regain a shuffle
    TableOps.resetBucketedTable(spark, "orders_bkt", src, "o_custkey", 4)
    val errB = intercept[IllegalArgumentException] {
      TableOps.compactTable(spark, "orders_bkt")
    }
    assert(errB.getMessage.contains("bucketed"))
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
  }

  test("a crash between compaction stage and swap leaves readers on the intact table") {
    // The stage+swap protocol's crash window: all heavy I/O happens in
    // the staging table; a death BEFORE the swap must leave the live
    // table byte-identical (same files, same rows) with only an orphaned
    // staging table behind — and the next compaction run must reclaim
    // the orphan and complete normally.
    val src = Tables.orders(spark, sf001)
    TableOps.resetTable(spark, "orders_cc", src.repartition(32))
    def liveFiles(): Set[(String, Long)] = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "orders_cc")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_"))
        .map(s => (s.getPath.getName, s.getLen)).toSet
    }
    val filesBefore = liveFiles()
    val wantRows = src.count()
    // stage, then "crash" — the swap never runs
    val (staging, _) = TableOps.stageCompaction(spark, "orders_cc",
      targetFileBytes = 128L * 1024 * 1024)
    assert(liveFiles() == filesBefore,
      "staging touched the live table's files — a crash here would corrupt readers")
    val live = spark.table("orders_cc")
    assert(live.count() == wantRows)
    assert(live.exceptAll(src).count() == 0 && src.exceptAll(live).count() == 0,
      "live table content changed during staging")
    assert(spark.catalog.tableExists(staging),
      "expected the orphaned staging table after the simulated crash")
    // recovery: re-running compaction reclaims the orphan and completes
    val (before, after) = TableOps.compactTable(spark, "orders_cc")
    assert(before >= 32 && after < before,
      s"post-crash compaction did not complete: $before -> $after files")
    val got = spark.table("orders_cc")
    assert(got.count() == wantRows)
    assert(got.exceptAll(src).count() == 0 && src.exceptAll(got).count() == 0,
      "post-crash compaction changed the data")
    assert(!spark.catalog.tableExists(staging),
      "orphaned staging table survived the recovery run")
    spark.sql("DROP TABLE IF EXISTS orders_cc")
  }

  test("per-partition compaction is lossless, layout-preserving, and crash-safe pre-swap") {
    // The partitioned lake's real maintenance job: only ONE partition's
    // files are rewritten; every other partition directory must be
    // byte-untouched and the partition's directory name (the pruning
    // contract) unchanged.
    val src = Tables.orders(spark, sf001).withColumn("st", col("o_orderstatus"))
    TableOps.resetTable(spark, "orders_pc", src.repartition(32), Seq("st"))
    val statuses = src.select("st").distinct().collect().map(_.getString(0)).sorted
    val target = statuses.head
    val others = statuses.tail
    def partFiles(v: String): Set[(String, Long)] = {
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"orders_pc/st=$v")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .map(s => (s.getPath.getName, s.getLen)).toSet
    }
    val targetBefore = partFiles(target)
    val othersBefore = others.map(v => v -> partFiles(v)).toMap
    val wantRows = src.count()
    // crash window first: stage only, live partition must be untouched
    val (stagingPath, _, _) = TableOps.stagePartitionCompaction(
      spark, "orders_pc", "st", target, targetFileBytes = 128L * 1024 * 1024)
    assert(partFiles(target) == targetBefore,
      "partition staging touched the live partition directory")
    assert(spark.table("orders_pc").count() == wantRows)
    // now the real swap (reuses the staged dir's sibling protocol)
    val (before, after) =
      TableOps.compactPartition(spark, "orders_pc", "st", target)
    assert(before > 1 && after < before,
      s"partition compaction did not consolidate: $before -> $after files")
    val got = spark.table("orders_pc")
      .select(src.columns.map(col).toIndexedSeq: _*)
    assert(got.count() == wantRows)
    assert(got.exceptAll(src).count() == 0 && src.exceptAll(got).count() == 0,
      "partition compaction changed the table's rows")
    // layout-preserving: every OTHER partition's files are byte-identical
    others.foreach { v =>
      assert(partFiles(v) == othersBefore(v),
        s"compacting st=$target touched sibling partition st=$v")
    }
    // and the partitioning still prunes statically: a filter on the
    // partition column reads only that directory
    val prunedPlan = spark.table("orders_pc")
      .filter(col("st") === target).queryExecution.executedPlan.toString
    assert(prunedPlan.contains(s"st=$target") ||
      prunedPlan.contains("PartitionFilters"),
      s"partition filter did not reach the scan:\n$prunedPlan")
    // staging dir was promoted (no orphan left behind)
    val fs = stagingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(stagingPath), "staging dir survived the swap")
    spark.sql("DROP TABLE IF EXISTS orders_pc")
  }

  test("view-fronted compaction never loses the query-visible name") {
    // compactTable's residual weakness is its drop+RENAME swap: a crash
    // between the two metadata ops loses the table NAME until re-pointed.
    // The view-fronted variant swaps with ONE catalog op — at every crash
    // point in the protocol, resolving the name must succeed and return
    // the full row set.
    val src = Tables.orders(spark, sf001)
    TableOps.resetViewedTable(spark, "orders_vf", src.repartition(32))
    val wantRows = src.count()
    def readable(): Unit = {
      val got = spark.table("orders_vf")
      assert(got.count() == wantRows, "name resolved but rows wrong")
    }
    readable()
    assert(TableOps.backingVersion(spark, "orders_vf") == 1)

    // crash point A: staged v2 exists, view still → v1
    val (stagedA, _) = TableOps.stageCompaction(spark, "orders_vf_v1",
      targetFileBytes = 128L * 1024 * 1024, stagingName = "orders_vf_v2")
    assert(stagedA == "orders_vf_v2" && spark.catalog.tableExists("orders_vf_v2"))
    readable() // view untouched by the staging write
    assert(TableOps.backingVersion(spark, "orders_vf") == 1)

    // An IN-FLIGHT reader: resolve the view to v1 NOW (analysis pins the
    // plan to the current backing table), execute only after the swap —
    // the long-running-query-during-compaction case at 100 TB.
    val inFlight = spark.table("orders_vf")
    inFlight.schema // force analysis pre-swap

    // identity properties on the BACKING table must ride the version
    // bump (the compactTable/compactBucketedTable contract)
    spark.sql("ALTER TABLE orders_vf_v1 SET TBLPROPERTIES " +
      "('graft.source.dir' = '/canonical/dir')")

    // recovery run: reclaims the orphan, completes, swaps to v2
    val (before, after) = TableOps.compactTableAtomic(spark, "orders_vf")
    assert(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "orders_vf_v2")).properties.get("graft.source.dir")
      .contains("/canonical/dir"),
      "atomic compaction dropped graft.* properties across the version bump")
    assert(before >= 32 && after < before,
      s"viewed compaction did not consolidate: $before -> $after files")
    readable()
    assert(TableOps.backingVersion(spark, "orders_vf") == 2)
    // reader grace: the retired v1 must SURVIVE the run that retired it —
    // dropping it here would delete files out from under inFlight; the
    // NEXT run's cleanup pass is what reclaims it
    assert(spark.catalog.tableExists("orders_vf_v1"),
      "retired v1 was dropped by its own run — in-flight readers stranded")
    assert(inFlight.count() == wantRows,
      "in-flight reader resolved pre-swap failed after the swap")
    val got = spark.table("orders_vf")
    assert(got.exceptAll(src).count() == 0 && src.exceptAll(got).count() == 0,
      "viewed compaction changed the data")

    // crash point B: view already repointed to v3, stale v2 not yet
    // dropped — readers stay on the new data; next run reclaims v2
    val (stagedB, _) = TableOps.stageCompaction(spark, "orders_vf_v2",
      targetFileBytes = 128L * 1024 * 1024, stagingName = "orders_vf_v3")
    spark.sql(s"CREATE OR REPLACE VIEW orders_vf AS SELECT * FROM $stagedB")
    readable()
    assert(TableOps.backingVersion(spark, "orders_vf") == 3)
    val (_, after2) = TableOps.compactTableAtomic(spark, "orders_vf")
    assert(after2 >= 1)
    readable()
    assert(TableOps.backingVersion(spark, "orders_vf") == 4)
    // this run's cleanup reclaimed every PRE-EXISTING non-live version
    // (v1 from the grace window, v2 from the simulated crash)…
    assert(!spark.catalog.tableExists("orders_vf_v1") &&
      !spark.catalog.tableExists("orders_vf_v2"),
      "stale backing versions survived the next compaction's cleanup")
    // …while the version IT retired (v3) stays for ITS grace window
    assert(spark.catalog.tableExists("orders_vf_v3"),
      "retired v3 was dropped by its own run — in-flight readers stranded")

    spark.sql("DROP VIEW IF EXISTS orders_vf")
    spark.sql("DROP TABLE IF EXISTS orders_vf_v3")
    spark.sql("DROP TABLE IF EXISTS orders_vf_v4")
  }

  test("half-swapped partition compaction auto-recovers on the next run") {
    // A crash BETWEEN compactPartition's two renames leaves the live
    // partition directory absent with the data in hidden siblings; the
    // next run must recognize the state and complete on its own instead
    // of aborting with 'no such partition directory'.
    val src = Tables.orders(spark, sf001).withColumn("st", col("o_orderstatus"))
    TableOps.resetTable(spark, "orders_hs", src.repartition(16), Seq("st"))
    val wantRows = src.count()
    val target = src.select("st").distinct().collect().map(_.getString(0)).sorted.head
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "orders_hs")
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partPath = new org.apache.hadoop.fs.Path(warehouse, s"st=$target")
    val retired = new org.apache.hadoop.fs.Path(warehouse, s".old_st=$target")
    val staged = new org.apache.hadoop.fs.Path(warehouse, s".compacting_st=$target")

    // state 1: staged committed + live renamed away (death before promote)
    TableOps.stagePartitionCompaction(spark, "orders_hs", "st", target,
      targetFileBytes = 128L * 1024 * 1024): Unit
    assert(fs.rename(partPath, retired), "test setup: retire rename failed")
    assert(!fs.exists(partPath) && fs.exists(staged) && fs.exists(retired))
    val (b1, a1) = TableOps.compactPartition(spark, "orders_hs", "st", target)
    assert(b1 >= 1 && a1 >= 1, s"recovery run failed: $b1 -> $a1")
    assert(!fs.exists(retired) && !fs.exists(staged),
      "recovery left hidden sibling dirs behind")
    val got1 = spark.table("orders_hs").select(src.columns.map(col).toIndexedSeq: _*)
    assert(got1.count() == wantRows)
    assert(got1.exceptAll(src).count() == 0 && src.exceptAll(got1).count() == 0,
      "promote-recovery changed the table's rows")

    // state 2: live renamed away but staging UNCOMMITTED (no _SUCCESS) —
    // recovery must restore the retired originals, not promote garbage
    assert(fs.rename(partPath, retired), "test setup: retire rename failed")
    fs.mkdirs(staged)
    val (b2, a2) = TableOps.compactPartition(spark, "orders_hs", "st", target)
    assert(b2 >= 1 && a2 >= 1, s"restore-recovery run failed: $b2 -> $a2")
    val got2 = spark.table("orders_hs").select(src.columns.map(col).toIndexedSeq: _*)
    assert(got2.count() == wantRows)
    assert(got2.exceptAll(src).count() == 0 && src.exceptAll(got2).count() == 0,
      "restore-recovery changed the table's rows")
    spark.sql("DROP TABLE IF EXISTS orders_hs")
  }

  test("schema drift: merged read equals pinned-schema read, nulls only pre-drift") {
    import graft.sources.SchemaDrift
    val merged = SchemaDrift.ordersDrifted(spark, sf001)
    // the drifted column is NULL exactly on the pre-drift (narrow-footer)
    // generation and populated on every post-drift row
    assert(merged.filter(col("o_channel").isNull =!=
      (pmod(col("o_orderkey"), lit(3)) =!= 0)).count() == 0)
    assert(merged.count() == Tables.orders(spark, sf001).count())
    // 100 TB posture: after ONE mergeSchema reconciliation the schema is
    // pinned (metastore) and per-query reads skip the footer sweep — the
    // pinned read must see the identical table
    val pinned = spark.read.schema(merged.schema)
      .parquet(SchemaDrift.driftPath(sf001))
    assert(pinned.exceptAll(merged).count() == 0 &&
      merged.exceptAll(pinned).count() == 0,
      "pinned-schema read diverged from mergeSchema read")
    // predicate on a PRE-drift column still pushes into the scan across
    // both footer generations
    val plan = merged.filter(col("o_totalprice") > 150000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(o_totalprice,150000.0)"),
      s"o_totalprice predicate not pushed into the mixed-footer scan:\n$plan")
  }

  test("dim-filtered join over the day-partitioned table prunes partitions dynamically") {
    import graft.sources.PartitionedScan
    val df = PartitionedScan.partitionPruned(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    // the fact scan must carry a runtime pruning subquery on the
    // partition column — static pruning cannot see the dim-side filter
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruningexpression in the partitioned fact scan:\n$plan")
    // and the pruning is real: only weekday partitions are admitted
    val days = df.select("day").collect().map(_.getDate(0).toLocalDate)
    assert(days.nonEmpty)
    assert(days.forall(d => ((d.toEpochDay + 3) % 7) <= 4),
      s"weekend partition leaked through: ${days.filter(d => ((d.toEpochDay + 3) % 7) > 4).take(3)}")
    spark.sql("DROP TABLE IF EXISTS events_by_day")
  }

  test("q1's time-window literal reaches the events scan as a pushed filter") {
    // The claim PLANS.md publishes — and the one the round-10 testdata
    // generation silently broke (events.ts drifted TIMESTAMP(NANOS) →
    // TIMESTAMP(MICROS, NTZ) and the raw-column filter stopped
    // resolving). Guard it: the scan must carry a GreaterThanOrEqual
    // pushed filter on ts and read only the 3 projected columns.
    val df = graft.ops.ReferenceQueries.q1TimeFilter(spark, sf001)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"q1's window bound is not pushed into the events scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,ts:"),
      s"q1's scan reads more than the projected columns:\n$plan")
  }

  test("events loader adapts to the footer's timestamp generation") {
    // The lake's type-drift posture applied to the engine's own corpus:
    // a pre-drift footer that stores ts as a raw nanosecond LONG (the
    // round-1..9 testdata generation, and what nanosAsLong hands the
    // reader for TIMESTAMP(NANOS) footers) must come out of
    // Tables.events as the SAME µs/UTC TimestampType the current NTZ
    // generation produces — downstream operators never see the
    // generation.
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    Tables.events(spark, sf001) // current generation, already-typed
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L)) // ns long
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val adapted = Tables.events(spark, dir)
    assert(adapted.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"long-ns generation not normalized: ${adapted.schema("ts").dataType}")
    val want = Tables.events(spark, sf001).select("event_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val got = adapted.select("event_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(got == want, "ns-long and NTZ generations disagree after adaptation")
  }

  test("events loader is a no-op drift for MILLIS and INT64-µs generations") {
    // The two remaining plausible generator outputs (testdata has
    // drifted twice already — ns long → TIMESTAMP(NANOS) →
    // TIMESTAMP(MICROS,NTZ)); cover them AHEAD of the generator so the
    // next drift is a green spec, not a mid-round fire drill.
    val want = Tables.events(spark, sf001)
      .select(col("event_id"), date_trunc("millisecond", col("ts")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap

    // generation A: TIMESTAMP(MILLIS, adjusted-to-UTC) footer
    val dirMs = java.nio.file.Files.createTempDirectory("graft_ms").toString
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      Tables.events(spark, sf001)
        .withColumn("ts", date_trunc("millisecond", col("ts")))
        .write.mode("overwrite").parquet(s"$dirMs/events.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val ms = Tables.events(spark, dirMs)
    assert(ms.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      s"MILLIS generation not normalized: ${ms.schema("ts").dataType}")
    val gotMs = ms.select("event_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(gotMs == want, "MILLIS generation disagrees after adaptation")

    // generation B: plain INT64 holding MICROseconds (no logical type —
    // the loader must NOT apply the ns÷1000; footer stats decide)
    val dirUs = java.nio.file.Files.createTempDirectory("graft_usl").toString
    Tables.events(spark, sf001)
      .withColumn("ts", unix_micros(col("ts")))
      .write.mode("overwrite").parquet(s"$dirUs/events.parquet")
    val us = Tables.events(spark, dirUs)
    assert(us.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      s"INT64-µs generation not normalized: ${us.schema("ts").dataType}")
    val wantUs = Tables.events(spark, sf001).select("event_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val gotUs = us.select("event_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(gotUs == wantUs, "INT64-µs generation disagrees after adaptation")
  }

  test("orc round-trip is lossless and pushes the scan predicate") {
    import graft.sources.OrcSource
    val orc = OrcSource.ordersOrc(spark, sf001)
    val pq = Tables.orders(spark, sf001)
    assert(orc.schema == pq.schema, "orc round-trip changed the schema")
    assert(orc.exceptAll(pq).count() == 0 && pq.exceptAll(orc).count() == 0,
      "orc round-trip changed the rows")
    val filtered = orc.filter(col("o_totalprice") > 150000)
      .select("o_orderstatus", "o_totalprice")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,150000.0)]"),
      s"o_totalprice predicate not pushed into the ORC scan:\n$plan")
  }

  test("json round-trip is lossless under the explicit schema") {
    import graft.sources.JsonSource
    val js = JsonSource.ordersJson(spark, sf001)
    val pq = Tables.orders(spark, sf001)
    assert(js.schema == pq.schema, "json round-trip changed the schema")
    assert(js.exceptAll(pq).count() == 0 && pq.exceptAll(js).count() == 0,
      "json round-trip changed the rows")
  }

  test("zorder layout co-locates BOTH dimensions better than a 1-col sort") {
    // Simulate 16 row groups: chunk the rows in sort order and measure the
    // per-chunk span (max-min) of each dimension — the proxy for parquet
    // min/max pruning selectivity. A z-ordered sort must beat the
    // user_id-only sort on the OTHER dimension (epoch_day) by a wide
    // margin while staying useful on user_id itself.
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("epoch_day"))
    val z = graft.ops.Relational.zorderKey(spark, sf001)
    val rows = ev.join(z, Seq("event_id"))
      .select("user_id", "epoch_day", "zval").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def meanSpan(sorted: Array[(Long, Int, Long)], dim: ((Long, Int, Long)) => Long): Double = {
      val chunks = sorted.grouped(math.max(1, sorted.length / 16)).toArray
      chunks.map(c => (c.map(dim).max - c.map(dim).min).toDouble).sum / chunks.length
    }
    val byUser = rows.sortBy(r => (r._1, r._2))
    val byZ = rows.sortBy(_._3)
    val daySpanUserSort = meanSpan(byUser, _._2.toLong)
    val daySpanZSort = meanSpan(byZ, _._2.toLong)
    val userSpanZSort = meanSpan(byZ, _._1)
    val userSpanGlobal = rows.map(_._1).max - rows.map(_._1).min
    assert(daySpanZSort < daySpanUserSort / 2,
      s"z-sort day span $daySpanZSort !< half of user-sort span $daySpanUserSort")
    assert(userSpanZSort < userSpanGlobal.toDouble,
      s"z-sort must still cluster user_id below the global span $userSpanGlobal")
  }

  test("compactPartition compacts an EXTERNAL table through its catalog location") {
    // the lake table may live OUTSIDE the warehouse (LakeFold probes
    // partition existence at the catalog location for exactly this
    // case) — a reconstructed warehouse path refused with "no such
    // partition directory" on any external table's first compaction
    val ext = java.nio.file.Files.createTempDirectory("graft_extpart")
      .toString + "/lake"
    Tables.orders(spark, sf001).limit(120)
      .withColumn("day", expr("CAST(o_orderkey % 3 AS STRING)"))
      .repartition(4)
      .write.partitionBy("day").mode("overwrite").parquet(ext)
    spark.sql("DROP TABLE IF EXISTS ext_part_lake")
    spark.sql(s"CREATE TABLE ext_part_lake USING parquet LOCATION '$ext'")
    spark.sql("MSCK REPAIR TABLE ext_part_lake")
    val want = spark.table("ext_part_lake")
      .filter(col("day") === "1").agg(sum(col("o_orderkey"))).head().getLong(0)
    val (before, after) = TableOps.compactPartition(
      spark, "ext_part_lake", "day", "1")
    assert(after <= before && after >= 1, s"$before -> $after")
    assert(spark.table("ext_part_lake")
      .filter(col("day") === "1").agg(sum(col("o_orderkey"))).head().getLong(0)
      == want, "external-partition compaction changed the data")
    spark.sql("DROP TABLE IF EXISTS ext_part_lake")
  }

  test("the benign-accumulator-race log filter installs and stays scoped") {
    // The filter must (a) install without touching logger levels,
    // (b) DENY exactly the DAGScheduler accumulator-race message, and
    // (c) stay NEUTRAL for every other logger and message — a genuine
    // scheduler ERROR must remain loud in the bench record.
    Bench.quietBenignAccumulatorRace()
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val serving = cfg.getLoggerConfig("org.apache.spark.scheduler.DAGScheduler")
    val f = serving.getFilter
    assert(f != null, "no filter installed on the serving LoggerConfig")
    def result(logger: String, msg: String) = {
      val ev = org.apache.logging.log4j.core.impl.Log4jLogEvent.newBuilder()
        .setLoggerName(logger)
        .setLevel(org.apache.logging.log4j.Level.ERROR)
        .setMessage(new org.apache.logging.log4j.message.SimpleMessage(msg))
        .build()
      f.filter(ev)
    }
    import org.apache.logging.log4j.core.Filter.Result._
    assert(result("org.apache.spark.scheduler.DAGScheduler",
      "Failed to update accumulator 12345 (internal.metrics.x) for task 3") == DENY)
    assert(result("org.apache.spark.scheduler.DAGScheduler",
      "Failed to cancel job group abc") == NEUTRAL,
      "other DAGScheduler errors must stay loud")
    assert(result("some.other.Logger",
      "Failed to update accumulator 1 (x) for task 0") == NEUTRAL,
      "the filter must be scoped to the DAGScheduler logger name")
    // idempotence guard: calling twice must not stack filters into a
    // CompositeFilter that this spec can no longer reason about -- the
    // second install may add, but DENY/NEUTRAL behavior must hold
    Bench.quietBenignAccumulatorRace()
    assert(result("org.apache.spark.scheduler.DAGScheduler",
      "Failed to update accumulator 9 (y) for task 1") == DENY)
  }
}
