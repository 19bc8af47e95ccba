package graft

import graft.ext.Similarity
import graft.streaming.StreamAnnIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamAnnIndexSpec extends SparkSpec {

  private def dropIndex(prefix: String): Unit =
    Seq("codes", "centroids", "codebooks").foreach(t =>
      graft.sources.TableOps.dropWithLocation(spark, s"${prefix}_$t"))

  private def emb(sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))

  private def codeRows(df: DataFrame) = df
    .select(col("vec_id"), col("cell"), col("codes"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList))
    .toSet

  private def serveRows(df: DataFrame) = df
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
      r.getDouble(4)))
    .toSet

  /** Base-corpus index build at a scratch prefix (the twin's split). */
  private def buildBase(prefix: String, sfDir: String): Unit =
    Similarity.annIndexWriteFrom(spark,
      emb(sfDir).filter(col("vec_id") % 5 =!= 0), prefix)

  test("frozen-model encode reproduces the index build's codes bit-for-bit") {
    val base = emb(sf001).filter(col("vec_id") % 5 =!= 0)
    val (codesWithCell, cents, cb) = Similarity.ivfPqIndex(base)
    assert(codeRows(Similarity.ivfPqEncode(base, cents, cb)) ==
      codeRows(codesWithCell))
  }

  test("a live add stream converges the store to the replay twin's index") {
    val prefix = "sai_live"
    dropIndex(prefix)
    buildBase(prefix, sf001)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val byWave = emb(sf001).filter(col("vec_id") % 5 === 0)
      .withColumn("wave", pmod(floor(col("vec_id") / 5), lit(2)).cast("int"))
      .collect()
      .map(r => (r.getInt(2), (r.getLong(0), r.getSeq[Float](1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toIndexedSeq).toMap
    val acks =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Long)]
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamAnnIndex.streamingIndexAdd(
      mem.toDF().toDF("vec_id", "embedding"), prefix = prefix) { (out, _) =>
      out.collect().foreach(r =>
        acks.add((r.getLong(0), r.getInt(1), r.getLong(2))): Unit)
    }
    (0 until 2).foreach { w =>
      mem.addData(byWave(w): _*)
      q.processAllAvailable()
    }
    q.stop()
    // the registry twin folds the same waves through the same core
    val twinServe = serveRows(
      StreamAnnIndex.annIndexStreamed(spark, sf001).drop("src"))
    val (cents, cb) = Similarity.loadIvfPqModel(spark, prefix)
    val liveServe = serveRows(Similarity.ivfPqScore(
      emb(sf001), spark.table(s"${prefix}_codes"), cents, cb, probes = 1))
    assert(liveServe == twinServe,
      s"live-stream serve diverges from the twin: " +
        s"only-live=${(liveServe -- twinServe).take(3)} " +
        s"only-twin=${(twinServe -- liveServe).take(3)}")
    // every streamed vector acked exactly once, in its own wave's batch
    val ackList = acks.toArray(Array.empty[(Long, Int, Long)])
    val newIds = byWave.values.flatten.map(_._1).toSet
    assert(ackList.map(_._1).toSet == newIds)
    assert(ackList.length == newIds.size)
    dropIndex(prefix)
  }

  test("a replayed batch appends nothing and re-emits identical acks") {
    val prefix = "sai_rp"
    dropIndex(prefix)
    buildBase(prefix, sf001)
    val batch = emb(sf001).filter(col("vec_id") % 5 === 0)
    def ackSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val first = ackSet(StreamAnnIndex.processBatch(spark, prefix, batch, 3L))
    val n = spark.table(s"${prefix}_codes").count()
    val second = ackSet(StreamAnnIndex.processBatch(spark, prefix, batch, 3L))
    assert(second == first)
    assert(spark.table(s"${prefix}_codes").count() == n,
      "replayed batch must not grow the store")
    // store stays duplicate-free on the primary key
    assert(spark.table(s"${prefix}_codes")
      .groupBy(col("vec_id")).count().filter(col("count") > 1).isEmpty)
    dropIndex(prefix)
  }

  test("a partially-landed append converges under replay") {
    val prefix = "sai_cw"
    dropIndex(prefix)
    buildBase(prefix, sf001)
    val batch = emb(sf001).filter(col("vec_id") % 5 === 0)
    // simulate the crash window: half the batch's encoded rows landed,
    // the batch then replays in full
    val (cents, cb) = Similarity.loadIvfPqModel(spark, prefix)
    val half = Similarity.ivfPqEncode(batch, cents, cb)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("cell"), col("codes"))
    graft.streaming.StreamStoreOps.appendToStore(
      spark, s"${prefix}_codes", half, Seq("cell"))
    StreamAnnIndex.processBatch(spark, prefix, batch, 0L): Unit
    // clean one-shot reference store
    val ref = "sai_cw_ref"
    dropIndex(ref)
    buildBase(ref, sf001)
    StreamAnnIndex.processBatch(spark, ref, batch, 0L): Unit
    assert(codeRows(spark.table(s"${prefix}_codes")) ==
      codeRows(spark.table(s"${ref}_codes")))
    dropIndex(prefix)
    dropIndex(ref)
  }

  test("a re-submitted vec_id is acked with its STANDING cell, store untouched") {
    val prefix = "sai_upd"
    dropIndex(prefix)
    buildBase(prefix, sf001)
    val pair = emb(sf001).filter(col("vec_id") % 5 === 0).limit(2)
      .collect()
    val (vid, e1) = (pair(0).getLong(0), pair(0).getSeq[Float](1))
    val e2 = pair(1).getSeq[Float](1) // a different vector's embedding
    import spark.implicits._
    def ackOf(embv: scala.collection.Seq[Float], bid: Long) =
      StreamAnnIndex.processBatch(spark, prefix,
        Seq((vid, embv)).toDF("vec_id", "embedding"), bid)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val first = ackOf(e1, 0L)
    val stored = spark.table(s"${prefix}_codes")
      .filter(col("vec_id") === vid).collect()
    assert(stored.length == 1)
    // update attempt under a changed embedding: insert-once keeps the
    // standing row, and the ack must carry ITS cell — never a fresh
    // encoding the index didn't store
    val second = ackOf(e2, 1L)
    assert(second == first,
      s"re-submission ack diverged from the standing row: $second vs $first")
    assert(codeRows(spark.table(s"${prefix}_codes")
      .filter(col("vec_id") === vid)) == codeRows(spark.createDataFrame(
        spark.sparkContext.parallelize(stored.toIndexedSeq), stored(0).schema)),
      "update attempt must not mutate the standing row")
    dropIndex(prefix)
  }

  test("duplicate vec_ids within a batch collapse to one store row") {
    val prefix = "sai_dup"
    dropIndex(prefix)
    buildBase(prefix, sf001)
    val one = emb(sf001).filter(col("vec_id") % 5 === 0).limit(3)
    val acks = StreamAnnIndex.processBatch(spark, prefix,
      one.union(one), 0L)
    assert(acks.count() == 3)
    assert(spark.table(s"${prefix}_codes")
      .groupBy(col("vec_id")).count().filter(col("count") > 1).isEmpty)
    dropIndex(prefix)
  }

  test("blue-green serve absorbs streamed adds without a restart") {
    val prefix = "sai_bg"
    dropIndex(prefix)
    buildBase(prefix, sf001)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    Similarity.clearIvfPqModelCache()
    // queries = five new vectors' own embeddings under fresh q_ids, so
    // once those vectors are added each query's top-k must change (its
    // own code word scores the minimum ADC)
    val newVecs = emb(sf001).filter(col("vec_id") % 5 === 0).limit(5)
      .localCheckpoint(true)
    val ts = java.sql.Timestamp.valueOf("2017-03-05 00:00:00")
    val qRows = newVecs.collect()
      .map(r => (r.getLong(0) + 1000000L, ts, r.getSeq[Float](1)))
    val perBatch =
      scala.collection.concurrent.TrieMap[Long, Set[(Long, Long, Double)]]()
    def rows(df: DataFrame) = df
      .select(col("q_id"), explode(col("topk")).as("t"))
      .select(col("q_id"), col("t.neighbor_id"), col("t.adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val mem = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])]
    val q = Similarity.annServeStreamBlueGreen(
      mem.toDF().toDF("q_id", "event_ts", "embedding"),
      prefix = prefix) { (out, bid) => perBatch(bid) = rows(out) }
    mem.addData(qRows.toIndexedSeq: _*)
    q.processAllAvailable()
    // the index grows mid-stream, from a DIFFERENT session than the
    // one executing the serve batches
    StreamAnnIndex.processBatch(spark, prefix, newVecs, 0L): Unit
    mem.addData(qRows.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val queries = newVecs.select((col("vec_id") + 1000000L).as("q_id"),
      lit(ts).as("event_ts"), col("embedding"))
    val after = rows(Similarity.serveBatch(queries, prefix = prefix))
    assert(perBatch(1L) == after,
      s"post-add serve batch diverges from a fresh serve over the grown " +
        s"store: only-stream=${(perBatch(1L) -- after).take(3)} " +
        s"only-fresh=${(after -- perBatch(1L)).take(3)}")
    assert(perBatch(0L) != perBatch(1L),
      "fixture inert: the added vectors did not change any query's top-k")
    dropIndex(prefix)
  }

  test("compaction preserves the serve answer and collapses the file pile") {
    val prefix = "sai_cmp"
    dropIndex(prefix)
    buildBase(prefix, sf001)
    val newbies = emb(sf001).filter(col("vec_id") % 5 === 0)
      .withColumn("b", pmod(col("vec_id"), lit(4)))
    (0 until 4).foreach(b => StreamAnnIndex.processBatch(spark, prefix,
      newbies.filter(col("b") === b).drop("b"), b.toLong): Unit)
    val (cents, cb) = Similarity.loadIvfPqModel(spark, prefix)
    def serve() = serveRows(Similarity.ivfPqScore(
      emb(sf001), spark.table(s"${prefix}_codes"), cents, cb, probes = 1))
    val before = serve()
    // stamp the identity properties an ensure/serve fleet depends on
    spark.sql(s"ALTER TABLE ${prefix}_codes SET TBLPROPERTIES " +
      "('graft.source.dir' = '/some/canonical/dir')")
    def props = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        s"${prefix}_codes")).properties
    val rebuildBefore = props("graft.rebuild.id")
    val revBefore = props.get("graft.store.rev")
    val (nBefore, nAfter) = StreamAnnIndex.compactStore(spark, prefix)
    assert(nAfter < nBefore, s"expected fewer files, got $nBefore -> $nAfter")
    assert(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        s"${prefix}_codes")).bucketSpec.isDefined,
      "compaction must preserve the bucket layout")
    // identity survives maintenance: the build-once guard's source dir
    // and the model-cache rebuild id are the SAME table, new files —
    // losing them made the next ensure silently retrain and DISCARD
    // every streamed-in vector
    assert(props.get("graft.source.dir").contains("/some/canonical/dir"),
      "compaction dropped graft.source.dir — the next ensure would retrain")
    assert(props.get("graft.rebuild.id").contains(rebuildBefore),
      "compaction dropped/changed graft.rebuild.id")
    assert(props.get("graft.store.rev") != revBefore,
      "compaction must BUMP the append revision so serve fleets re-list")
    assert(serve() == before, "compaction changed a serve answer")
    dropIndex(prefix)
  }
}
