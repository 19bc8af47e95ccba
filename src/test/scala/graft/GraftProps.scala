package graft

import graft.ext.Multimodal
import graft.streaming.{SensorReading, StreamIngest}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import java.sql.Timestamp

/** Property-based checks (SURVEY.md §5 test plan). Spark-backed
  * properties are capped at a small number of cases — each case is a
  * full local job. */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // --- pure: fake frame decode -------------------------------------

  property("fakeDecodeFrame covers min(len, 8*frameSize) bytes in order") =
    forAll(Gen.choose(0, 2000), Gen.choose(1, 128)) { (len: Int, fs: Int) =>
      val payload = Array.tabulate(len)(i => (i % 251).toByte)
      val frames = Multimodal.fakeDecodeFrame(payload, fs).toSeq
      val covered = frames.map(_._2).sum
      covered == math.min(len, 8 * fs) &&
        frames.map(_._1) == frames.indices &&
        frames == Multimodal.fakeDecodeFrame(payload, fs).toSeq
    }

  // --- spark: throttle matches a sequential reference model --------

  private def model(events: Seq[(String, Long)], gap: Long): Set[(String, Long)] =
    events.groupBy(_._1).toSeq.flatMap { case (e, evs) =>
      var last = Long.MinValue
      evs.map(_._2).sorted.flatMap { t =>
        // t == last passes too: sibling rows stamped at the kept
        // instant belong to the kept (whole-entity) update — the
        // reference's per-entity PUT semantics
        if (last == Long.MinValue || t == last || t - last >= gap) {
          last = t; Some(e -> t)
        } else None
      }
    }.toSet

  private val eventsGen: Gen[List[(String, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.oneOf("A", "B", "C"), Gen.choose(0L, 500L)))

  property("throttle == sequential keep-first model (batch mode)") =
    forAll(eventsGen, Gen.choose(1L, 200L)) { (events, gap) =>
      val spark = SparkSpec.session
      import spark.implicits._
      // de-dup identical (entity, ts) pairs: arrival order between equal
      // timestamps is tie-broken arbitrarily in both model and engine
      val uniq = events.distinct
      val ds = uniq.map { case (e, t) =>
        SensorReading(e, e, "temperature", 1.0, new Timestamp(t))
      }.toDS()
      val got = StreamIngest.throttle(ds, gap).collect()
        .map(r => (r.entityid, r.event_ts.getTime)).toSet
      Prop(got == model(uniq, gap)) :| s"events=$uniq gap=$gap got=$got expected=${model(uniq, gap)}"
    }

  // --- spark: span dedup matches a sequential reference model ------

  /** Independent model of [[graft.ext.TextAnalysis.spanDedupOnDocs]]:
    * first occurrence of each 8-gram is canonical; every later
    * occurrence marks its 8 positions dropped. */
  private def spanModel(words: List[String]): (Int, Long, String) = {
    val n = words.length
    val spanN = 8
    val firsts = scala.collection.mutable.Map.empty[String, Int]
    val dropped = scala.collection.mutable.Set.empty[Int]
    for (q <- 0 to n - spanN) {
      val g = words.slice(q, q + spanN).mkString(" ")
      firsts.get(g) match {
        case None => firsts(g) = q
        case Some(f) if q > f => (q until q + spanN).foreach(dropped += _)
        case _ =>
      }
    }
    val kept = words.indices.filterNot(dropped).map(words)
    (n, kept.size.toLong, kept.mkString(" "))
  }

  private val wordsGen: Gen[List[String]] =
    Gen.choose(1, 28).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b")))

  property("span dedup == sequential first-occurrence model") =
    forAll(wordsGen) { words =>
      val spark = SparkSpec.session
      import spark.implicits._
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val r = graft.ext.TextAnalysis.spanDedupOnDocs(df).collect()(0)
      val got = (r.getInt(1), r.getLong(2), r.getString(4))
      val want = spanModel(words)
      Prop(got == want) :| s"words=$words got=$got want=$want"
    }

  // --- spark: minhash containment ----------------------------------

  property("identical texts get identical minhash signatures") =
    forAll(Gen.listOfN(8, Gen.oneOf("scan", "agg", "join", "row", "table"))) { words =>
      words.size >= 3 ==> {
        val spark = SparkSpec.session
        import spark.implicits._
        val text = words.mkString(" ")
        // two docs with the same text must collide on every band
        val df = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
        val tmp = java.nio.file.Files.createTempDirectory("graft_prop").toString
        df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
        val sig = ext.Dedup.dedupMinhash(spark, tmp).collect()
        Prop(sig.length == 2 &&
          sig.forall(_.getAs[Long]("n_sig_mates") == 2L) &&
          sig.map(_.getAs[String]("band0")).distinct.length == 1)
      }
    }

  // --- spark: winnowing matches a pure reference model --------------

  /** Pure-JVM replay of md5_prefix60: first 15 md5 hex digits as a
    * base-16 number == first 8 digest bytes big-endian, unsigned-shifted
    * by 4 (15 hex digits = 60 bits). */
  private def md5p60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  /** Reference winnowing: 4-gram hashes, w=4 window minima, rightmost
    * tie, deduplicated (pos, fp) selections. */
  private def winnowModel(tokens: Seq[String]): Set[(Int, Long)] =
    if (tokens.length < 4) Set.empty
    else {
      val kg = tokens.sliding(4).map(_.mkString(" ")).map(md5p60).toVector
      (0 to math.max(kg.length - 4, 0)).map { j =>
        val win = kg.slice(j, math.min(j + 4, kg.length))
        val mv = win.min
        (j + win.lastIndexOf(mv), mv)
      }.toSet
    }

  property("winnowing == reference window-minimum selection") =
    forAll(Gen.choose(4, 30),
      Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d"))) { (n, pool) =>
      val spark = SparkSpec.session
      import spark.implicits._
      // tiny alphabet forces repeated k-grams, exercising the
      // rightmost-tie rule, not just distinct minima
      val toks = pool.take(n)
      val df = Seq((0L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = ext.TextAnalysis.winnowOnDocs(df).collect()
        .map(r => (r.getInt(1), r.getLong(2))).toSet
      val want = winnowModel(toks)
      Prop(got == want) :| s"toks=$toks got=$got want=$want"
    }

  // --- spark: shard packing invariants -----------------------------

  property("packOnDocs: budget bound, contiguous ids, docs preserved") =
    forAll(
      Gen.choose(10, 60),
      Gen.listOfN(12, Gen.zip(Gen.oneOf("sA", "sB"), Gen.choose(1, 50)))
    ) { (budget, specs) =>
      val spark = SparkSpec.session
      import spark.implicits._
      val docs = specs.zipWithIndex.map { case ((src, nTok), i) =>
        (i.toLong, src, (1 to nTok).map(_ => "w").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val packed = ext.TextAnalysis.packOnDocs(docs, budget).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      val bySrc = packed.groupBy(_._2)
      val budgetOk = bySrc.values.forall(_.groupBy(_._4).values.forall { shard =>
        shard.map(_._3).sum - shard.map(_._3).max < budget
      })
      val contiguous = bySrc.values.forall { rows =>
        val ids = rows.map(_._4).distinct.sorted
        ids.headOption.contains(0L) && ids.lastOption.contains(ids.length - 1L)
      }
      Prop(packed.length == specs.length && budgetOk && contiguous) :|
        s"budget=$budget packed=${packed.toSeq}"
    }

  // --- spark: bloom probe never loses an inserted key ---------------

  property("bloom probe has no false negatives for any key set") =
    forAll(Gen.nonEmptyListOf(Gen.identifier).map(_.distinct.take(40))) { keys =>
      val spark = SparkSpec.session
      import spark.implicits._
      val df = keys.toDF("shingle")
      val bits = ext.Dedup.bloomBits(df, numHashes = 5)
      val probe = ext.Dedup.bloomProbeSql(bits, numHashes = 5, term = "shingle")
      val survived = df.filter(org.apache.spark.sql.functions.expr(probe)).count()
      Prop(survived == keys.length.toLong) :|
        s"${keys.length} keys, $survived survived the probe"
    }

  // --- streaming: funnel state machine vs sequential model ----------

  private val funnelEventsGen: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(25, Gen.zip(
      Gen.choose(0L, 3L),
      Gen.oneOf("view", "click", "purchase", "error"),
      Gen.choose(0L, 1000L))).map(_.distinct)

  property("streaming funnel == sequential model under any batch split") =
    forAll(funnelEventsGen, Gen.choose(0, 24)) { (events, splitAt) =>
      val spark = SparkSpec.session
      import spark.implicits._
      implicit val sq = spark.sqlContext
      // contract: batches arrive time-ordered; split anywhere in that order
      val ordered = events.sortBy(e => (e._3, e._2, e._1))
      val truth = ordered.groupBy(_._1).map { case (uid, rows) =>
        val stages = Array("view", "click", "purchase")
        // ts ties resolve in FUNNEL-STAGE order (view < click < purchase),
        // mirroring the operator — a same-ts view+click advances twice.
        def ord(t: String) = { val i = stages.indexOf(t); if (i < 0) 3 else i }
        var stage = 0; var tEntry = Long.MinValue
        rows.sortBy(r => (r._3, ord(r._2))).foreach { case (_, tpe, ts) =>
          if (stage < 3 && tpe == stages(stage) && ts >= tEntry) {
            stage += 1; tEntry = ts
          }
        }
        uid -> stage
      }
      val (b1, b2) = ordered.splitAt(math.min(splitAt, ordered.length))
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
      val out = StreamIngest.funnelStream(
        mem.toDS().toDF("user_id", "event_type", "ts"))
      val name = s"funnel_prop_${System.nanoTime()}"
      val q = out.toDF("user_id", "stage").writeStream.format("memory")
        .queryName(name).outputMode("update").start()
      try {
        if (b1.nonEmpty) { mem.addData(b1: _*); q.processAllAvailable() }
        if (b2.nonEmpty) { mem.addData(b2: _*); q.processAllAvailable() }
        val got = spark.sql(
          s"SELECT user_id, max(stage) FROM $name GROUP BY user_id")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        Prop(got == truth) :| s"split=$splitAt got=$got expected=$truth"
      } finally {
        q.stop()
        spark.catalog.dropTempView(name)
      }
    }

  // --- spark: lake day-fold converges from any crash state ----------

  /** Scenario family for [[graft.sources.LakeFold]]: three string days
    * ("d1" < "d2" < "d3") with disjoint row sets in a day-partitioned
    * sink dir; an ARBITRARY subset of each closed day's rows is already
    * in the lake (residue of a fold that died mid-append, before the
    * completion mark); the watermark closes an arbitrary prefix of
    * days. LakeFoldSpec drives one such scenario end-to-end from a real
    * FileStreamSink; this property sweeps the crash-state space. */
  private val foldScenarioGen: Gen[(Seq[Int], Seq[Boolean], Int, Seq[Boolean])] =
    for {
      rowsPerDay <- Gen.listOfN(3, Gen.choose(1, 4)).map(_.toSeq)
      residue <- Gen.listOfN(15, Gen.oneOf(true, false)).map(_.toSeq)
      wmIdx <- Gen.choose(0, 3) // days with index < wmIdx are closed
      // NULL-keyed rows (e.g. an unparseable reading): the fold's
      // anti-join must be null-SAFE or each crash/re-run duplicates them
      nullRows <- Gen.listOfN(3, Gen.oneOf(true, false)).map(_.toSeq)
    } yield (rowsPerDay, residue, wmIdx, nullRows)

  private var foldPropRuns = 0

  property("foldClosedDays + combinedRead exact from any crash residue") =
    forAll(foldScenarioGen) { case (rowsPerDay, residue, wmIdx, nullRows) =>
      val spark = SparkSpec.session
      import spark.implicits._
      val days = Seq("d1", "d2", "d3")
      val wmDay = "d" + (wmIdx + 1) // "d4" closes everything
      val closed = days.take(wmIdx)
      // (room, value, day): values disjoint across days, so full-row
      // identity — the fold's default anti-join key — is unique; some
      // days also carry a NULL-roomed row to pin anti-join null-safety
      val rows = days.zipWithIndex.flatMap { case (d, i) =>
        (0 until rowsPerDay(i)).map(j => (s"r$j", (i * 10 + j).toDouble, d)) ++
          (if (nullRows(i)) Seq((null: String, (i * 10 + 99).toDouble, d)) else Nil)
      }
      val sinkDf = rows.toDF("room", "value", "day")
      val base = java.nio.file.Files.createTempDirectory("graft_foldprop").toString
      val sink = s"$base/sink"
      sinkDf.write.partitionBy("day").parquet(sink)
      foldPropRuns += 1
      val lake = s"fold_prop_$foldPropRuns"
      graft.sources.TableOps.resetTable(spark, lake,
        spark.read.parquet(sink).limit(0), partitionCols = Seq("day"))
      // crash residue: this subset of CLOSED-day rows already landed
      // (a fold only ever runs on closed days), completion never marked
      val lakeCols = spark.table(lake).columns.toIndexedSeq
      val residueRows = rows.filter(r => closed.contains(r._3))
        .zip(residue).collect { case (r, true) => r }
      if (residueRows.nonEmpty)
        residueRows.toDF("room", "value", "day")
          .select(lakeCols.map(org.apache.spark.sql.functions.col): _*)
          .write.insertInto(lake)

      def combinedSet(): (Long, Set[(String, Double, String)]) = {
        val c = graft.sources.LakeFold.combinedRead(spark, sink, lake)
          .select("room", "value", "day").collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
        (c.length.toLong, c.toSet)
      }
      val want = rows.toSet
      val (nCrash, sCrash) = combinedSet() // exact even BEFORE recovery
      val folded = graft.sources.LakeFold.foldClosedDays(spark, sink, lake, wmDay)
      val lakeGot = spark.table(lake).select("room", "value", "day").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
      val wantLake = rows.filter(r => closed.contains(r._3))
      val (nAfter, sAfter) = combinedSet()
      val again = graft.sources.LakeFold.foldClosedDays(spark, sink, lake, wmDay)
      val (nAgain, sAgain) = combinedSet()
      spark.sql(s"DROP TABLE IF EXISTS $lake")
      Prop(
        nCrash == rows.length && sCrash == want &&
          folded == closed &&
          lakeGot.length == wantLake.length && lakeGot.toSet == wantLake.toSet &&
          nAfter == rows.length && sAfter == want &&
          again.isEmpty &&
          nAgain == rows.length && sAgain == want
      ) :| s"rowsPerDay=$rowsPerDay residue=$residueRows wm=$wmDay " +
        s"folded=$folded lake=${lakeGot.toSeq}"
    }

  // --- spark: corpus shuffle is a bijective deal on ANY id set -----

  property("corpus shuffle: bijective deal, contiguous shards, seed-stable") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)).map(_.distinct),
      Gen.choose(1, 8),
      Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
    ) { (ids, shards, seed) =>
      val spark = SparkSpec.session
      import spark.implicits._
      val docs = ids.toDF("doc_id")
      def deal() = graft.ext.TextAnalysis.corpusShuffleOn(docs, seed, shards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val out = deal()
      val cover = out.length == ids.length &&
        out.map(_._1).toSet == ids.toSet
      val inRange = out.forall { case (_, sh, _) => sh >= 0 && sh < shards }
      val contiguous = out.groupBy(_._2).forall { case (_, rows) =>
        rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong)
      }
      // same input re-dealt (and re-partitioned) is bit-identical
      val again = graft.ext.TextAnalysis
        .corpusShuffleOn(docs.repartition(7), seed, shards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val stable = out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq
      Prop(cover && inRange && contiguous && stable) :|
        s"ids=${ids.take(5)}... shards=$shards seed=$seed out=${out.take(5)}..."
    }

  // --- spark: corpus mix quota law on ANY corpus shape -------------

  property("corpus mix: exact quota law, prefix-kept, partition-stable") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 1000000L), Gen.choose(0, 19)))
        .map(_.distinctBy(_._1)),
      Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
    ) { (docs0, seed) =>
      val spark = SparkSpec.session
      import spark.implicits._
      val docs = docs0.map { case (id, k) => (id, s"src$k") }
        .toDF("doc_id", "source")
      def mix(df: org.apache.spark.sql.DataFrame) =
        graft.ext.TextAnalysis.corpusMixOn(df, seed).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getBoolean(4)))
      val out = mix(docs)
      val cover = out.length == docs0.length &&
        out.map(_._1).toSet == docs0.map(_._1).toSet
      // recompute the integer quota law independently of the dataflow
      val bySrc = out.groupBy(_._2)
      val wOf = (s: String) => s.drop(3).toLong % 4 + 1
      val u12 = bySrc.map { case (s, rs) => rs.length * (12 / wOf(s)) }.min
      val quotaLaw = bySrc.forall { case (s, rs) =>
        val q = wOf(s) * u12 / 12
        rs.forall(_._4 == q) && rs.count(_._5) == q &&
          rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong) &&
          rs.filter(_._5).map(_._3).toSet == (1L to q).toSet
      }
      val again = mix(docs.repartition(7))
      val stable = out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq
      Prop(cover && quotaLaw && stable) :|
        s"docs=${docs0.take(5)}... seed=$seed u12=$u12 out=${out.take(3)}..."
    }

  // --- spark: incremental mix re-quota law on ANY arrival shape -----

  property("incremental mix: per-wave quota law, final wave == batch mix") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 1000000L), Gen.choose(0, 19), Gen.choose(0, 3)))
        .map(_.distinctBy(_._1)),
      Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
    ) { (docs0, seed) =>
      val spark = SparkSpec.session
      import spark.implicits._
      val waves = 4
      val docs = docs0.map { case (id, k, wv) => (id, s"src$k", wv) }
        .toDF("doc_id", "source", "wave")
      val out = graft.ext.TextAnalysis.corpusMixIncrOn(docs, seed, waves)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          (0 until waves).map(k =>
            if (r.isNullAt(5 + k)) None else Some(r.getBoolean(5 + k)))))
      val cover = out.length == docs0.length &&
        out.map(_._1).toSet == docs0.map(_._1).toSet
      val arrival = out.forall { case (_, _, wv, ks) =>
        ks.zipWithIndex.forall { case (k, i) => k.isDefined == (wv <= i) } }
      // the exact integer law must hold at EVERY wave prefix
      val wOf = (s: String) => s.drop(3).toLong % 4 + 1
      val law = (0 until waves).forall { k =>
        val present = out.filter(_._3 <= k)
        present.isEmpty || {
          val bySrc = present.groupBy(_._2)
          val u12 = bySrc.map { case (s, rs) => rs.length * (12 / wOf(s)) }.min
          bySrc.forall { case (s, rs) =>
            rs.count(_._4(k).contains(true)) == wOf(s) * u12 / 12 }
        }
      }
      // the last re-quota must agree with a from-scratch batch mix
      val batch = graft.ext.TextAnalysis
        .corpusMixOn(docs.select($"doc_id", $"source"), seed).collect()
        .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      val finalAgrees = out.forall { case (id, _, _, ks) =>
        ks(waves - 1).contains(batch(id)) }
      Prop(cover && arrival && law && finalAgrees) :|
        s"docs=${docs0.take(5)}... seed=$seed out=${out.take(3)}..."
    }

  // --- spark: streaming DSIR selection is batching-invariant --------

  private val dsirCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private val dsirVocab = Gen.oneOf("scan", "agg", "join", "row", "table",
    "fast", "key", "part", "hash", "data")
  private val dsirDocsGen: Gen[List[(Long, String, String)]] =
    Gen.sequence[List[(Long, String, String)], (Long, String, String)](
      (0 until 24).toList.map { i =>
        for {
          src <- if (i < 6) Gen.const("src0")
                 else Gen.oneOf("src2", "src3", "src17")
          n <- Gen.choose(3, 6)
          ws <- Gen.listOfN(n, dsirVocab)
        } yield (i.toLong, src, ws.mkString(" "))
      })

  /** The final selection of [[graft.streaming.StreamDsir]] must not
    * depend on HOW arrivals were batched: every batching of the same
    * pool yields (a) the reference keys for every pool doc, (b)
    * selected == top-k over those keys, (c) at most one eviction per
    * doc, only ever after an admission — the running-Gumbel-top-k
    * model the replay twin's oracle encodes, here exercised on random
    * corpora and random batchings instead of the fixture's four
    * waves. */
  property("streaming dsir final selection is batching-invariant") =
    forAll(dsirDocsGen, Gen.listOfN(24, Gen.choose(0, 2)),
      Gen.choose(2, 6)) { (docs, assign, k) =>
      val spark = SparkSpec.session
      import spark.implicits._
      val pfx = s"prop_dsir${dsirCounter.incrementAndGet()}"
      Seq("model", "scores", "thr", "ledger").foreach(t =>
        graft.sources.TableOps.dropWithLocation(spark, s"${pfx}_$t"))
      val all = docs.toDF("doc_id", "source", "text")
      graft.streaming.StreamDsir.modelWrite(spark, pfx, all)
      val batches = docs.zip(assign).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (b, ds) => (b, ds.map(_._1)) }
      val events = scala.collection.mutable.ArrayBuffer[(Long, Boolean, Long)]()
      batches.foreach { case (b, ds) =>
        events ++= graft.streaming.StreamDsir.processBatch(spark, pfx,
          ds.toDF("doc_id", "source", "text"), b.toLong, "p42", k)
          .select($"doc_id", $"kept", $"batch_id").collect()
          .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      }
      // reference: frozen-model keys over the whole pool, batch top-k
      val pool = all.filter(!$"source".isin("src0", "src1"))
      val refKeys = graft.ext.TextAnalysis
        .dsirScore(pool, spark.table(s"${pfx}_model"), "p42")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val stored = spark.table(s"${pfx}_scores")
        .select($"doc_id", $"gkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val keysOk = stored == refKeys
      val expectSel = refKeys.toSeq.sortBy { case (d, g) => (-g, d) }
        .take(k).map(_._1).toSet
      val gotSel = graft.streaming.StreamDsir.currentSelected(spark, pfx)
        .filter($"selected").select($"doc_id").collect()
        .map(_.getLong(0)).toSet
      val evShape = events.groupBy(_._1).forall { case (_, es) =>
        val seqd = es.sortBy(_._3).map(_._2).toSeq
        seqd.length <= 2 && (seqd.length < 2 || seqd == Seq(true, false))
      }
      Seq("model", "scores", "thr", "ledger").foreach(t =>
        graft.sources.TableOps.dropWithLocation(spark, s"${pfx}_$t"))
      Prop(keysOk && gotSel == expectSel && evShape) :|
        s"k=$k batches=${batches.map(_._2.length)} |sel|=${gotSel.size} " +
          s"expect=${expectSel.size} keysOk=$keysOk evShape=$evShape"
    }
}
