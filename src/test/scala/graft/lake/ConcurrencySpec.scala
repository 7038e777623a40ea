package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** End-to-end property test of the optimistic-concurrency commit model
  * (Meta.commit's expectedVersion CAS, VERDICT r4 #7 / r5 next #4): two
  * table handles loaded at the same version interleave ScalaCheck-
  * generated DML and maintenance. The contract under test:
  *
  *  - an operation through a handle that is still at the table's current
  *    version commits normally;
  *  - an operation through a stale handle (the other handle committed
  *    since it loaded) NEVER lands silently — it either surfaces
  *    [[CommitConflictException]] or was a provable no-op (nothing to
  *    commit), and the failed attempt leaves the on-disk version
  *    untouched;
  *  - reload-and-retry after a conflict always succeeds, and the final
  *    table state equals the in-memory model of the ops applied in their
  *    successful-commit order (a serializable history).
  */
class ConcurrencySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("category", StringType),
    StructField("amount", DoubleType)))

  private type ModelRow = (Int, String, Double)

  private def toDf(rows: Seq[ModelRow]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, c, a) => Row(i, c, a) }, 1),
      schema)

  private def observed(t: LakeTable): Seq[ModelRow] =
    t.read().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq.sorted

  // Op scripts are ScalaCheck-generated (fixed seed: failures reproduce).
  // Ints are raw material; the interpreter below maps them onto the
  // model-visible ids so deletes/updates aim at rows the acting handle
  // can actually see.
  private sealed trait Op
  private case class Append(n: Int, catIdx: Int, amount: Int) extends Op
  private case class Delete(pick: Int) extends Op
  private case class Update(pick: Int, amount: Int) extends Op
  private case object Compact extends Op
  private case class Upsert(pick: Int, n: Int, amount: Int) extends Op

  private val genOp: Gen[(Int, Op)] = for {
    handle <- Gen.choose(0, 1)
    op <- Gen.frequency(
      4 -> (for {
        n <- Gen.choose(1, 3); c <- Gen.choose(0, 2); a <- Gen.choose(1, 999)
      } yield Append(n, c, a): Op),
      3 -> Gen.choose(0, 1000).map(Delete(_): Op),
      3 -> (for {
        p <- Gen.choose(0, 1000); a <- Gen.choose(1, 999)
      } yield Update(p, a): Op),
      2 -> (for {
        p <- Gen.choose(0, 1000); n <- Gen.choose(1, 2); a <- Gen.choose(1, 999)
      } yield Upsert(p, n, a): Op),
      1 -> Gen.const(Compact: Op))
  } yield (handle, op)

  private def script(seed: Long, len: Int): List[(Int, Op)] =
    Gen.listOfN(len, genOp)
      .apply(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(sys.error("ScalaCheck generator failed to produce a script"))

  test("racing threads: the version-file write is the single-winner arbiter " +
    "(no silent overwrite between the CAS check and the write)") {
    // Both racers pass the expectedVersion check before either writes —
    // a barrier right at commit entry forces the TOCTOU window. Without
    // the CREATE_NEW write, both would land v2 and one update would be
    // silently lost; with it, exactly one wins per iteration.
    val wh = Files.createTempDirectory("graft-race")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("db")
    var t = cat.createTable("db", "race", schema)
      .append(toDf(Seq((1, "a", 1.0))))
    for (iter <- 0 until 8) {
      val base = Meta.currentVersion(t.location).get
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
      val threads = (0 until 2).map { i =>
        val snap = t.meta.copy(props = t.meta.props + (s"racer-$iter" -> i.toString))
        new Thread(() => {
          try {
            barrier.await()
            Meta.commit(t.location, snap, Some(base))
            results.add(Right(i))
          } catch { case e: Throwable => results.add(Left(e)) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val (losers, winners) = results.toArray(Array.empty[Either[Throwable, Int]])
        .partition(_.isLeft)
      assert(winners.size == 1,
        s"iter $iter: ${winners.size} racers both believe they committed")
      assert(losers.forall(_.left.exists(_.isInstanceOf[CommitConflictException])),
        s"iter $iter: loser failed with the wrong class: $losers")
      // the on-disk state is exactly the winner's (nothing interleaved)
      assert(Meta.currentVersion(t.location).get == base + 1)
      val winnerIdx = winners.head.toOption.get
      t = t.reloaded()
      assert(t.meta.props.get(s"racer-$iter").contains(winnerIdx.toString),
        s"iter $iter: disk state is not the winner's commit")
    }
  }

  test("dueling adopters: concurrent conflict-path recovery converges on the " +
    "orphan, and only CommitConflictException escapes (unique adopt-tmp)") {
    // A writer died after durably publishing v(base+1) but before moving
    // the hint. Two stale committers then race: both find the orphan, both
    // run the adoption path concurrently. Contract (ADVICE r6 / VERDICT r7
    // #5): each adopter uses a private tmp, so the slower one's hint move
    // must not throw NoSuchFileException out of the conflict path — the
    // only escaping class is the retryable CommitConflictException, and
    // the hint lands on the orphan exactly once.
    val wh = Files.createTempDirectory("graft-adopt")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("db")
    val t = cat.createTable("db", "duel", schema).append(toDf(Seq((1, "a", 1.0))))
    val loc = t.location
    val base = Meta.currentVersion(loc).get
    val orphan = t.meta.copy(props = t.meta.props + ("orphan" -> "yes"))
    Files.write(Meta.metadataDir(loc).resolve(s"v${base + 1}.metadata.json"),
      Meta.toJson(orphan).getBytes("UTF-8"))

    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { i =>
      val snap = t.meta.copy(props = t.meta.props + ("duelist" -> i.toString))
      new Thread(() => {
        barrier.await()
        try { Meta.commit(loc, snap, Some(base)); () }
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())

    assert(errs.size == 2, s"both stale committers must conflict: $errs")
    assert(errs.toArray(Array.empty[Throwable])
      .forall(_.isInstanceOf[CommitConflictException]),
      s"non-retryable exception escaped the adoption race: $errs")
    assert(Meta.currentVersion(loc).get == base + 1,
      "both adopters done: the hint must point at the adopted orphan")
    // reload-retry lands on top of the adopted commit, history intact
    val t2 = t.reloaded().append(toDf(Seq((2, "b", 2.0))))
    assert(t2.meta.props.get("orphan").contains("yes"))
    assert(t2.read().count() == 2)
    assert(Meta.currentVersion(loc).get == base + 2)
  }

  test("interleaved handles: lost updates surface as CommitConflictException; " +
    "reload-retry converges to the serializable history") {
    val cats = Array("a", "b", "c")
    for (trial <- 0 until 4) {
      val mor = trial % 2 == 0
      val wh = Files.createTempDirectory(s"graft-cc-$trial")
      val cat = new LakeCatalog(spark, wh)
      cat.createNamespace("db")
      val props = if (mor) Map(
        "write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "merge-on-read") else Map.empty[String, String]
      val seeded = cat.createTable("db", "t", schema, Seq("category"), props)
        .append(toDf((1 to 6).map(i => (i, cats(i % 3), i * 10.0))))
      var model = Vector.tabulate(6)(i => (i + 1, cats((i + 1) % 3), (i + 1) * 10.0))
      var nextId = 6

      val loc = seeded.location
      def diskV: Int = Meta.currentVersion(loc).getOrElse(0)
      val handles = Array(seeded, seeded)
      val handleV = Array(diskV, diskV) // version each handle was loaded at
      var conflicts = 0

      // Interpret one op against a handle; returns the new handle and the
      // model transform it implies. The transform is by-value (ids), so it
      // is identical whether the op lands first-try or after reload-retry.
      def run(h: LakeTable, op: Op): (LakeTable, Vector[ModelRow] => Vector[ModelRow]) =
        op match {
          case Append(n, c, a) =>
            val rows = (0 until n).map { k =>
              nextId += 1; (nextId, cats((c + k) % 3), a.toDouble + k)
            }
            (h.append(toDf(rows)), m => m ++ rows)
          case Delete(pick) =>
            if (model.isEmpty) (h, identity)
            else {
              val id = model(pick % model.size)._1
              (h.delete(col("id") === id), m => m.filterNot(_._1 == id))
            }
          case Update(pick, a) =>
            if (model.isEmpty) (h, identity)
            else {
              val id = model(pick % model.size)._1
              (h.update(Map("amount" -> lit(a.toDouble)), col("id") === id),
                m => m.map(r => if (r._1 == id) (r._1, r._2, a.toDouble) else r))
            }
          case Compact =>
            (Procedures.rewriteDataFiles(h, Map("rewrite-all" -> "true")).table,
              identity)
          case Upsert(pick, n, a) =>
            // one existing key (update) + fresh keys (insert); the model
            // transform removes every older copy of each key and adds the
            // rows — applied to the SERIALIZED model, so a rebased upsert
            // deleting the OTHER handle's rows is captured exactly
            val existing = if (model.isEmpty) Nil else Seq(model(pick % model.size)._1)
            val freshIds = (0 until n).map { _ => nextId += 1; nextId }
            val rows = (existing ++ freshIds).distinct.zipWithIndex
              .map { case (id, k) => (id, cats((id + k) % 3), a.toDouble + k) }
            (h.upsertByKey(toDf(rows), Seq("id")),
              m => m.filterNot(r => rows.exists(_._1 == r._1)) ++ rows)
        }

      for (((hi, rawOp), step) <- script(42L + trial, 14).zipWithIndex) {
        // equality upserts are MoR-only (CoW tables must not carry delete
        // files); on CoW trials the generated Upsert becomes the append it
        // would otherwise start with, keeping the script's commit cadence
        val op = rawOp match {
          case Upsert(p, n, a) if !mor => Append(n, p % 3, a)
          case o => o
        }
        val before = diskV
        val fresh = handleV(hi) == before
        if (fresh) {
          val (nt, f) = run(handles(hi), op)
          handles(hi) = nt; handleV(hi) = diskV; model = f(model)
        } else op match {
          case _: Append | _: Upsert =>
            // append-class writes read no table state: a stale handle
            // REBASES onto fresh metadata and lands without clobbering
            // anything (an upsert's equality delete applies to whatever
            // is strictly older at ITS commit — last-committer-wins)
            val (nt, f) = run(handles(hi), op)
            assert(diskV == before + 1,
              s"trial $trial step $step: stale append rebased to v$diskV, " +
                s"expected v${before + 1}")
            handles(hi) = nt; handleV(hi) = diskV; model = f(model)
          case _ =>
            // state-dependent ops must never silently commit from a stale
            // view: either they conflict, or they prove a no-op (DELETE
            // matching nothing) — in both cases disk is untouched.
            val attempted =
              try { run(handles(hi), op); false }
              catch { case _: CommitConflictException => conflicts += 1; true }
            assert(diskV == before,
              s"trial $trial step $step: stale-handle attempt moved the table " +
                s"v$before -> v$diskV (mor=$mor, op=$op, conflicted=$attempted)")
            val (nt, f) = run(handles(hi).reloaded(), op)
            handles(hi) = nt; handleV(hi) = diskV; model = f(model)
        }
      }

      assert(conflicts > 0,
        s"trial $trial: script produced no conflicts — property untested")
      val fin = handles(0).reloaded()
      assert(observed(fin) == model.sorted,
        s"trial $trial (mor=$mor): final state diverged from the model")
      // the history is a clean linear chain: distinct, strictly
      // increasing snapshot ids — nothing lost or forked
      val ids = fin.meta.snapshots.map(_.id)
      assert(ids == ids.sorted && ids.distinct.size == ids.size)
    }
  }

  test("the commit arbiter is pluggable: a conditional-put (object-store) " +
    "arbiter keeps single-winner semantics through the same race") {
    // Emulates S3's `PutObject If-None-Match: *` (VERDICT r10 #4): an
    // atomic putIfAbsent on the object map IS the conditional PUT; a
    // winning put mirrors the object to the local path so every reader,
    // the hint swing and the sweeps run unchanged. Proves the protocol
    // needs nothing from the filesystem beyond what the arbiter trait
    // states — swap the primitive, keep the guarantees.
    object S3LikeArbiter extends CommitArbiter {
      val objects =
        new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
      val rejected = new java.util.concurrent.atomic.AtomicInteger
      override def publish(target: java.nio.file.Path,
          bytes: Array[Byte]): Boolean =
        if (S3LikeArbiter.objects.putIfAbsent(target.toString, bytes) != null) {
          rejected.incrementAndGet(); false // 412 Precondition Failed
        } else { Files.write(target, bytes); true }
    }
    val prev = Meta.arbiter
    Meta.arbiter = S3LikeArbiter
    try {
      val wh = Files.createTempDirectory("graft-s3race")
      val cat = new LakeCatalog(spark, wh)
      cat.createNamespace("db")
      var t = cat.createTable("db", "s3r", schema)
        .append(toDf(Seq((1, "a", 1.0))))
      for (iter <- 0 until 4) {
        val base = Meta.currentVersion(t.location).get
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val results =
          new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
        val threads = (0 until 2).map { i =>
          val snap = t.meta.copy(props =
            t.meta.props + (s"s3racer-$iter" -> i.toString))
          new Thread(() => {
            try {
              barrier.await()
              Meta.commit(t.location, snap, Some(base))
              results.add(Right(i))
            } catch { case e: Throwable => results.add(Left(e)) }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        val (losers, winners) = results.toArray(Array.empty[Either[Throwable, Int]])
          .partition(_.isLeft)
        assert(winners.size == 1,
          s"iter $iter: ${winners.size} racers both believe they committed")
        assert(losers.forall(
          _.left.exists(_.isInstanceOf[CommitConflictException])))
        assert(Meta.currentVersion(t.location).get == base + 1)
        t = t.reloaded()
        assert(t.meta.props.get(s"s3racer-$iter")
          .contains(winners.head.toOption.get.toString))
      }
      assert(S3LikeArbiter.rejected.get > 0,
        "no conditional-put rejection fired — the race never exercised " +
          "the arbiter's loser path")
      // normal DML keeps working through the swapped arbiter
      t = t.append(toDf(Seq((2, "b", 2.0))))
      assert(observed(t.reloaded()) == Seq((1, "a", 1.0), (2, "b", 2.0)))
    } finally Meta.arbiter = prev
  }
}
