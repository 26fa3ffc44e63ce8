package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.{Caches, DedupIndex, StoreTxn}

/**
 * TWO-PROCESS commit race — the cross-JVM proof behind TxStoreSpec's
 * two-THREAD race test. The hard-link / conditional-PUT claim in
 * [[graft.queries.StoreTxn.commit]] is filesystem-atomic, so the
 * arbitration must hold across separate JVMs on separate page caches,
 * not just across threads sharing one; `tools/commit_race.sh` forks two
 * of these children against one store root and one transaction id and
 * then audits the outcome. Protocol (no parent coordination beyond the
 * fork):
 *
 *   1. `prep`  — reset the store, build the pristine bases.
 *   2. `race <name> <batch>` ×2 concurrently — each child stages the
 *      SAME transaction id under its OWN nonce, drops a `_race_ready.*`
 *      file, spin-waits until BOTH ready files exist (the cross-process
 *      barrier), then commits. Exactly one `commit` must win; the loser
 *      must get the loud IllegalStateException. Prints
 *      `RACE_RESULT name=<n> outcome=winner|loser`.
 *   3. `check` — audits the post-race store: exactly one committed
 *      transaction, its marker content resolves to an existing layer
 *      dir, the reader's keeper set is exactly base ∪ the winner's kept
 *      rows (never a torn mix), and vacuum reclaims exactly the loser's
 *      same-id orphan without moving the read. Prints `RACE_CHECK ok`.
 *
 * Children run plain `java -cp` over the compiled classes plus the
 * Spark jars dir (see the script) — sbt's in-process classloader cannot
 * fork itself, which is why this lives as a tool, not a ScalaTest case.
 */
object CommitRace {

  // same env contract as python/tests/conftest.py, so the cross-JVM
  // audits run on any machine layout (r19 ADVICE)
  private val sf = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def session(app: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def readyFile(name: String) =
    java.nio.file.Paths.get(StoreTxn.root(sf), s"_race_ready.$name")

  def main(args: Array[String]): Unit = args.toList match {
    case "prep" :: Nil =>
      val s = session("race-prep")
      StoreTxn.reset(s, sf)
      StoreTxn.ensureBases(s, sf)
      // stale barrier files from a previous run would unblock a lone child
      java.nio.file.Files.deleteIfExists(readyFile("A"))
      java.nio.file.Files.deleteIfExists(readyFile("B"))
      println("RACE_PREP ok")
      s.stop()

    case "race" :: name :: Nil =>
      val s = session(s"race-$name")
      val batch =
        if (name == "A") DedupIndex.batch1Docs(s, sf)
        else DedupIndex.batch2Docs(s, sf)
      val stats = graft.queries.Tables.t(s, sf, "documents")
        .where(if (name == "A") "doc_id % 10 >= 7 AND doc_id % 10 < 9"
               else "doc_id % 10 = 9")
      val id = StoreTxn.nextTxnId(s, sf)
      val nonce = StoreTxn.newNonce()
      StoreTxn.stage(s, sf, batch, stats, id, nonce)
      java.nio.file.Files.write(readyFile(name), Array.emptyByteArray)
      val deadline = System.currentTimeMillis() + 120000L
      while (!(java.nio.file.Files.exists(readyFile("A")) &&
               java.nio.file.Files.exists(readyFile("B")))) {
        if (System.currentTimeMillis() > deadline)
          sys.error(s"race barrier timed out in $name")
        Thread.sleep(5)
      }
      val outcome =
        try { StoreTxn.commit(s, sf, id, nonce); "winner" }
        catch { case _: IllegalStateException => "loser" }
      println(s"RACE_RESULT name=$name id=$id outcome=$outcome")
      s.stop()

    case "check" :: Nil =>
      val s = session("race-check")
      val dirs = StoreTxn.committedTxnDirs(s, sf)
      require(dirs.size == 1, s"commit log torn across processes: $dirs")
      val (id, winnerDir) = dirs.head
      val hp = new org.apache.hadoop.fs.Path(winnerDir)
      val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      require(fs.exists(hp),
        s"marker resolves to a missing layer dir: $winnerDir")
      // the loser's same-id staging must be on disk as an ORPHAN — a
      // different nonce'd t<id>-* dir the commit log never references
      val winnerName = hp.getName
      val tdirs = fs.listStatus(new org.apache.hadoop.fs.Path(StoreTxn.root(sf)))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.matches(s"t$id(-[0-9a-f]+)?")).toSeq.sorted
      require(tdirs.contains(winnerName) && tdirs.size == 2,
        s"expected winner layer + loser orphan for t$id, got: $tdirs")
      // reader sees winner's rows, and only them beyond the base: every
      // kept row of the winner's layer is readable, and reclaiming the
      // loser's orphan moves nothing
      def keepers: Set[Long] = Caches.scoped(
        StoreTxn.keeperIdsTx(s, sf).collect().map(_.getLong(0)).toSet)
      val winnerKept = Caches.scoped(
        s.read.parquet(s"$winnerDir/kept").select("doc_id")
          .collect().map(_.getLong(0)).toSet)
      val before = keepers
      require(winnerKept.subsetOf(before),
        "winner's committed rows are not all readable")
      require(StoreTxn.vacuum(s, sf) == Seq(id),
        "vacuum did not reclaim exactly the loser's same-id orphan")
      require(keepers == before, "vacuum disturbed the committed read")
      println(s"RACE_CHECK ok id=$id winner=$winnerName")
      s.stop()

    // ---- the CHECKPOINT race: maintenance-vs-maintenance ----
    // Two JVMs run StoreTxn.checkpoint against one store; the
    // maintenance lease must arbitrate — one performs the fold, the
    // other refuses LOUDLY (never a shared staging_ckpt/ interleave) and
    // its RETRY after the winner completes succeeds as a clean redo.

    case "ckptprep" :: Nil =>
      val s = session("ckpt-prep")
      StoreTxn.reset(s, sf)
      StoreTxn.ensureBases(s, sf)
      StoreTxn.absorbBoth(s, sf, DedupIndex.batch1Docs(s, sf),
        graft.queries.Tables.t(s, sf, "documents")
          .where("doc_id % 10 >= 7 AND doc_id % 10 < 9"))
      StoreTxn.absorbBoth(s, sf, DedupIndex.batch2Docs(s, sf),
        graft.queries.Tables.t(s, sf, "documents").where("doc_id % 10 = 9"))
      java.nio.file.Files.deleteIfExists(readyFile("A"))
      java.nio.file.Files.deleteIfExists(readyFile("B"))
      // the committed read the fold must preserve byte-for-byte,
      // recorded for the post-race audit (count + id-sum pins the set)
      val ks = Caches.scoped(
        StoreTxn.keeperIdsTx(s, sf).collect().map(_.getLong(0)))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(StoreTxn.root(sf), "_ckpt_expected"),
        s"${ks.length}:${ks.sum}")
      println("CKPT_PREP ok")
      s.stop()

    case "ckpt" :: name :: Nil =>
      val s = session(s"ckpt-$name")
      java.nio.file.Files.write(readyFile(name), Array.emptyByteArray)
      val deadline = System.currentTimeMillis() + 120000L
      while (!(java.nio.file.Files.exists(readyFile("A")) &&
               java.nio.file.Files.exists(readyFile("B")))) {
        if (System.currentTimeMillis() > deadline)
          sys.error(s"ckpt barrier timed out in $name")
        Thread.sleep(5)
      }
      val outcome =
        try { StoreTxn.checkpoint(s, sf); "winner" }
        catch {
          case e: IllegalStateException
              if e.getMessage.contains("maintenance lease") => "refused"
        }
      println(s"CKPT_RESULT name=$name outcome=$outcome")
      if (outcome == "refused") {
        // the documented retry contract: wait for the holder to finish
        // (lease released), then the SAME verb succeeds as a redo
        val lease = java.nio.file.Paths.get(StoreTxn.root(sf), "maint_lease")
        val d2 = System.currentTimeMillis() + 120000L
        while (java.nio.file.Files.exists(lease)) {
          if (System.currentTimeMillis() > d2)
            sys.error(s"lease never released; retry timed out in $name")
          Thread.sleep(20)
        }
        StoreTxn.checkpoint(s, sf)
        println(s"CKPT_RETRY name=$name ok")
      }
      s.stop()

    case "ckptcheck" :: Nil =>
      val s = session("ckpt-check")
      val r = StoreTxn.root(sf)
      val Array(expN, expSum) = java.nio.file.Files.readString(
        java.nio.file.Paths.get(r, "_ckpt_expected")).split(":")
      // the fold happened: log truncated to the retained high-water
      // marker, whose layer dir is folded away
      val dirs = StoreTxn.committedTxnDirs(s, sf)
      require(dirs.size == 1,
        s"expected the retained high-water marker only, got $dirs")
      val fs = new org.apache.hadoop.fs.Path(r)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      require(!fs.exists(new org.apache.hadoop.fs.Path(dirs.head._2)),
        "retained marker's layer dir was not folded away")
      // no maintenance residue: marker down, lease released, staging gone
      for (p <- Seq("ckpt_pending", "maint_lease", "staging_ckpt"))
        require(!fs.exists(new org.apache.hadoop.fs.Path(s"$r/$p")),
          s"$p left behind after the checkpoint race")
      // the committed read is byte-stable across the race
      val ks = Caches.scoped(
        StoreTxn.keeperIdsTx(s, sf).collect().map(_.getLong(0)))
      require(ks.length == expN.toLong && ks.sum == expSum.toLong,
        s"keeper set moved: ${ks.length}:${ks.sum} != $expN:$expSum")
      println("CKPT_CHECK ok")
      s.stop()

    case other =>
      sys.error(s"usage: prep | race <A|B> | check | " +
        s"ckptprep | ckpt <A|B> | ckptcheck (got: $other)")
  }
}
