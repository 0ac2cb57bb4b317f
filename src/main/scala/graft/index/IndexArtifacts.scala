package graft.index

import graft.analysis.Analyzer
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analyze-once persisted index artifacts — the Spark-native analog of
  * what an ES server amortizes across queries by maintaining a Lucene
  * index (elasticsearch-hadoop delegates all of this to the server;
  * graft re-expresses it as columnar side tables beside the index
  * directory).
  *
  * Layout (inside the index directory — every name is underscore-
  * prefixed, so Spark's hidden-path filter keeps artifact files out of
  * ordinary reads of the index, and the `_graft_` infix keeps the dir
  * out of pattern/cat listings like all machinery paths):
  *
  * {{{
  * <index>/_graft_analysis/<textCol>/postings/   (term, id, tf, dl) — inverted index
  * <index>/_graft_analysis/<textCol>/df/         (term, df)         — document frequency
  * <index>/_graft_analysis/<textCol>/stats/      (n_docs, avgdl)    — 1 row
  * <index>/_graft_analysis/<textCol>/_graft_meta.json  fingerprint   — commit point
  * }}}
  *
  * Scale shape: the build pays ONE corpus tokenize + one (term,id)
  * exchange — the same work every single BM25 query pays today — and
  * every subsequent query reads only the postings of ITS OWN terms:
  * postings are range-partitioned and sorted by term, so a
  * `term IN (...)` predicate prunes whole files and row groups via
  * parquet min/max stats. Query-time cost becomes proportional to the
  * matched postings, not the corpus (at 100 TB, the difference between
  * re-reading 100 TB of text per query and reading a few MB of posting
  * rows).
  *
  * Freshness: `_graft_meta.json` records an md5 fingerprint of the
  * live data files (relative path, length, mtime of every non-hidden
  * file) and is written LAST, making it the commit point. A stale
  * artifact — data appended or swapped after the build — fingerprint-
  * mismatches and readers fall back to on-the-fly analysis; a build
  * that crashed before the meta write is simply absent. The crash-safe
  * index swap (Connector.save's `_graft_tmp` rename) replaces the
  * whole index directory, artifacts included, so a swap can never
  * leave new data paired with old artifacts.
  */
object IndexArtifacts {

  /** Build-once artifact directory keyed by source fingerprint, safe
    * against CONCURRENT builders and stale generations (the r13
    * advice): `loaded(finalDir)` probes for a fresh artifact; when
    * absent, `build(stagingDir)` runs into a process-unique sibling
    * path and the result is ATOMICALLY renamed into place — two
    * concurrent harness runs over the same testdata can never observe
    * a partially-written artifact at the final path, and the rename
    * loser just deletes its staging copy and reads the winner's.
    * Sibling dirs from EARLIER testdata generations (same kind+user
    * prefix, different fingerprint) are best-effort swept, so /tmp
    * stops accumulating one artifact tree per regeneration. */
  /** Artifact root: `graft.artifacts.root` on the active session (any
    * Hadoop-FS-addressable URI), defaulting to /tmp on the root's own
    * filesystem. r15: the whole commit path runs on the Hadoop
    * FileSystem API (staging dir + `fs.rename` commit), so artifacts
    * are storage-portable; NIO is gone. ATOMICITY CAVEAT (r16):
    * rename-as-commit is atomic on HDFS and local filesystems ONLY.
    * S3A rename is a non-atomic O(data) copy — a concurrent reader on
    * s3a:// can observe a partially-copied artifact that the exists()
    * pre-check treats as committed. Point concurrent builders at an
    * HDFS or local root; an S3A root is safe only when one process
    * owns the build (the same restriction S3A puts on
    * FileOutputCommitter v1, which this layer mirrors). */
  private def artifactRoot: String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s => s.conf.getOption("graft.artifacts.root"))
      .getOrElse("/tmp")

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** FS-API directory probe for `ensureArtifact` loaded() callbacks:
    * artifact roots may be Hadoop-FS URIs (hdfs://, s3a://) where a
    * java.io.File probe always returns false — the artifact would
    * rebuild every run only to lose the rename race and discard its
    * staging copy (the r15 q_knn_pq_dist fix, shared here so every
    * directory-shaped artifact probes the same way). */
  def fsDirExists(spark: SparkSession, p: String): Boolean = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.getFileStatus(path).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }

  def ensureArtifact(kind: String, srcFp: String)
      (loaded: String => Boolean)(build: String => Unit): String = {
    val user = System.getProperty("user.name")
    val prefix = s"graft_${kind}_${user}_"
    val root = new Path(artifactRoot)
    val fs = root.getFileSystem(hadoopConf)
    val finalPath = new Path(root, s"$prefix$srcFp")
    // scheme-less roots (the /tmp default) hand callers plain paths so
    // java.io.File probes keep working; a URI root (s3a://, hdfs://)
    // must KEEP its scheme or loaded()/build() would resolve against
    // the wrong (default) filesystem
    def external(p: Path): String =
      if (root.toUri.getScheme == null)
        Path.getPathWithoutSchemeAndAuthority(p).toString
      else p.toString
    val finalDir = external(finalPath)
    if (!loaded(finalDir)) {
      // sweep stale generations (same kind+user, other fingerprint)
      try fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n != s"$prefix$srcFp")
          try { fs.delete(st.getPath, true); () } catch { case _: Throwable => () }
      } catch { case _: Throwable => () }
      val staging = new Path(root,
        s".$prefix${srcFp}_stage_${ProcessHandle.current().pid()}_${System.nanoTime()}")
      try build(external(staging))
      catch { case e: Throwable =>
        // a failed build must not leak its half-written staging dir
        try { fs.delete(staging, true); () } catch { case _: Throwable => () }
        throw e
      }
      // rename-as-commit. Hadoop rename into an EXISTING directory
      // does not fail like NIO ATOMIC_MOVE: it moves the source
      // INSIDE the destination (or copy-falls-back on the local FS),
      // so a pre-check decides the race and a post-check repairs the
      // narrow window where a concurrent winner lands between the two
      // (the nested leftover is deleted; the winner's artifact is the
      // one both readers see either way).
      val won =
        if (fs.exists(finalPath)) false
        else (try fs.rename(staging, finalPath) catch { case _: Throwable => false })
      if (won) {
        val nested = new Path(finalPath, staging.getName)
        if (fs.exists(nested)) {
          try { fs.delete(nested, true); () } catch { case _: Throwable => () }
        }
      } else {
        try { fs.delete(staging, true); () } catch { case _: Throwable => () }
        require(fs.exists(finalPath),
          s"artifact commit failed and no concurrent winner exists at $finalPath")
      }
    }
    finalDir
  }

  val AnalysisDirName = "_graft_analysis"

  def analysisDir(indexPath: String, textCol: String): String =
    s"$indexPath/$AnalysisDirName/$textCol"

  /** md5 over the sorted (relative path, length, mtime) of every
    * non-hidden file under the index dir — changes on any append,
    * overwrite or swap; ignores artifact/machinery paths themselves
    * (underscore-prefixed), so building artifacts does not invalidate
    * the fingerprint they record. */
  def dataFingerprint(spark: SparkSession, indexPath: String): String = {
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify BEFORE stripping: listStatus returns scheme-qualified
    // child paths, so stripping the raw input string would be a no-op
    // and the fingerprint would embed absolute addresses — the same
    // directory addressed two ways ("/idx" vs "file:///idx") would
    // then mismatch forever and silently disable analyze-once
    val root = fs.makeQualified(new Path(indexPath))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(d: Path): Unit =
      fs.listStatus(d).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath)
          else lines += s"${st.getPath.toString.stripPrefix(root.toString)}:${st.getLen}:${st.getModificationTime}"
        }
      }
    walk(root)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(lines.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Build (or rebuild) the analysis artifacts for one text column.
    * One corpus tokenize; postings land range-partitioned + sorted by
    * term for query-time row-group pruning. The df table derives from
    * the PERSISTED postings (not a second tokenize), and the meta
    * fingerprint is written last as the commit point. */
  def buildAnalysis(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      textCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = analysisDir(indexPath, textCol)
    val docs = spark.read.format(fmt).load(indexPath)
    // pinned for the build: postings, stats and the id-cleanliness
    // audit are three actions over the tokenized frame — unpinned,
    // each would re-scan and re-tokenize the corpus (at cluster scale
    // prefer checkpointing the projected frame if it outgrows storage)
    val toks = docs.select(
      col(idCol).as("id"), Analyzer.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      toks
        .select(col("id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy(col("term"), col("id"), col("dl"))
        .agg(count(lit(1)).cast("double").as("tf"))
        .repartitionByRange(col("term"))
        .sortWithinPartitions(col("term"))
        .write.mode("overwrite").parquet(s"$dir/postings")
      // one row per (term, doc) -> count per term IS the document freq
      spark.read.parquet(s"$dir/postings")
        .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
        .write.mode("overwrite").parquet(s"$dir/df")
      // the exact stats frame bm25ComponentsFromToks computes on the
      // fly: n_docs counts EVERY doc (null text incl), avgdl skips nulls
      toks.agg(
        count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
        .write.mode("overwrite").parquet(s"$dir/stats")
      // per-doc lengths, every doc (dl null for null text): the
      // known-id set + stats merge base an incremental append reads
      toks.select(col("id"), col("dl"))
        .write.mode("overwrite").parquet(s"$dir/doclen")
      // id-cleanliness audit, recorded in the meta: the filter-context
      // postings SEMI-JOIN rewrite is row-set-equal to the predicate
      // path only when ids are unique and non-null (a null id never
      // joins; a duplicated id over-matches its sibling rows) — score
      // paths tolerate both, so they check freshness only
      val audit = toks.agg(
        count(lit(1)).as("n"),
        count(col("id")).as("n_nonnull"),
        countDistinct(col("id")).as("n_distinct"),
        count(col("dl")).as("n_dl"),
        sum(col("dl")).as("dl_sum")).head()
      val idsClean = !audit.isNullAt(0) &&
        audit.getLong(0) == audit.getLong(1) &&
        audit.getLong(0) == audit.getLong(2)
      writeAnalysisMeta(spark, indexPath, dir, idCol, textCol, idsClean,
        audit.getLong(0), audit.getLong(3),
        if (audit.isNullAt(4)) 0.0 else audit.getDouble(4))
    } finally toks.unpersist(false)
  }

  /** dl values are integer token counts, so the double sums here are
    * EXACT below 2^53 total tokens — the merged avgdl an append
    * produces is bit-equal to a full rebuild's avg(). */
  private def writeAnalysisMeta(
      spark: SparkSession, indexPath: String, dir: String,
      idCol: String, textCol: String, idsClean: Boolean,
      nDocs: Long, nDl: Long, dlSum: Double): Unit = {
    val fp = dataFingerprint(spark, indexPath)
    val metaPath = new Path(s"$dir/_graft_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      (s"""{"fingerprint":"$fp","id_col":"$idCol","text_col":"$textCol",""" +
        s""""ids_clean":$idsClean,"n_docs":$nDocs,"n_dl":$nDl,""" +
        s""""dl_sum":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(dlSum))}}""")
        .getBytes("UTF-8"))
    out.close()
  }

  /** Incremental analysis append — the daily-ingest shape for the BM25
    * artifact (an ES index analyzes only the new documents; a full
    * rebuild per append would pay the whole-corpus tokenize ES never
    * pays). Trust contract: index mutations flow through
    * Connector.save (the same contract an ES index has with its API) —
    * an out-of-band file replacement that preserves ids and row count
    * is indistinguishable from "nothing changed" here; any mutation
    * that changes counts or ids is caught by the overlap check and
    * rebuilt. Only docs absent from the stored doclen table tokenize;
    * their postings/doclen rows append, the df table merges
    * (vocabulary-sized work), and the stats scalars merge EXACTLY
    * (integer-valued doubles). Falls back to a full `buildAnalysis`
    * when the increment cannot be proven safe: an appended id that
    * already exists would leave its new row invisible to the postings
    * (silently wrong scores), null ids cannot be anti-joined away on
    * the next refresh, and a pre-incremental meta lacks the merge
    * scalars. */
  def refreshAnalysis(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      textCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = analysisDir(indexPath, textCol)
    val metaJ = readMetaJson(spark, s"$dir/_graft_meta.json")
    val merge = metaJ.flatMap { m =>
      (m \ "id_col", m \ "ids_clean", m \ "n_docs", m \ "n_dl", m \ "dl_sum") match {
        case (org.json4s.JString(idc), org.json4s.JBool(clean),
            org.json4s.JInt(nd), org.json4s.JInt(ndl), org.json4s.JDouble(ds))
            if idc == idCol =>
          Some((clean, nd.toLong, ndl.toLong, ds))
        case _ => None
      }
    }
    if (merge.isEmpty) return buildAnalysis(spark, indexPath, idCol, textCol, fmt)
    val (oldClean, oldNDocs, oldNDl, oldDlSum) = merge.get

    val known = spark.read.parquet(s"$dir/doclen").select(col("id").as("__known_id"))
    val data = spark.read.format(fmt).load(indexPath)
    val fresh = data.join(known, col(idCol) === col("__known_id"), "left_anti")
    val toks = fresh.select(
      col(idCol).as("id"), Analyzer.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val audit = toks.agg(
        count(lit(1)).as("n"),
        count(col("id")).as("n_nonnull"),
        countDistinct(col("id")).as("n_distinct"),
        count(col("dl")).as("n_dl"),
        sum(col("dl")).as("dl_sum")).head()
      val nFresh = audit.getLong(0)
      // overlap check: every data row must be either known or fresh —
      // a shortfall means an appended id collides with a stored one,
      // and its row would be missing from the postings
      val overlap = data.count() != oldNDocs + nFresh
      if (overlap || nFresh != audit.getLong(1)) {
        toks.unpersist(false)
        return buildAnalysis(spark, indexPath, idCol, textCol, fmt)
      }
      if (nFresh > 0) {
        // checkpointed (rows, not lineage): the appends below write
        // into paths this lineage reads via the anti-join — the
        // minhash-refresh recache lesson
        val freshPost = toks
          .select(col("id"), col("dl"), explode(col("toks")).as("term"))
          .groupBy(col("term"), col("id"), col("dl"))
          .agg(count(lit(1)).cast("double").as("tf"))
          // term-sorted like the base build: appended segments keep
          // the row-group pruning property (term IN skips their row
          // groups too — the Lucene new-segment analogy)
          .repartitionByRange(col("term"))
          .sortWithinPartitions(col("term"))
          .localCheckpoint(true)
        val freshDl = toks.select(col("id"), col("dl")).localCheckpoint(true)
        freshPost.write.mode("append").parquet(s"$dir/postings")
        freshDl.write.mode("append").parquet(s"$dir/doclen")
        // vocabulary-sized df merge, checkpointed before overwriting
        // the table it reads
        val mergedDf = spark.read.parquet(s"$dir/df")
          .unionByName(freshPost.groupBy(col("term"))
            .agg(count(lit(1)).cast("double").as("df")))
          .groupBy(col("term")).agg(sum(col("df")).as("df"))
          .localCheckpoint(true)
        mergedDf.write.mode("overwrite").parquet(s"$dir/df")
        freshPost.unpersist(false); freshDl.unpersist(false); mergedDf.unpersist(false)
      }
      val nDocs = oldNDocs + nFresh
      val nDl = oldNDl + audit.getLong(3)
      val dlSum = oldDlSum + (if (audit.isNullAt(4)) 0.0 else audit.getDouble(4))
      import spark.implicits._
      Seq((nDocs.toDouble, if (nDl > 0) dlSum / nDl else Double.NaN))
        .toDF("n_docs", "avgdl")
        .select(col("n_docs"),
          when(isnan(col("avgdl")), lit(null).cast("double"))
            .otherwise(col("avgdl")).as("avgdl"))
        .write.mode("overwrite").parquet(s"$dir/stats")
      // merged cleanliness: no cross overlap (checked), fresh batch
      // internally distinct, old batch was clean
      val idsClean = oldClean && nFresh == audit.getLong(2)
      writeAnalysisMeta(spark, indexPath, dir, idCol, textCol, idsClean,
        nDocs, nDl, dlSum)
    } finally toks.unpersist(false)
  }

  // ---- persisted near-dup dedup artifact (MinHash/LSH) -------------

  val MinhashDirName = "_graft_minhash"

  def minhashDir(indexPath: String, textCol: String): String =
    s"$indexPath/$MinhashDirName/$textCol"

  /** Build the dedup-once artifact: per-doc shingle sets and LSH band
    * keys persisted beside the index, so deduping every future crawl
    * against this corpus never re-tokenizes or re-minhashes it
    * (Dedup.minhashLshCrossIndexed). The shingle table is the exact
    * verify's price — corpus-token-scale on disk, the same trade a
    * Lucene index makes storing positions; the band table is 8 short
    * strings per doc. Both land sorted for locality; the meta records
    * (numHashes, bands) because band keys from a DIFFERENT banding
    * would join garbage — loads param-check before trusting them. */
  def buildMinhash(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      fmt: String = "parquet"): Unit = {
    val dir = minhashDir(indexPath, textCol)
    val docs = spark.read.format(fmt).load(indexPath)
    val (sh, banded) =
      graft.dedup.Dedup.minhashArtifactFrames(docs, idCol, textCol, numHashes, bands)
    try {
      sh.write.mode("overwrite").parquet(s"$dir/shingles")
      banded.repartitionByRange(col("band")).sortWithinPartitions(col("band"))
        .write.mode("overwrite").parquet(s"$dir/bands")
    } finally sh.unpersist(false)
    writeMinhashMeta(spark, indexPath, idCol, textCol, numHashes, bands)
  }

  /** Incremental add (the daily-ingest shape): shingle+band ONLY the
    * docs absent from the stored artifact, append, re-stamp. Banding
    * params come from the stored meta — an append can't change them. */
  def refreshMinhash(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      textCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = minhashDir(indexPath, textCol)
    val (numHashes, bands) = readMinhashMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((_, idc, nh, nb)) =>
        require(idc == idCol,
          s"minhash artifact was built on id '$idc', refresh asked for '$idCol'")
        (nh, nb)
      case None => sys.error(s"refreshMinhash: no artifact meta under $dir")
    }
    val known = spark.read.parquet(s"$dir/shingles")
      .select(col("id").as("__known_id"))
    val data = spark.read.format(fmt).load(indexPath)
    val fresh = data.join(known, col(idCol) === col("__known_id"), "left_anti")
    // Append audit (mirrors refreshAnalysis — the r13 advice gap): the
    // anti-join SILENTLY drops an appended row whose id collides with
    // a stored one (absent from the artifact, meta stamped fresh) and
    // KEEPS null-id rows (null never equals, so they'd append as
    // id-null artifact rows); either breaks minhashLshCrossIndexed's
    // "answer-equal to the on-the-fly screen by construction"
    // contract. The fresh batch must be non-null, internally
    // distinct, and account for every non-stored data row — on any
    // mismatch fall back to a full rebuild. Old EMPTY-SHINGLE docs
    // are never stored (both build paths filter size(sh)>0), so they
    // legitimately reappear in `fresh` each refresh and are filtered
    // again — the coverage identity counts them on the fresh side,
    // consistently.
    val audit = fresh.agg(
      count(lit(1)).as("n"),
      count(col(idCol)).as("n_nonnull"),
      countDistinct(col(idCol)).as("n_distinct")).head()
    val nFresh = audit.getLong(0)
    if (nFresh != audit.getLong(1) || nFresh != audit.getLong(2) ||
        data.count() != known.count() + nFresh)
      return buildMinhash(spark, indexPath, idCol, textCol, numHashes, bands, fmt)
    if (nFresh > 0) {
      // the Cut variant checkpoints: this method writes into the very
      // path the anti-join reads, and a lineage-carrying frame would be
      // recomputed (empty) by recacheByPath after the first write
      val (sh, banded) =
        graft.dedup.Dedup.minhashArtifactFramesCut(fresh, idCol, textCol, numHashes, bands)
      try {
        sh.write.mode("append").parquet(s"$dir/shingles")
        banded.write.mode("append").parquet(s"$dir/bands")
      } finally sh.unpersist(false)
    }
    writeMinhashMeta(spark, indexPath, idCol, textCol, numHashes, bands)
  }

  private def writeMinhashMeta(
      spark: SparkSession, indexPath: String, idCol: String, textCol: String,
      numHashes: Int, bands: Int): Unit = {
    val fp = dataFingerprint(spark, indexPath)
    val metaPath = new Path(s"${minhashDir(indexPath, textCol)}/_graft_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      (s"""{"fingerprint":"$fp","id_col":"$idCol","text_col":"$textCol",""" +
        s""""num_hashes":$numHashes,"bands":$bands}""").getBytes("UTF-8"))
    out.close()
  }

  /** (fingerprint, id_col, num_hashes, bands) or None. */
  private def readMinhashMeta(
      spark: SparkSession, metaFile: String): Option[(String, String, Int, Int)] =
    readMetaJson(spark, metaFile).flatMap { meta =>
      (meta \ "fingerprint", meta \ "id_col", meta \ "num_hashes", meta \ "bands") match {
        case (org.json4s.JString(fp), org.json4s.JString(idc),
            org.json4s.JInt(nh), org.json4s.JInt(nb)) =>
          Some((fp, idc, nh.toInt, nb.toInt))
        case _ => None
      }
    }

  /** Fresh (shingles, bands) frames, or None when missing, stale, or
    * built under different (idCol, numHashes, bands). */
  def loadMinhash(
      spark: SparkSession,
      indexPath: String,
      textCol: String,
      expectIdCol: Option[String] = None,
      numHashes: Int = 32,
      bands: Int = 8): Option[(DataFrame, DataFrame)] = {
    val dir = minhashDir(indexPath, textCol)
    readMinhashMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((fp, idc, nh, nb))
          if fp == dataFingerprint(spark, indexPath)
            && expectIdCol.forall(_ == idc) && nh == numHashes && nb == bands =>
        Some((
          spark.read.parquet(s"$dir/shingles"),
          spark.read.parquet(s"$dir/bands")))
      case _ => None
    }
  }

  // ---- persisted vector index (IVF) --------------------------------

  val VectorsDirName = "_graft_vectors"

  def vectorsDir(indexPath: String, vecCol: String): String =
    s"$indexPath/$VectorsDirName/$vecCol"

  /** Build the IVF vector-index artifact: persist the coarse
    * quantizer's centroids and the per-doc inverted-list assignments.
    * `cents` is any (cent_id, cv) frame — Ann.seedCentroids for the
    * deterministic default, Ann.kmeansCentroids for the fitted
    * quantizer. The assignment pass (the corpus-sized cost) runs ONCE
    * here; queries pay only probe+rank (Ann.ivfTopKIndexed). */
  def buildIvf(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      cents: DataFrame,
      fmt: String = "parquet"): Unit = {
    val dir = vectorsDir(indexPath, vecCol)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    val stored = spark.read.parquet(s"$dir/centroids")
    val corpus = spark.read.format(fmt).load(indexPath)
    graft.sim.Ann.assignToCentroids(corpus, idCol, vecCol, stored)
      // cluster the lists on disk: a probe of one list reads
      // contiguous files instead of scattering over the corpus order
      .repartitionByRange(col("cent_id"))
      .sortWithinPartitions(col("cent_id"))
      .write.mode("overwrite").parquet(s"$dir/assignments")
    writeIvfMeta(spark, indexPath, idCol, vecCol)
  }

  /** IVF list-balance report over the persisted assignments: one row
    * per centroid list with its population, plus min/max/avg and the
    * imbalance factor (max/avg) in every row for one-glance reads.
    * The number that matters at scale: probe cost is proportional to
    * the PROBED lists' sizes, so a skewed quantizer (imbalance >> 1,
    * the seed-centroid trade-off kmeansCentroids exists to fix) makes
    * hot queries pay far over nprobe/nCentroids of the corpus.
    * Returns None when no fresh IVF artifact exists. */
  def ivfListStats(
      spark: SparkSession,
      indexPath: String,
      vecCol: String): Option[DataFrame] =
    loadIvf(spark, indexPath, vecCol).map { case (cents, assignments) =>
      val n = cents.count()
      val counts = assignments.groupBy(col("cent_id"))
        .agg(count(lit(1)).as("list_size"))
      // empty lists (a centroid no vector chose) must appear as 0
      val full = cents.select(col("cent_id"))
        .join(counts, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("list_size"), lit(0L)).as("list_size"))
      val agg = full.agg(
        min(col("list_size")).as("mn"), max(col("list_size")).as("mx"),
        avg(col("list_size")).as("av")).head()
      full.withColumn("n_lists", lit(n))
        .withColumn("min_size", lit(agg.getLong(0)))
        .withColumn("max_size", lit(agg.getLong(1)))
        .withColumn("imbalance",
          lit(graft.util.Num.roundDouble(
            if (agg.getDouble(2) == 0.0) 0.0 else agg.getLong(1) / agg.getDouble(2), 4)))
        .orderBy(col("cent_id"))
    }

  /** Incremental add — the daily-ingest shape: route ONLY documents
    * absent from the stored assignments to the EXISTING centroid
    * lists, append, and re-stamp the fingerprint. The quantizer never
    * refits, so ingest cost is proportional to the new documents, not
    * the corpus. */
  def refreshIvf(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = vectorsDir(indexPath, vecCol)
    val cents = spark.read.parquet(s"$dir/centroids")
    // rename before the join: a corpus whose own id column is named
    // "id" would otherwise make the condition ambiguous
    val known = spark.read.parquet(s"$dir/assignments")
      .select(col("id").as("__known_id"))
    val data = spark.read.format(fmt).load(indexPath)
    val fresh = data.join(known, col(idCol) === col("__known_id"), "left_anti")
    // same append audit as refreshMinhash/refreshAnalysis (the r13
    // advice class): an id colliding with a stored one silently
    // vanishes from the artifact behind a fresh meta stamp, and
    // null-id rows pass the anti-join; verify the fresh batch and the
    // coverage identity, rebuild on any mismatch
    val audit = fresh.agg(
      count(lit(1)).as("n"),
      count(col(idCol)).as("n_nonnull"),
      countDistinct(col(idCol)).as("n_distinct")).head()
    val nFresh = audit.getLong(0)
    if (nFresh != audit.getLong(1) || nFresh != audit.getLong(2) ||
        data.count() != known.count() + nFresh)
      // checkpoint the centroid frame first: buildIvf OVERWRITES the
      // very path this frame's lineage reads
      return buildIvf(spark, indexPath, idCol, vecCol,
        graft.util.Stages.truncate(cents), fmt)
    if (nFresh > 0)
      graft.sim.Ann.assignToCentroids(fresh, idCol, vecCol, cents)
        .write.mode("append").parquet(s"$dir/assignments")
    writeIvfMeta(spark, indexPath, idCol, vecCol)
  }

  private def writeIvfMeta(
      spark: SparkSession, indexPath: String, idCol: String, vecCol: String): Unit =
    writeVectorsMeta(spark, indexPath, vecCol, idCol)

  /** Stamp a vector-artifact dir (IVF lists, HNSW graphs) with the
    * live-data fingerprint — the artifact's commit point. */
  def writeVectorsMeta(
      spark: SparkSession, indexPath: String, vecKey: String, idCol: String): Unit = {
    val fp = dataFingerprint(spark, indexPath)
    val metaPath = new Path(s"${vectorsDir(indexPath, vecKey)}/_graft_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      s"""{"fingerprint":"$fp","id_col":"$idCol","vec_col":"$vecKey"}"""
        .getBytes("UTF-8"))
    out.close()
  }

  /** Freshness check alone (for artifacts whose payload loads inside
    * tasks rather than as frames, e.g. the HNSW graph table). */
  def vectorsMetaFresh(
      spark: SparkSession, indexPath: String, vecKey: String,
      expectIdCol: Option[String] = None): Boolean =
    readMeta(spark, s"${vectorsDir(indexPath, vecKey)}/_graft_meta.json")
      .exists { case (fp, idc, _) =>
        fp == dataFingerprint(spark, indexPath) && expectIdCol.forall(_ == idc)
      }

  /** Fresh (centroids, assignments) or None — same freshness contract
    * as loadAnalysis, including the id-column check. */
  def loadIvf(
      spark: SparkSession,
      indexPath: String,
      vecCol: String,
      expectIdCol: Option[String] = None): Option[(DataFrame, DataFrame)] = {
    val dir = vectorsDir(indexPath, vecCol)
    readMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((fp, idc, _)) if fp == dataFingerprint(spark, indexPath)
          && expectIdCol.forall(_ == idc) =>
        Some((
          spark.read.parquet(s"$dir/centroids"),
          spark.read.parquet(s"$dir/assignments")))
      case _ => None
    }
  }

  // ---- persisted int4 quantized vectors (`int4_hnsw` storage) -----

  val Int4DirName = "_graft_int4"

  def int4Dir(indexPath: String, vecCol: String): String =
    s"$indexPath/$Int4DirName/$vecCol"

  /** Pack-once artifact for the int4 quantized scan: one (id, packed
    * half-byte codes) table — 8 bytes of scale + dim/2 code bytes per
    * doc, ~8x smaller than the float column. Queries read ONLY this
    * table for the coarse pass (Ann.knnRescoreInt4Indexed); the
    * oversampled exact rescore touches the float vectors for
    * O(k·oversample) rows via a broadcast semi-join. The ES analog is
    * the `int4_hnsw` index built at segment-write time. */
  def buildInt4(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = int4Dir(indexPath, vecCol)
    val corpus = spark.read.format(fmt).load(indexPath)
    packInt4(corpus, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$dir/packed")
    writeInt4Meta(spark, indexPath, idCol, vecCol)
  }

  /** Incremental add with the same append audit as refreshMinhash /
    * refreshIvf: fresh batch non-null + internally distinct + the
    * coverage identity, any mismatch rebuilds. */
  def refreshInt4(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = int4Dir(indexPath, vecCol)
    val known = spark.read.parquet(s"$dir/packed")
      .select(col("id").as("__known_id"))
    // the packable subset only: packInt4 drops null-vector rows, so
    // counting them here would fail the coverage identity on every
    // legitimate append and silently degrade refresh to full rebuilds
    val data = spark.read.format(fmt).load(indexPath)
      .where(col(vecCol).isNotNull)
    val fresh = data.join(known, col(idCol) === col("__known_id"), "left_anti")
    val audit = fresh.agg(
      count(lit(1)).as("n"),
      count(col(idCol)).as("n_nonnull"),
      countDistinct(col(idCol)).as("n_distinct")).head()
    val nFresh = audit.getLong(0)
    if (nFresh != audit.getLong(1) || nFresh != audit.getLong(2) ||
        data.count() != known.count() + nFresh)
      return buildInt4(spark, indexPath, idCol, vecCol, fmt)
    if (nFresh > 0)
      packInt4(fresh, idCol, vecCol).write.mode("append").parquet(s"$dir/packed")
    writeInt4Meta(spark, indexPath, idCol, vecCol)
  }

  private def packInt4(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus
      .where(col(vecCol).isNotNull)
      .select(col(idCol).as("id"),
        org.apache.spark.sql.GraftBridge.column(graft.expr.Int4Pack(
          org.apache.spark.sql.GraftBridge.expression(
            col(vecCol).cast("array<double>")))).as("pk"))

  private def writeInt4Meta(
      spark: SparkSession, indexPath: String, idCol: String, vecCol: String): Unit = {
    val fp = dataFingerprint(spark, indexPath)
    val metaPath = new Path(s"${int4Dir(indexPath, vecCol)}/_graft_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      s"""{"fingerprint":"$fp","id_col":"$idCol","vec_col":"$vecCol"}"""
        .getBytes("UTF-8"))
    out.close()
  }

  /** Fresh (id, packed) frame or None — loadIvf's freshness contract. */
  def loadInt4(
      spark: SparkSession,
      indexPath: String,
      vecCol: String,
      expectIdCol: Option[String] = None): Option[DataFrame] = {
    val dir = int4Dir(indexPath, vecCol)
    readMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((fp, idc, _)) if fp == dataFingerprint(spark, indexPath)
          && expectIdCol.forall(_ == idc) =>
        Some(spark.read.parquet(s"$dir/packed"))
      case _ => None
    }
  }

  val Int8DirName = "_graft_int8"

  def int8Dir(indexPath: String, vecCol: String): String =
    s"$indexPath/$Int8DirName/$vecCol"

  /** Pack-once int8 artifact — the ES default (`int8_hnsw`) 4x
    * storage, same shape as the int4 family: 8-byte scale header +
    * one code byte per dim. */
  def buildInt8(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = int8Dir(indexPath, vecCol)
    val corpus = spark.read.format(fmt).load(indexPath)
    packInt8(corpus, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$dir/packed")
    writeInt8Meta(spark, indexPath, idCol, vecCol)
  }

  /** Incremental add with the standard packable-subset append audit. */
  def refreshInt8(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = int8Dir(indexPath, vecCol)
    val known = spark.read.parquet(s"$dir/packed")
      .select(col("id").as("__known_id"))
    val data = spark.read.format(fmt).load(indexPath)
      .where(col(vecCol).isNotNull)
    val fresh = data.join(known, col(idCol) === col("__known_id"), "left_anti")
    val audit = fresh.agg(
      count(lit(1)).as("n"),
      count(col(idCol)).as("n_nonnull"),
      countDistinct(col(idCol)).as("n_distinct")).head()
    val nFresh = audit.getLong(0)
    if (nFresh != audit.getLong(1) || nFresh != audit.getLong(2) ||
        data.count() != known.count() + nFresh)
      return buildInt8(spark, indexPath, idCol, vecCol, fmt)
    if (nFresh > 0)
      packInt8(fresh, idCol, vecCol).write.mode("append").parquet(s"$dir/packed")
    writeInt8Meta(spark, indexPath, idCol, vecCol)
  }

  private def packInt8(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus
      .where(col(vecCol).isNotNull)
      .select(col(idCol).as("id"),
        org.apache.spark.sql.GraftBridge.column(graft.expr.Int8Pack(
          org.apache.spark.sql.GraftBridge.expression(
            col(vecCol).cast("array<double>")))).as("pk"))

  private def writeInt8Meta(
      spark: SparkSession, indexPath: String, idCol: String, vecCol: String): Unit = {
    val fp = dataFingerprint(spark, indexPath)
    val metaPath = new Path(s"${int8Dir(indexPath, vecCol)}/_graft_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      s"""{"fingerprint":"$fp","id_col":"$idCol","vec_col":"$vecCol"}"""
        .getBytes("UTF-8"))
    out.close()
  }

  /** Fresh (id, packed) frame or None. */
  def loadInt8(
      spark: SparkSession,
      indexPath: String,
      vecCol: String,
      expectIdCol: Option[String] = None): Option[DataFrame] = {
    val dir = int8Dir(indexPath, vecCol)
    readMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((fp, idc, _)) if fp == dataFingerprint(spark, indexPath)
          && expectIdCol.forall(_ == idc) =>
        Some(spark.read.parquet(s"$dir/packed"))
      case _ => None
    }
  }

  val BbqDirName = "_graft_bbq"

  def bbqDir(indexPath: String, vecCol: String): String =
    s"$indexPath/$BbqDirName/$vecCol"

  /** Pack-once BBQ artifact: (id, b_lo, b_hi) sign bits — 16 bytes
    * per doc (32x vs float64), packed at write time. */
  def buildBbq(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = bbqDir(indexPath, vecCol)
    val corpus = spark.read.format(fmt).load(indexPath)
    val dim = corpus.select(size(col(vecCol)).as("d"))
      .where(col("d") > 0).limit(1).head().getInt(0)
    graft.sim.Ann.bbqPack(corpus, idCol, vecCol, dim)
      .write.mode("overwrite").parquet(s"$dir/packed")
    writeBbqMeta(spark, indexPath, idCol, vecCol)
  }

  /** Incremental add with the standard packable-subset append audit. */
  def refreshBbq(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = bbqDir(indexPath, vecCol)
    val known = spark.read.parquet(s"$dir/packed")
      .select(col("id").as("__known_id"))
    val data = spark.read.format(fmt).load(indexPath)
      .where(col(vecCol).isNotNull)
    val fresh = data.join(known, col(idCol) === col("__known_id"), "left_anti")
    val audit = fresh.agg(
      count(lit(1)).as("n"),
      count(col(idCol)).as("n_nonnull"),
      countDistinct(col(idCol)).as("n_distinct")).head()
    val nFresh = audit.getLong(0)
    if (nFresh != audit.getLong(1) || nFresh != audit.getLong(2) ||
        data.count() != known.count() + nFresh)
      return buildBbq(spark, indexPath, idCol, vecCol, fmt)
    if (nFresh > 0) {
      // probe dims like buildBbq does (d > 0 guard: an appended
      // empty-array vector must not define the dim), and compare the
      // appended dim to the dim the artifact was built with — a drift
      // would silently append bit layouts inconsistent with the
      // existing packed rows, so rebuild instead
      val builtDim = data.join(known, col(idCol) === col("__known_id"), "semi")
        .select(size(col(vecCol)).as("d")).where(col("d") > 0)
        .limit(1).collect().headOption.map(_.getInt(0))
      val freshDims = fresh.select(size(col(vecCol)).as("d"))
        .where(col("d") > 0).distinct().limit(2).collect().map(_.getInt(0))
      // no probe-able dim on either side, or a drift between them:
      // fall back to the full rebuild like every other inconsistency
      if (freshDims.length != 1 || !builtDim.contains(freshDims.head))
        return buildBbq(spark, indexPath, idCol, vecCol, fmt)
      graft.sim.Ann.bbqPack(fresh, idCol, vecCol, builtDim.get)
        .write.mode("append").parquet(s"$dir/packed")
    }
    writeBbqMeta(spark, indexPath, idCol, vecCol)
  }

  private def writeBbqMeta(
      spark: SparkSession, indexPath: String, idCol: String, vecCol: String): Unit = {
    val fp = dataFingerprint(spark, indexPath)
    val metaPath = new Path(s"${bbqDir(indexPath, vecCol)}/_graft_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      s"""{"fingerprint":"$fp","id_col":"$idCol","vec_col":"$vecCol"}"""
        .getBytes("UTF-8"))
    out.close()
  }

  /** Fresh (id, b_lo, b_hi) frame or None. */
  def loadBbq(
      spark: SparkSession,
      indexPath: String,
      vecCol: String,
      expectIdCol: Option[String] = None): Option[DataFrame] = {
    val dir = bbqDir(indexPath, vecCol)
    readMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((fp, idc, _)) if fp == dataFingerprint(spark, indexPath)
          && expectIdCol.forall(_ == idc) =>
        Some(spark.read.parquet(s"$dir/packed"))
      case _ => None
    }
  }

  val PqDirName = "_graft_pq"

  def pqDir(indexPath: String, vecCol: String): String =
    s"$indexPath/$PqDirName/$vecCol"

  /** Pack-once PQ artifact: m code bytes per doc (the 128x storage
    * point) plus the FROZEN codebook — exactly an ES segment's
    * quantizer: trained/sampled at write time, appended rows encode
    * under it unchanged. The coarse ADC pass reads only the codes
    * table; the per-query LUT derives from the stored codebook. */
  def buildPq(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      fmt: String = "parquet",
      fit: String = "sample",
      fitSampleN: Int = 65536,
      fitIters: Int = 5): Unit = {
    val dir = pqDir(indexPath, vecCol)
    val corpus = spark.read.format(fmt).load(indexPath)
    // `sample` = the deterministic first-k-by-id codebook — the same
    // rule the on-the-fly pqTopK uses, so artifact and per-query
    // paths are answer-equal while the first-k id set is unchanged
    // (and the DuckDB oracle can rebuild it). `lloyd` = k-means-
    // refined codebooks over the id-ordered sample (pqFitCodebooks) —
    // the production recall point; queries are unchanged (the LUT
    // derives from whatever codebook is STORED), only answer-equality
    // with the on-the-fly sample form is traded away.
    // `lloyd-dist` = the distributed unbiased fit (hash-ordered random
    // sample, one Spark job per iteration — pqFitCodebooksDist): the
    // production path at corpus scale, where the driver-side sample
    // both caps and biases the codebook.
    val cb = fit match {
      case "sample" => graft.sim.Ann.pqSampleCodebooks(corpus, idCol, vecCol, m, k)
      case "lloyd" => graft.sim.Ann.pqFitCodebooks(corpus, idCol, vecCol, m, k)
      case "lloyd-dist" => graft.sim.Ann.pqFitCodebooksDist(
        corpus, idCol, vecCol, m, k, iters = fitIters, sampleN = fitSampleN)
      case other => throw new IllegalArgumentException(
        s"unknown graft.index.pq.fit: $other (sample | lloyd | lloyd-dist)")
    }
    import spark.implicits._
    Seq(cb.toSeq).toDF("cb").write.mode("overwrite").parquet(s"$dir/codebook")
    graft.sim.Ann.pqEncodeFrame(corpus, idCol, vecCol, cb, m, k)
      .write.mode("overwrite").parquet(s"$dir/codes")
    writePqMeta(spark, indexPath, idCol, vecCol, m, k, fit, fitSampleN, fitIters)
  }

  /** Incremental add under the FROZEN codebook, with the standard
    * append audit on the packable (non-null-vector) subset. */
  def refreshPq(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      vecCol: String,
      fmt: String = "parquet"): Unit = {
    val dir = pqDir(indexPath, vecCol)
    val (mk, cb) = readPqCodebook(spark, dir).getOrElse(
      return sys.error(s"refreshPq without a built artifact at $dir"))
    val (m, k) = mk
    // the rebuild path must re-fit the SAME way the artifact was
    // built — a lloyd artifact silently rebuilt as sample would
    // degrade recall behind a fresh meta stamp
    val metaJson = readMetaJson(spark, s"$dir/_graft_meta.json")
    val fit = metaJson.map(meta => meta \ "fit" match {
        case org.json4s.JString(f) => f
        case _ => "sample"
      }).getOrElse("sample")
    // fit hyperparams recorded at build time ride every rebuild too
    def metaInt(field: String, dflt: Int): Int =
      metaJson.map(meta => meta \ field match {
        case org.json4s.JInt(v) => v.toInt
        case _ => dflt
      }).getOrElse(dflt)
    val fitSampleN = metaInt("fit_sample_n", 65536)
    val fitIters = metaInt("fit_iters", 5)
    val known = spark.read.parquet(s"$dir/codes")
      .select(col("id").as("__known_id"))
    val data = spark.read.format(fmt).load(indexPath)
      .where(col(vecCol).isNotNull)
    val fresh = data.join(known, col(idCol) === col("__known_id"), "left_anti")
    val audit = fresh.agg(
      count(lit(1)).as("n"),
      count(col(idCol)).as("n_nonnull"),
      countDistinct(col(idCol)).as("n_distinct")).head()
    val nFresh = audit.getLong(0)
    if (nFresh != audit.getLong(1) || nFresh != audit.getLong(2) ||
        data.count() != known.count() + nFresh)
      return buildPq(spark, indexPath, idCol, vecCol, m, k, fmt, fit, fitSampleN, fitIters)
    if (nFresh > 0)
      graft.sim.Ann.pqEncodeFrame(fresh, idCol, vecCol, cb, m, k)
        .write.mode("append").parquet(s"$dir/codes")
    writePqMeta(spark, indexPath, idCol, vecCol, m, k, fit, fitSampleN, fitIters)
  }

  private def writePqMeta(
      spark: SparkSession, indexPath: String, idCol: String, vecCol: String,
      m: Int, k: Int, fit: String,
      fitSampleN: Int = 65536, fitIters: Int = 5): Unit = {
    val fp = dataFingerprint(spark, indexPath)
    val metaPath = new Path(s"${pqDir(indexPath, vecCol)}/_graft_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      (s"""{"fingerprint":"$fp","id_col":"$idCol","vec_col":"$vecCol",""" +
        s""""m":$m,"k":$k,"fit":"$fit","fit_sample_n":$fitSampleN,""" +
        s""""fit_iters":$fitIters}""").getBytes("UTF-8"))
    out.close()
  }

  private def readPqCodebook(
      spark: SparkSession, dir: String): Option[((Int, Int), Array[Double])] =
    readMetaJson(spark, s"$dir/_graft_meta.json").flatMap { meta =>
      (meta \ "m", meta \ "k") match {
        case (org.json4s.JInt(m), org.json4s.JInt(k)) =>
          val cb = spark.read.parquet(s"$dir/codebook")
            .head().getSeq[Double](0).toArray
          Some(((m.toInt, k.toInt), cb))
        case _ => None
      }
    }

  /** Fresh ((m, k), codebook, codes frame) or None — the loadInt4
    * freshness contract. */
  def loadPq(
      spark: SparkSession,
      indexPath: String,
      vecCol: String,
      expectIdCol: Option[String] = None): Option[((Int, Int), Array[Double], DataFrame)] = {
    val dir = pqDir(indexPath, vecCol)
    readMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((fp, idc, _)) if fp == dataFingerprint(spark, indexPath)
          && expectIdCol.forall(_ == idc) =>
        readPqCodebook(spark, dir).map { case (mk, cb) =>
          (mk, cb, spark.read.parquet(s"$dir/codes"))
        }
      case _ => None
    }
  }

  /** (fingerprint, id_col, ids_clean) from an artifact meta file, or
    * None. ids_clean defaults false when absent (vector metas never
    * record it; only the analysis build audits ids). */
  private def readMeta(
      spark: SparkSession, metaFile: String): Option[(String, String, Boolean)] =
    readMetaJson(spark, metaFile).flatMap { meta =>
      (meta \ "fingerprint", meta \ "id_col") match {
        case (org.json4s.JString(fp), org.json4s.JString(idc)) =>
          val clean = meta \ "ids_clean" match {
            case org.json4s.JBool(b) => b
            case _ => false
          }
          Some((fp, idc, clean))
        case _ => None
      }
    }

  /** The parsed meta JSON of any artifact dir, or None when absent. */
  private def readMetaJson(
      spark: SparkSession, metaFile: String): Option[org.json4s.JValue] = {
    val metaPath = new Path(metaFile)
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) return None
    val in = fs.open(metaPath)
    try Some(org.json4s.jackson.JsonMethods.parse(
      scala.io.Source.fromInputStream(in, "UTF-8").mkString))
    finally in.close()
  }

  /** Load the artifacts if present AND fresh (meta fingerprint matches
    * the live data files); None means missing or stale — callers fall
    * back to on-the-fly analysis. Returns (postings, df, stats). */
  /** `expectIdCol`: the posting ids are the WRITER's graft.mapping.id
    * values — a reader joining them against a different id column
    * would get silently wrong rows, so a mismatch reads as
    * no-artifact and the caller's on-the-fly path (which scores by
    * the reader's own column) takes over. `knownFp`: callers that
    * consult several artifacts in one request pass the fingerprint
    * they already computed instead of re-walking the index dir per
    * lookup. */
  def loadAnalysis(
      spark: SparkSession,
      indexPath: String,
      textCol: String,
      expectIdCol: Option[String] = None,
      knownFp: => Option[String] = None,
      requireCleanIds: Boolean = false): Option[(DataFrame, DataFrame, DataFrame)] = {
    val dir = analysisDir(indexPath, textCol)
    readMeta(spark, s"$dir/_graft_meta.json") match {
      case Some((fp, idc, idsClean))
          if fp == knownFp.getOrElse(dataFingerprint(spark, indexPath))
            && expectIdCol.forall(_ == idc)
            && (!requireCleanIds || idsClean) =>
        Some((
          spark.read.parquet(s"$dir/postings"),
          spark.read.parquet(s"$dir/df"),
          spark.read.parquet(s"$dir/stats")))
      case _ => None
    }
  }
}
