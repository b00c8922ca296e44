package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.types.DataType

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Central metadata registry: the rebuild of the reference's
  * `registry.db` blob (`CASE.MD:30,131-134`;
  * `station_reads_hourly_fs/feature_store.yaml:1-5`).
  *
  * `apply` is idempotent-upsert and stamps created/lastUpdated like the
  * reference (`CASE.MD:180-185,276-279`); `list*`/`get*` are the discovery
  * surface (`CASE.MD:234-240`).
  */
trait Registry {
  def applyEntity(e: Entity): Unit
  def applyFeatureView(fv: FeatureView): Unit
  def getEntity(name: String): Option[Entity]
  def getFeatureView(name: String): Option[FeatureView]
  def listEntities(): Seq[Entity]
  def listFeatureViews(): Seq[FeatureView]
  def listDataSources(): Seq[SparkSource] = listFeatureViews().map(_.source).distinct

  /** Resolve `"view:feature"` refs, grouped by view in first-seen order. */
  def resolve(refs: Seq[String]): Seq[(FeatureView, Seq[Feature])] = {
    val parsed = refs.map(FeatureRef.parse)
    parsed.map(_.view).distinct.map { viewName =>
      val fv = getFeatureView(viewName).getOrElse(
        throw new NoSuchElementException(s"feature view '$viewName' not registered"))
      // duplicate refs (easy when concatenating ref lists) would emit
      // duplicate identically-named output columns downstream —
      // AMBIGUOUS_REFERENCE far from the cause; first occurrence wins
      val wanted = parsed.filter(_.view == viewName).map(_.feature).distinct
      val feats = wanted.map { f =>
        fv.features.find(_.name == f).getOrElse(
          throw new NoSuchElementException(s"feature '$f' not in view '$viewName'"))
      }
      (fv, feats)
    }
  }
}

/** Volatile registry for tests and ephemeral sessions. */
final class InMemoryRegistry extends Registry {
  private val entities = TrieMap.empty[String, Entity]
  private val views = TrieMap.empty[String, FeatureView]
  override def applyEntity(e: Entity): Unit = entities.put(e.name, e)
  override def applyFeatureView(fv: FeatureView): Unit = views.put(fv.name, fv)
  override def getEntity(name: String): Option[Entity] = entities.get(name)
  override def getFeatureView(name: String): Option[FeatureView] = views.get(name)
  override def listEntities(): Seq[Entity] = entities.values.toSeq.sortBy(_.name)
  override def listFeatureViews(): Seq[FeatureView] = views.values.toSeq.sortBy(_.name)
}

/** File-backed JSON registry. The whole registry is one small metadata
  * document (like the reference's `registry.db` blob) — atomic
  * write-via-rename, reread on each access so concurrent sessions observe
  * upserts.
  */
final class FileRegistry(val path: Path) extends Registry {
  import FileRegistry._

  def this(path: String) = this(Paths.get(path))

  private def load(): State =
    if (Files.exists(path)) fromJson(new String(Files.readAllBytes(path), "UTF-8"))
    else State(Map.empty, Map.empty, Map.empty)

  private def save(s: State): Unit = {
    // WRITER-UNIQUE tmp: a fixed shared tmp lets two concurrent writers
    // in different JVMs (synchronized covers one JVM only; the class
    // contract is last-writer-wins across sessions) publish a torn
    // document — A renames B's half-written tmp into the final path
    val tmp = path.resolveSibling(
      path.getFileName.toString + ".tmp-" + java.util.UUID.randomUUID)
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.write(tmp, toJson(s).getBytes("UTF-8"))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    // best-effort sweep of STALE tmps (crashed writers), mirroring
    // HadoopRegistry.save: unique-named orphans would otherwise
    // accumulate next to the registry forever. Age-filtered so a live
    // concurrent writer's in-flight tmp survives — the horizon is
    // MINUTES, not seconds: deleting a slow live writer's tmp
    // mid-Files.write (slow NFS, large registry) would fail its
    // ATOMIC_MOVE with NoSuchFileException, and orphan accumulation is
    // not latency-sensitive (ADVICE r19).
    try {
      val dir = Option(path.getParent).getOrElse(Paths.get("."))
      val prefix = path.getFileName.toString + ".tmp-"
      val horizonMs = FileRegistry.sweepHorizonMs
      val now = System.currentTimeMillis()
      val st = Files.list(dir)
      try st.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix))
        .filter(p => now - Files.getLastModifiedTime(p).toMillis > horizonMs)
        .foreach(p => Files.deleteIfExists(p))
      finally st.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  override def applyEntity(e: Entity): Unit = synchronized {
    val s = load()
    val now = Instant.now.toString
    val meta = s.meta.getOrElse("entity/" + e.name, Meta(now, now)).copy(lastUpdated = now)
    save(s.copy(entities = s.entities + (e.name -> e),
      meta = s.meta + (("entity/" + e.name) -> meta)))
  }

  override def applyFeatureView(fv: FeatureView): Unit = synchronized {
    val s = load()
    val now = Instant.now.toString
    val meta = s.meta.getOrElse("fv/" + fv.name, Meta(now, now)).copy(lastUpdated = now)
    save(s.copy(views = s.views + (fv.name -> fv),
      meta = s.meta + (("fv/" + fv.name) -> meta)))
  }

  override def getEntity(name: String): Option[Entity] = load().entities.get(name)
  override def getFeatureView(name: String): Option[FeatureView] = load().views.get(name)
  override def listEntities(): Seq[Entity] = load().entities.values.toSeq.sortBy(_.name)
  override def listFeatureViews(): Seq[FeatureView] = load().views.values.toSeq.sortBy(_.name)

  def meta(kind: String, name: String): Option[Meta] = load().meta.get(s"$kind/$name")
}

/** Registry on any Hadoop filesystem (hdfs://, abfss://, s3a://, …) —
  * the cluster-ready analogue of the reference's `registry.db` blob on
  * ADLS (`station_reads_hourly_fs/feature_store.yaml:1-5`). Same JSON
  * document format as [[FileRegistry]]; writes go to a temp path then
  * rename (atomic on HDFS/ABFS directories-as-objects semantics
  * permitting; last-writer-wins like the reference).
  */
final class HadoopRegistry(
    pathStr: String,
    hadoopConf: org.apache.hadoop.conf.Configuration) extends Registry {
  import FileRegistry._
  import org.apache.hadoop.fs.{FileSystem, Path}

  def this(spark: org.apache.spark.sql.SparkSession, path: String) =
    this(path, spark.sparkContext.hadoopConfiguration)

  private val path = new Path(pathStr)

  /** All in-flight or crashed writer tmps next to the registry —
    * writer-unique `.tmp-<uuid>` names (a FIXED shared tmp let two
    * concurrent writers in different JVMs publish a torn document: A's
    * rename could move B's half-written bytes into the final path);
    * the legacy fixed `.tmp` still matches the glob.
    */
  private def tmpStatuses(f: FileSystem): Seq[org.apache.hadoop.fs.FileStatus] =
    (try Option(f.globStatus(new Path(pathStr + ".tmp*")))
    catch { case scala.util.control.NonFatal(_) => None })
      .map(_.toSeq).getOrElse(Seq.empty)
  private def fs: FileSystem = path.getFileSystem(hadoopConf)

  /** Read the registry document. A concurrent [[save]] may transiently
    * leave the final path missing (FileContext rename-OVERWRITE is
    * atomic on HDFS but delete+rename on some FSes, e.g. local) — in
    * that window the `.tmp` file exists, so "final missing but tmp
    * present" means write-in-progress: retry rather than silently
    * returning an empty registry (which would let the next apply rewrite
    * the registry from empty and drop every definition).
    */
  private def load(): State = loadInternal()._1

  /** Stale-tmp horizon: a live swap completes in milliseconds, so a
    * tmp this much older than the FS clock with no final file is a
    * crashed writer (the [[ArtifactStore.orphanTmpHorizonMs]] posture;
    * shorter here because the registry write is one small JSON file,
    * not a parquet artifact).
    */
  private val staleTmpHorizonMs = 10000L

  /** FS-clock "now": the modification time of a freshly written probe
    * file next to the registry. Staleness must be judged on the
    * filesystem's clock — local `System.currentTimeMillis` vs a remote
    * FS's modtime can skew by more than the whole staleness threshold.
    * Only called on the rare final-missing-but-tmp-present branch.
    * Falls back to the client clock when the probe can't be written
    * (read-only mount — a crashed writer can't have left a tmp on a
    * mount nobody can write to), and a failed probe DELETE never masks
    * the computed time.
    */
  private def fsNow(f: FileSystem): Long = {
    val probe = new Path(pathStr + ".probe-" + java.util.UUID.randomUUID)
    try {
      val out = f.create(probe, true)
      try out.write('p') finally out.close()
      val t = f.getFileStatus(probe).getModificationTime
      try f.delete(probe, false)
      catch { case scala.util.control.NonFatal(_) => () }
      t
    } catch {
      case scala.util.control.NonFatal(_) => System.currentTimeMillis
    }
  }

  /** @return (state, resolvedViaStaleTmp). The second component is true
    * only when the state is empty *because* a stale `.tmp` from a
    * crashed writer was found — readers may proceed, but the
    * read-modify-write apply path must refuse to save over it (the
    * crashed writer's registry content is unknown; rewriting from empty
    * would silently drop every definition).
    */
  private def loadInternal(): (State, Boolean) = {
    val f = fs
    val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
    var sleepMs = 1L
    var attempts = 0
    // fsNow is a probe WRITE — sample it at most once per load and age
    // it with the local monotonic-ish clock, instead of one probe
    // create/stat/delete round trip per retry pass against an FS that
    // is busy with the very swap being waited out
    var fsNowBase = -1L
    var fsNowAtMs = 0L
    def fsAgeOf(mtime: Long): Long = {
      if (fsNowBase < 0) { fsNowBase = fsNow(f); fsNowAtMs = System.currentTimeMillis }
      fsNowBase + (System.currentTimeMillis - fsNowAtMs) - mtime
    }
    while (System.nanoTime < deadline) {
      if (f.exists(path)) {
        try {
          val in = f.open(path)
          try {
            val bytes = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
            return (fromJson(new String(bytes.toByteArray, "UTF-8")), false)
          } finally in.close()
        } catch {
          case _: java.io.FileNotFoundException => () // vanished mid-swap; retry
        }
      } else {
        // glob the tmps FIRST: the common missing-registry read (fresh
        // repo, pre-first-apply) must not pay — or crash on — a probe
        // write just to compute an age nothing needs
        val tmps = tmpStatuses(f)
        if (tmps.isEmpty) {
          // neither final nor in-progress temp: genuinely empty (the
          // re-check of the final path closes the tmp→final rename race)
          if (!f.exists(path)) return (State(Map.empty, Map.empty, Map.empty), false)
        } else if (fsAgeOf(tmps.map(_.getModificationTime).max) > staleTmpHorizonMs) {
          // stale tmp(s) from a crashed writer, not an in-flight swap.
          // If a tmp holds a COMPLETE non-empty document, the crash was
          // mid-swap of REAL content (delete+rename FS: final deleted,
          // rename never ran) — reading "empty" here would let every
          // pipeline silently no-op with green status. Fail loudly with
          // the recovery path instead.
          val recoverable = tmps.filter { st =>
            try {
              val in = f.open(st.getPath)
              try {
                val bytes = new java.io.ByteArrayOutputStream()
                org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
                val s = fromJson(new String(bytes.toByteArray, "UTF-8"))
                s.entities.nonEmpty || s.views.nonEmpty
              } finally in.close()
            } catch { case scala.util.control.NonFatal(_) => false }
          }
          if (recoverable.nonEmpty) throw new IllegalStateException(
            s"registry at $path is missing but a crashed writer left a " +
              s"COMPLETE document at ${recoverable.map(_.getPath).mkString(", ")} " +
              "— the registry was being replaced when the writer died. " +
              "Rename the newest tmp into place to recover it, or delete " +
              "the tmp(s) to accept an empty registry")
          // torn/empty tmp: the registry was never (re)written with
          // content — readable as empty, but flagged so apply() won't
          // rewrite the registry from the empty fallback
          return (State(Map.empty, Map.empty, Map.empty), true)
        }
        // fresh tmp: a swap is in flight, retry with backoff
      }
      attempts += 1
      Thread.sleep(sleepMs)
      sleepMs = math.min(sleepMs * 2, 200L)
    }
    throw new java.io.IOException(
      s"registry at $path unreadable after $attempts attempts over 15s (writer stuck mid-swap?)")
  }

  private def loadForUpdate(): State = {
    val (s, staleTmp) = loadInternal()
    if (staleTmp) throw new IllegalStateException(
      s"registry at $path has a stale in-progress write ($pathStr.tmp*); " +
        "refusing a read-modify-write from the empty fallback state (it " +
        "would drop the crashed writer's registry) — inspect/remove the " +
        "tmp file(s) first")
    s
  }

  private def save(s: State): Unit = {
    val f = fs
    // writer-unique tmp — see [[tmpStatuses]] for why a fixed name is a
    // torn-document hazard under concurrent cross-JVM writers
    val tmp = new Path(pathStr + ".tmp-" + java.util.UUID.randomUUID)
    val out = f.create(tmp, true)
    try out.write(toJson(s).getBytes("UTF-8")) finally out.close()
    // Replace via FileContext rename-OVERWRITE (atomic on HDFS; on FSes
    // where it degrades to delete+rename, load()'s tmp-aware retry keeps
    // readers from ever observing an empty registry).
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.makeQualified(path).toUri, hadoopConf)
    fc.rename(f.makeQualified(tmp), f.makeQualified(path),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // best-effort sweep of STALE tmps (crashed writers): live concurrent
    // writers' tmps are younger than the horizon and survive. Without
    // this, unique-named orphans would accumulate next to the registry.
    // Deliberately a LONGER horizon than [[staleTmpHorizonMs]]: the
    // load-side horizon only classifies (throw/flag, never deletes),
    // while deleting a slow live writer's in-flight tmp here would fail
    // its rename — minutes-scale is safe because orphan accumulation is
    // not latency-sensitive (ADVICE r19).
    try {
      val leftovers = tmpStatuses(f)
      if (leftovers.nonEmpty) {
        val now = fsNow(f)
        leftovers
          .filter(st => now - st.getModificationTime > FileRegistry.sweepHorizonMs)
          .foreach(st => f.delete(st.getPath, false))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  override def applyEntity(e: Entity): Unit = synchronized {
    val s = loadForUpdate()
    val now = java.time.Instant.now.toString
    val meta = s.meta.getOrElse("entity/" + e.name, Meta(now, now)).copy(lastUpdated = now)
    save(s.copy(entities = s.entities + (e.name -> e),
      meta = s.meta + (("entity/" + e.name) -> meta)))
  }

  override def applyFeatureView(fv: FeatureView): Unit = synchronized {
    val s = loadForUpdate()
    val now = java.time.Instant.now.toString
    val meta = s.meta.getOrElse("fv/" + fv.name, Meta(now, now)).copy(lastUpdated = now)
    save(s.copy(views = s.views + (fv.name -> fv),
      meta = s.meta + (("fv/" + fv.name) -> meta)))
  }

  override def getEntity(name: String): Option[Entity] = load().entities.get(name)
  override def getFeatureView(name: String): Option[FeatureView] = load().views.get(name)
  override def listEntities(): Seq[Entity] = load().entities.values.toSeq.sortBy(_.name)
  override def listFeatureViews(): Seq[FeatureView] = load().views.values.toSeq.sortBy(_.name)
}

object FileRegistry {
  /** Age beyond which an orphan writer tmp is deleted by the save-time
    * sweep. Minutes, not seconds: a live concurrent writer's in-flight
    * tmp must survive even a pathologically slow write (slow NFS, very
    * large registry) — deleting it would fail that writer's atomic
    * rename. Distinct from the read-side staleness horizon, which only
    * classifies and never deletes.
    */
  val sweepHorizonMs: Long = 10L * 60 * 1000

  final case class Meta(created: String, lastUpdated: String)
  final case class State(
      entities: Map[String, Entity],
      views: Map[String, FeatureView],
      meta: Map[String, Meta])

  // json4s serialization with DataType <-> DDL-string mapping.
  private object DataTypeSerializer extends CustomSerializer[DataType](_ => (
    { case JString(s) => DataType.fromDDL(s) },
    { case dt: DataType => JString(dt.catalogString) }
  ))
  private object ValueTypeSerializer extends CustomSerializer[ValueType.Value](_ => (
    { case JString(s) => ValueType.withName(s) },
    { case v: ValueType.Value => JString(v.toString) }
  ))
  private object DurationSerializer extends CustomSerializer[java.time.Duration](_ => (
    { case JString(s) => java.time.Duration.parse(s) },
    { case d: java.time.Duration => JString(d.toString) }
  ))
  private implicit val formats: Formats =
    DefaultFormats + DataTypeSerializer + ValueTypeSerializer + DurationSerializer

  def toJson(s: State): String =
    JsonMethods.pretty(Extraction.decompose(s))
  def fromJson(json: String): State =
    JsonMethods.parse(json).extract[State]
}
