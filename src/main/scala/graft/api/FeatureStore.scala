package graft.api

import graft.core._
import graft.offline.PointInTimeJoin
import graft.online.{Materializer, OnlineStore, InMemoryOnlineStore}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.Timestamp

/** Store-level configuration — the rebuild of `feature_store.yaml`
  * (reference M1, `infra/on-prem/workspace-dev/feature_repo/
  * feature_store.yaml:1-18`, `CASE.MD:129-141`). `offline_store: type:
  * spark` in the reference means "use the active SparkSession"
  * (`CASE.MD:140`) — here that is explicit: the session is a constructor
  * argument.
  */
final case class RepoConfig(
    project: String,
    registryPath: Option[String] = None,
    entityTimestampColumn: String = "event_timestamp")

/** Lazy historical-retrieval handle (reference M4's `RetrievalJob` with
  * `.to_spark_df()` / `.query`): nothing executes until an action runs on
  * [[toDf]].
  */
final class RetrievalJob(df: => DataFrame, cleanup: () => Unit = () => ()) {
  lazy val toDf: DataFrame = df
  /** Physical-plan dump, the moral equivalent of the reference's
    * `hist.query` SQL text (`Untitled.ipynb:868`). */
  def explainString(mode: String = "formatted"): String =
    toDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))
  /** Release resources held for this retrieval (the cached entity
    * DataFrame) — call after the terminal action on [[toDf]]. Without it
    * a long session doing many retrievals accumulates cached blocks.
    * Idempotent; the plan stays runnable afterwards (recomputed, not
    * cached).
    */
  def release(): Unit = cleanup()
}

/** The user-facing facade wiring registry + offline PIT retrieval +
  * materialization + online serving (reference M1-M7, SURVEY §2.8).
  */
final class FeatureStore(
    val spark: SparkSession,
    val config: RepoConfig,
    val registry: Registry,
    val onlineStore: OnlineStore = new InMemoryOnlineStore) {

  /** M2: idempotent upsert of definitions. */
  def applyObjects(objects: Seq[Any]): Unit = objects.foreach {
    case e: Entity      => registry.applyEntity(e)
    case fv: FeatureView => registry.applyFeatureView(fv)
    case other => throw new IllegalArgumentException(
      s"cannot apply ${other.getClass.getSimpleName}")
  }

  /** M3: discovery. */
  def listFeatureViews(): Seq[FeatureView] = registry.listFeatureViews()
  def listEntities(): Seq[Entity] = registry.listEntities()
  def listDataSources(): Seq[SparkSource] = registry.listDataSources()
  def getFeatureView(name: String): FeatureView =
    registry.getFeatureView(name).getOrElse(
      throw new NoSuchElementException(s"feature view '$name' not registered"))

  private def resolveJoinKeys(fv: FeatureView): Seq[String] =
    fv.entities.flatMap { e =>
      registry.getEntity(e)
        .map(_.resolvedJoinKeys)
        .getOrElse(Seq(e)) // entity name doubles as join key if unregistered
    }.distinct

  /** M4: point-in-time-correct enrichment of `entityDf` with
    * `"view:feature"` refs. Column names in the result are
    * `view__feature` when `fullFeatureNames` (Feast's
    * full_feature_names=True), else bare feature names.
    */
  def getHistoricalFeatures(
      entityDf: DataFrame,
      features: Seq[String],
      fullFeatureNames: Boolean = true,
      cacheEntity: Boolean = true): RetrievalJob = {
    val resolved = registry.resolve(features)
    val requests = resolved.map { case (fv, feats) =>
      PointInTimeJoin.ViewRequest(fv, feats, resolveJoinKeys(fv))
    }
    // The facade owns the entity cache so RetrievalJob.release() can
    // unpersist it — PointInTimeJoin itself never persists (its
    // cacheEntity stays false), avoiding blocks that outlive the
    // retrieval.
    val persisted =
      if (cacheEntity)
        Some(entityDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else None
    new RetrievalJob(
      PointInTimeJoin.retrieve(
        spark, persisted.getOrElse(entityDf), requests,
        entityTsCol = config.entityTimestampColumn,
        fullFeatureNames = fullFeatureNames,
        cacheEntity = false),
      () => persisted.foreach(_.unpersist(false)))
  }

  /** M5: latest-per-key within [start, end] → online store. */
  def materialize(start: Timestamp, end: Timestamp, views: Seq[String]): Unit =
    views.foreach { name =>
      val fv = getFeatureView(name)
      Materializer.materialize(spark, onlineStore, fv, resolveJoinKeys(fv), start, end)
    }

  /** M6: online lookup. Declared-FLOAT features narrow to float32 like
    * the reference's Redis round-trip (`explore_features.ipynb` cell 9:
    * `10.039999961853027`), surfaced as the float32-precision double.
    */
  def getOnlineFeatures(
      entityRows: Seq[Map[String, Any]],
      features: Seq[String]): Seq[Map[String, Any]] = {
    val resolved = registry.resolve(features)
    entityRows.map { row =>
      resolved.flatMap { case (fv, feats) =>
        val keys = resolveJoinKeys(fv)
        val keyValues = keys.map(k => row.getOrElse(k,
          throw new IllegalArgumentException(s"entity row lacks join key '$k'")))
        val vector = onlineStore.get(fv.name, keyValues)
        feats.map { f =>
          val raw = vector.flatMap(_.get(f.name)).orNull
          // Narrow ONLY declared-FLOAT features: a DoubleType feature
          // must serve at full precision (anything else is silent
          // online/offline skew).
          val v = raw match {
            case d: java.lang.Double
                if f.dtype == org.apache.spark.sql.types.FloatType =>
              java.lang.Double.valueOf(d.floatValue.toDouble)
            case other => other
          }
          s"${fv.name}__${f.name}" -> v
        }
      }.toMap ++ row
    }
  }
}
