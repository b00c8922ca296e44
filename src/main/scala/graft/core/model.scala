package graft.core

import org.apache.spark.sql.types._

import java.time.Duration

/** Core feature-store data model.
  *
  * Mirrors the abstractions of the reference feature store (see
  * SURVEY.md §1.1; reference `CASE.MD:155-185`,
  * `infra/on-prem/workspace-dev/fs-hadoop/Untitled.ipynb:235-260`):
  * Entity / Feature / FeatureView / SparkSource / FeatureRef, re-expressed
  * as plain Scala case classes with Spark `DataType`s instead of the
  * registry-level `ValueType` enum.
  */

/** Registry-level value types actually used by the reference
  * (`CASE.MD:168-170,213-218`: STRING, FLOAT, INT32, INT64).
  */
object ValueType extends Enumeration {
  val STRING, FLOAT, DOUBLE, INT32, INT64, BOOL, BYTES, UNIX_TIMESTAMP = Value

  /** Spark physical type for a registry value type. The reference pairs a
    * declared FLOAT with physical Spark `double` columns (SURVEY §1.2);
    * we preserve that: FLOAT still *declares* float but accepts double.
    */
  def toDataType(v: Value): DataType = v match {
    case STRING         => StringType
    case FLOAT          => FloatType
    case DOUBLE         => DoubleType
    case INT32          => IntegerType
    case INT64          => LongType
    case BOOL           => BooleanType
    case BYTES          => BinaryType
    case UNIX_TIMESTAMP => TimestampType
  }

  def fromDataType(dt: DataType): Value = dt match {
    case StringType    => STRING
    case FloatType     => FLOAT
    case DoubleType    => DOUBLE
    case IntegerType   => INT32
    case LongType      => INT64
    case BooleanType   => BOOL
    case BinaryType    => BYTES
    case TimestampType => UNIX_TIMESTAMP
    case other => throw new IllegalArgumentException(s"unsupported value type: $other")
  }
}

/** A named primary key with a value type; `joinKeys` defaults to the
  * entity name when not given (reference `Entity(name="driver",
  * join_keys=["taxi_id"], ...)`, `Untitled.ipynb:260`).
  */
final case class Entity(
    name: String,
    joinKeys: Seq[String],
    valueType: ValueType.Value,
    description: String = "") {
  require(name.nonEmpty, "entity name must be non-empty")
  def resolvedJoinKeys: Seq[String] = if (joinKeys.nonEmpty) joinKeys else Seq(name)
}

object Entity {
  def apply(name: String, valueType: ValueType.Value): Entity =
    Entity(name, Seq(name), valueType)
}

/** A named, typed column of a feature view (reference `CASE.MD:168-170`). */
final case class Feature(name: String, dtype: DataType)

/** Batch source description: format + path + the two time columns that make
  * every feature table a time series (reference `CASE.MD:155-161`:
  * `file_format`, `path`, `timestamp_field`, `created_timestamp_column`).
  */
final case class SparkSource(
    name: String,
    path: String,
    fileFormat: String = "parquet",
    timestampField: String = "event_timestamp",
    createdTimestampColumn: Option[String] = None,
    options: Map[String, String] = Map.empty)

/** Named grouping of features over one batch source, keyed by entities,
  * with optional TTL (reference `CASE.MD:164-173`; `ttl=timedelta(days=2)`
  * → `"ttl": "172800s"` in `trip_stats_fv.ipynb:466`).
  *
  * `entities` are entity *names* resolved against the registry at query
  * time; an empty list is legal and mirrors the reference's entity-less
  * weather view (`chicago_weather_hourly_fs.py:89,103`).
  */
final case class FeatureView(
    name: String,
    entities: Seq[String],
    features: Seq[Feature],
    source: SparkSource,
    ttl: Option[Duration] = None) {
  require(name.nonEmpty, "feature view name must be non-empty")
  def featureNames: Seq[String] = features.map(_.name)
}

/** Parsed `"view:feature"` reference (reference `explore_features.ipynb:428-433`). */
final case class FeatureRef(view: String, feature: String) {
  override def toString: String = s"$view:$feature"
}

object FeatureRef {
  def parse(s: String): FeatureRef = s.split(":", 2) match {
    case Array(v, f) if v.nonEmpty && f.nonEmpty => FeatureRef(v, f)
    case _ => throw new IllegalArgumentException(
      s"feature reference must look like 'view:feature', got '$s'")
  }
}
