package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver corpus (TESTDATA.md) and for
  * reference-schema analog inputs.
  *
  * Mirrors the reference's lazy parquet scans (S1/S2 in SURVEY.md §2.1;
  * reference `eda_workspace/public_eda_pipeline.py:29-30,64-66`): reads stay
  * lazy until an action, and schema-only access touches only footers.
  */
object Tables {

  /** Lazy scan of one corpus table: `dir/name.parquet`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Footer-only schema read (reference `public_eda_pipeline.py:64-66`
    * `collect_schema().names()`). */
  def columnNames(spark: SparkSession, dir: String, name: String): Seq[String] =
    load(spark, dir, name).schema.fieldNames.toSeq
}

/** Column-role discovery by name prefix, the reference's schema system
  * (`eda_workspace/public_eda_pipeline.py:52-55,68-71`): `num_feature_*`,
  * `cat_feature_*`, `target_*`, id `customer_id`.
  */
final case class FeatureCatalog(
    idCol: String,
    numFeatures: Seq[String],
    catFeatures: Seq[String],
    targets: Seq[String]) {
  def allFeatures: Seq[String] = numFeatures ++ catFeatures
}

object FeatureCatalog {
  val DefaultId = "customer_id"

  def fromSchema(fieldNames: Seq[String], idCol: String = DefaultId): FeatureCatalog =
    FeatureCatalog(
      idCol = idCol,
      numFeatures = fieldNames.filter(_.startsWith("num_feature_")),
      catFeatures = fieldNames.filter(_.startsWith("cat_feature_")),
      targets = fieldNames.filter(_.startsWith("target_")))

  /** Target family = middle token of `target_<family>_<idx>`; names with
    * fewer than 3 tokens have no family token and map to "unknown"
    * (reference `public_eda_pipeline.py:52-55` requires `len(parts) >= 3`). */
  def targetFamily(target: String): String = {
    val parts = target.split("_")
    if (parts.length >= 3) parts(1) else "unknown"
  }
}
