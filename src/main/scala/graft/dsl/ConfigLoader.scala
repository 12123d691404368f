package graft.dsl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Aggregation spec: optional row filters, group-by keys and a list of
  * aggregate columns — the runtime-config shape of the reference's
  * aggregation DSL (reference/terraform/modules/glue/variables.tf:352-429).
  */
final case class AggSpec(name: String, groupBy: Seq[String],
    aggregates: Seq[AggRule], filters: Seq[String] = Seq.empty) {
  def run(df: DataFrame): DataFrame = {
    val filtered = filters.foldLeft(df)((d, f) => d.filter(expr(f)))
    AggRule(filtered, groupBy, aggregates)
  }
}

/** JSON config loading for the rule / aggregation / feature DSL — the
  * reference's primary extension point: a runtime JSON document deep-merged
  * over shipped defaults (reference/lambda/utils/config_loader.py:153-203),
  * with the document shapes of terraform/modules/glue/variables.tf:262-511:
  *
  * {{{
  * { "data_quality_rules":        { "<dataset>": [ {name, expression, threshold?} ] },
  *   "aggregation_rules":         { "<dataset>": [ {name, group_by_columns, aggregate_columns:
  *                                                  [{column, function, alias}], filters} ] },
  *   "feature_engineering_config": { "<dataset>": [ {feature_name, calculation} ] } }
  * }}}
  *
  * Parsing uses Jackson (already on Spark's classpath); the compiled rules
  * run through the same single-pass [[RuleEngine]] / [[AggRule]] /
  * [[FeatureDef]] machinery as Scala-defined ones.
  */
object ConfigLoader {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Deep merge with `overrides` winning: nested objects merge recursively,
    * arrays and scalars replace (config_loader.py:184-203 semantics).
    */
  def deepMerge(defaults: JsonNode, overrides: JsonNode): JsonNode =
    if (defaults.isObject && overrides.isObject) {
      val out = defaults.deepCopy[ObjectNode]()
      overrides.properties().asScala.foreach { e =>
        val merged =
          if (out.has(e.getKey)) deepMerge(out.get(e.getKey), e.getValue)
          else e.getValue
        out.set[ObjectNode](e.getKey, merged)
      }
      out
    } else overrides

  /** Parse an override document and merge it over a defaults document. */
  def loadWithDefaults(defaultsJson: String, overridesJson: String): JsonNode =
    deepMerge(parse(defaultsJson), parse(overridesJson))

  private def section(doc: JsonNode, name: String, dataset: String): Seq[JsonNode] = {
    val node = doc.path(name).path(dataset)
    if (node.isArray) node.asScala.toSeq else Seq.empty
  }

  private def str(n: JsonNode, field: String): String = {
    val v = n.path(field)
    require(v.isTextual, s"missing or non-string field '$field' in rule config")
    v.asText
  }

  /** Required array field: absent or non-array fails fast (a typo'd
    * `group_by_columns` would otherwise silently turn a grouped aggregation
    * into a single global aggregate), mirroring [[str]]'s strictness.
    */
  private def strings(n: JsonNode, field: String): Seq[String] = {
    val v = n.path(field)
    require(v.isArray, s"missing or non-array field '$field' in rule config")
    v.asScala.map(_.asText).toSeq
  }

  /** Optional array field: absent → empty; present but non-array fails. */
  private def stringsOpt(n: JsonNode, field: String): Seq[String] =
    if (!n.has(field)) Seq.empty else strings(n, field)

  /** `data_quality_rules.<dataset>` → [[QualityRule]]s (threshold optional,
    * defaulting to 1.0 like the DSL).
    */
  def qualityRules(doc: JsonNode, dataset: String): Seq[QualityRule] =
    section(doc, "data_quality_rules", dataset).map { n =>
      QualityRule(str(n, "name"), str(n, "expression"),
        if (n.has("threshold")) n.get("threshold").asDouble else 1.0)
    }

  /** `aggregation_rules.<dataset>` → [[AggSpec]]s. */
  def aggSpecs(doc: JsonNode, dataset: String): Seq[AggSpec] =
    section(doc, "aggregation_rules", dataset).map { n =>
      AggSpec(
        str(n, "name"),
        strings(n, "group_by_columns"),
        {
          val cols = n.path("aggregate_columns")
          require(cols.isArray,
            "missing or non-array field 'aggregate_columns' in rule config")
          cols.asScala.map { c =>
            AggRule(str(c, "column"), str(c, "function"), str(c, "alias"))
          }.toSeq
        },
        stringsOpt(n, "filters"))
    }

  /** `feature_engineering_config.<dataset>` → [[FeatureDef]]s. */
  def features(doc: JsonNode, dataset: String): Seq[FeatureDef] =
    section(doc, "feature_engineering_config", dataset).map { n =>
      FeatureDef(str(n, "feature_name"), str(n, "calculation"))
    }
}
