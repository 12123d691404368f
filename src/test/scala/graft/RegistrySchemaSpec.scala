package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-comparability guard over the WHOLE query registry.
  *
  * The driver's oracle comparator (pandas sort_values over every output
  * column) cannot sort list/struct/map-typed cells — round-8's q_invidx
  * erred with `TypeError: unhashable type: 'numpy.ndarray'` even though
  * the engine output was correct. Registered queries must therefore emit
  * only scalar columns; list-valued library APIs (e.g.
  * [[graft.text.TextAnalysis.invertedIndex]]'s postings) get projected
  * through an md5 digest at the registration site.
  *
  * Schema derivation is analysis-only (no job runs), so this sweeps all
  * registered queries cheaply.
  */
class RegistrySchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("every registered query output is scalar-only (driver-sortable)") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      fn(spark, dir).schema.fields.toSeq.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"list/struct/map-typed output columns break the driver comparator: ${offenders.mkString(", ")}")
  }

  test("every registered query with an oracle has matching column names is checked by driver; digest columns end in _md5 or are scalar") {
    // Sanity companion: the q_invidx digest projection kept token/df and
    // replaced postings with postings_md5 — assert that shape here so a
    // refactor can't silently re-expose the list column.
    val inv = SparkEntry.queries("q_invidx")(spark, dir)
    assert(inv.schema.fieldNames.toSeq == Seq("token", "df", "postings_md5"))
  }

  test("registry names are unique (a duplicate would silently drop a " +
      "query at toMap) and every query carries an oracle") {
    assert(SparkEntry.registrySize === SparkEntry.queries.size,
      "duplicate query name in the registry Seq")
    // the driver records a weaker rows-only check for oracle-less
    // queries; this engine's contract is an oracle for EVERY query
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }
}
