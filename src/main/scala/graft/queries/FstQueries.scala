package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.SyntheticCatalog
import graft.ops.{Decode, IpColumns, Select, Stats}
import graft.meta.Lookups

/** FST-domain operator queries over the deterministic synthetic record
  * catalog (SyntheticCatalog derives it from the driver's orders
  * parquet; the oracle rebuilds the identical catalog in DuckDB via
  * [[SyntheticCatalog.sqlCte]]). Each entry exercises one operator of
  * SURVEY.md §2 and is hash-compared by the driver.
  */
object FstQueries {
  type Q = (SparkSession, String) => DataFrame

  private def cat(s: SparkSession, dir: String): DataFrame =
    SyntheticCatalog.catalog(s, dir)

  private def W(sel: String) = s"WITH ${SyntheticCatalog.sqlCte}\n$sel"

  // SQL twins of the decode_ip123 kind/value overrides
  private val RawSql = "nomvar IN ('>>', '^^', '^>', '!!')"
  private def k1Sql =
    s"(CASE WHEN $RawSql THEN 100 ELSE ${IpColumns.decodeKindSql("ip1")} END)"
  private def v1Sql =
    s"(CASE WHEN $RawSql THEN CAST(ip1 AS FLOAT) ELSE ${IpColumns.decodeValueSql("ip1")} END)"
  private def k2Sql =
    s"(CASE WHEN $RawSql THEN 100 WHEN ip2 >= 32768 THEN ${IpColumns.decodeKindSql("ip2")} ELSE 10 END)"
  private def v2Sql =
    s"(CASE WHEN $RawSql THEN CAST(ip2 AS FLOAT) ELSE ${IpColumns.decodeValueSql("ip2")} END)"
  private def k3Sql =
    s"(CASE WHEN $RawSql THEN 100 WHEN ip3 >= 32768 THEN ${IpColumns.decodeKindSql("ip3")} ELSE 100 END)"
  private def v3Sql =
    s"(CASE WHEN $RawSql THEN CAST(ip3 AS FLOAT) ELSE ${IpColumns.decodeValueSql("ip3")} END)"

  private def stdvarValuesSql: String = Lookups.StdVar.map {
    case (n, u, d) => s"('$n', '$u', '${d.replace("'", "''")}')"
  }.mkString(", ")

  val queries: Map[String, Q] = Map(
    // P1 grid identity (coord records via ip1/ip2, HY -> 'None')
    "f01_grid_column" -> ((s, dir) =>
      Decode.addGrid(cat(s, dir)).select("rid", "nomvar", "grid")),

    // P3 typvar modifier flags
    "f02_typvar_flags" -> ((s, dir) =>
      Decode.addFlags(cat(s, dir)).select(
        col("rid"), col("typvar"), col("multiple_modifications"),
        col("zapped"), col("filtered"), col("interpolated"),
        col("unit_converted"), col("bounded"), col("missing_data"),
        col("ensemble_extra_info"))),

    // P4 etiket parse
    "f03_etiket_parse" -> ((s, dir) =>
      Decode.addParsedEtiket(cat(s, dir)).select(
        "rid", "etiket", "label", "run", "implementation",
        "ensemble_member")),

    // P5 unit/description broadcast lookup
    "f04_unit_desc" -> ((s, dir) =>
      Decode.addUnitAndDescription(cat(s, dir)).select(
        "rid", "nomvar", "unit", "description")),

    // P6 RMN date decode
    "f05_date_decode" -> ((s, dir) =>
      Decode.addDecodedDates(cat(s, dir)).select(
        "rid", "dateo", "datev", "date_of_observation",
        "date_of_validity")),

    // P7 forecast hour
    "f06_forecast_hour" -> ((s, dir) =>
      Decode.addForecastHour(cat(s, dir)).select(
        "rid", "deet", "npas", "forecast_hour")),

    // P8 datyp -> letter
    "f07_datyp_str" -> ((s, dir) =>
      Decode.addDataTypeStr(cat(s, dir)).select(
        "rid", "datyp", "data_type_str")),

    // P9 ip1/ip2/ip3 decode (level, kinds, printable kinds, rules)
    "f08_ip_decode" -> ((s, dir) =>
      Decode.addIpInfo(cat(s, dir)).select(
        col("rid"), col("ip1"), col("level"), col("ip1_kind"),
        col("ip1_pkind"), col("ip2_dec"), col("ip2_kind"),
        col("ip2_pkind"), col("ip3_dec"), col("ip3_kind"),
        col("ip3_pkind"), col("surface"), col("follow_topography"),
        col("ascending"))),

    // P12 full decodeMetadata orchestrator (composition proof)
    "f09_decoded_meta" -> ((s, dir) =>
      Decode.decodeMetadata(cat(s, dir)).select(
        col("rid"), col("nomvar"), col("grid"), col("label"),
        col("unit"), col("date_of_validity"), col("forecast_hour"),
        col("data_type_str"), col("level"), col("ip1_pkind"),
        col("surface"))),

    // F7/A7 per-grid meta-record existence flags
    "f10_meta_exists" -> ((s, dir) => {
      val g = Decode.addGrid(cat(s, dir))
      g.groupBy("grid").agg(
        max(col("nomvar") === "!!").as("toctoc"),
        max(col("nomvar") === "P0").as("p0"),
        max(col("nomvar") === "E1").as("e1"),
        max(col("nomvar") === "PT").as("pt"),
        max(col("nomvar") === "!!SF").as("sf"),
        max(col("nomvar") === "HY").as("hy"))
    }),

    // F3/F4 + M18: select nomvars with accompanying meta, cleaned
    "f11_select_with_meta" -> ((s, dir) =>
      Select.selectWithMeta(Decode.addGrid(cat(s, dir)), Seq("TT", "UU"))
        .select("rid", "nomvar", "grid")),

    // M18 metadata_cleanup over the full catalog
    "f12_metadata_cleanup" -> ((s, dir) =>
      Select.metadataCleanup(Decode.addGrid(cat(s, dir)))
        .select("rid", "nomvar", "grid")),

    // A1/M17 fststat per-record payload statistics
    "f13_fststat" -> ((s, dir) =>
      Stats.fststat(cat(s, dir)).select(
        "rid", "nomvar", "min", "max", "mean", "std",
        "min_pos_i", "min_pos_j", "max_pos_i", "max_pos_j")),

    // M19 voir listing (decoded projection, sorted)
    "f14_voir" -> ((s, dir) => Stats.voir(cat(s, dir))),

    // A2 drop_duplicates on the 19-col identity (input doubled to
    // prove the dedup actually collapses)
    "f15_dedup_identity" -> ((s, dir) => {
      val c = cat(s, dir)
      c.unionByName(c)
        .dropDuplicates(graft.core.Constants.DedupColumns)
        .select(graft.core.Constants.DedupColumns.map(col): _*)
    }),

    // A5 distinct-ip1 bucketing by decoded kind
    "f16_ip_buckets" -> ((s, dir) =>
      cat(s, dir).select("ip1").distinct()
        .withColumn("kind", IpColumns.decodeKind(col("ip1")))
        .filter(col("kind").isin(1, 2, 5))))

  val oracles: Map[String, String] = Map(
    "f01_grid_column" -> W(
      s"SELECT rid, nomvar, ${Decode.gridSql} AS grid FROM cat"),

    "f02_typvar_flags" -> W(
      "SELECT rid, typvar, " +
        Decode.FlagChars.map { case (n, _) =>
          s"${Decode.flagSql(n)} AS $n"
        }.mkString(", ") + " FROM cat"),

    "f03_etiket_parse" -> W(
      "SELECT rid, etiket, " +
        Decode.etiketSql.map { case (e, a) => s"$e AS $a" }.mkString(", ") +
        " FROM cat"),

    "f04_unit_desc" -> W(
      s"""SELECT rid, cat.nomvar AS nomvar,
        coalesce(sv.unit, 'scalar') AS unit,
        coalesce(sv.description, '') AS description
      FROM cat LEFT JOIN (VALUES $stdvarValuesSql)
        AS sv(nomvar, unit, description) ON cat.nomvar = sv.nomvar"""),

    "f05_date_decode" -> W(
      s"""SELECT rid, dateo, datev,
        ${IpColumns.stampToTimestampSql("dateo")} AS date_of_observation,
        ${IpColumns.stampToTimestampSql("datev")} AS date_of_validity
      FROM cat"""),

    "f06_forecast_hour" -> W(
      "SELECT rid, deet, npas, " +
        "CAST(deet AS BIGINT) * CAST(npas AS BIGINT) AS forecast_hour " +
        "FROM cat"),

    "f07_datyp_str" -> W(
      s"SELECT rid, datyp, ${Decode.datypStrSql} AS data_type_str FROM cat"),

    "f08_ip_decode" -> W(
      s"""SELECT rid, ip1,
        $v1Sql AS level,
        $k1Sql AS ip1_kind,
        ${IpColumns.kindToStringSql(k1Sql)} AS ip1_pkind,
        $v2Sql AS ip2_dec,
        $k2Sql AS ip2_kind,
        ${IpColumns.kindToStringSql(k2Sql)} AS ip2_pkind,
        $v3Sql AS ip3_dec,
        $k3Sql AS ip3_kind,
        ${IpColumns.kindToStringSql(k3Sql)} AS ip3_pkind,
        ${IpColumns.isSurfaceSql(k1Sql, v1Sql)} AS surface,
        ${IpColumns.followsTopographySql(k1Sql)} AS follow_topography,
        ${IpColumns.ascendingSql(k1Sql)} AS ascending
      FROM cat"""),

    "f09_decoded_meta" -> W(
      s""", base AS (SELECT rid, nomvar,
        ${Decode.gridSql} AS grid,
        ${Decode.etiketSql.head._1} AS label,
        ${IpColumns.stampToTimestampSql("datev")} AS date_of_validity,
        CAST(deet AS BIGINT) * CAST(npas AS BIGINT) AS forecast_hour,
        ${Decode.datypStrSql} AS data_type_str,
        $v1Sql AS level,
        ${IpColumns.kindToStringSql(k1Sql)} AS ip1_pkind,
        ${IpColumns.isSurfaceSql(k1Sql, v1Sql)} AS surface
      FROM cat)
      SELECT base.rid, base.nomvar, base.grid, base.label,
        coalesce(sv.unit, 'scalar') AS unit,
        base.date_of_validity, base.forecast_hour, base.data_type_str,
        base.level, base.ip1_pkind, base.surface
      FROM base LEFT JOIN (VALUES $stdvarValuesSql)
        AS sv(nomvar, unit, description) ON base.nomvar = sv.nomvar"""),

    "f10_meta_exists" -> W(
      s"""SELECT ${Decode.gridSql} AS grid,
        bool_or(nomvar = '!!') AS toctoc,
        bool_or(nomvar = 'P0') AS p0,
        bool_or(nomvar = 'E1') AS e1,
        bool_or(nomvar = 'PT') AS pt,
        bool_or(nomvar = '!!SF') AS sf,
        bool_or(nomvar = 'HY') AS hy
      FROM cat GROUP BY 1"""),

    "f11_select_with_meta" -> W(
      Select.cleanupSql("nomvar IN ('TT', 'UU')")),

    "f12_metadata_cleanup" -> W(Select.cleanupSql("TRUE")),

    "f13_fststat" -> W(
      "SELECT rid, nomvar, " +
        Stats.fststatSql.map { case (e, a) => s"$e AS $a" }.mkString(", ") +
        " FROM cat"),

    "f14_voir" -> W(
      s"""SELECT nomvar, typvar, etiket, ni, nj, nk,
        ${IpColumns.stampToTimestampSql("dateo")} AS dateo,
        ip1, $v1Sql AS level, ip2, ip3, deet, npas,
        ${Decode.datypStrSql} AS datyp, nbits, grtyp, ig1, ig2, ig3, ig4
      FROM cat"""),

    "f15_dedup_identity" -> W(
      s"""SELECT DISTINCT ${graft.core.Constants.DedupColumns.mkString(", ")}
      FROM (SELECT * FROM cat UNION ALL SELECT * FROM cat)"""),

    "f16_ip_buckets" -> W(
      s"""SELECT ip1, kind FROM (
        SELECT DISTINCT ip1, ${IpColumns.decodeKindSql("ip1")} AS kind
        FROM cat) WHERE kind IN (1, 2, 5)"""))
}
