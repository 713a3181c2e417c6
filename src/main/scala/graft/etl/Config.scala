package graft.etl

/** Config semantics of the reference's `AppConfig` (main.py:15-43),
  * re-expressed for a file-based source. Kept warts (SURVEY.md §2C):
  *   - `bacth_size` (sic, main.py:31) accepted as an alias of
  *     `batch_size` — the reference silently ignored the correctly
  *     spelled key; we accept both, correctly spelled wins;
  *   - include/exclude both set → error (main.py:35-36);
  *   - both date bounds inclusive (main.py:291,293).
  */
final case class ExportConfig(
    inputDir: String,
    outputDir: String,
    compression: String = "zstd",
    startDate: Option[String] = None,
    endDate: Option[String] = None,
    includeTables: Set[String] = Set.empty,
    excludeTables: Set[String] = Set.empty,
    batchSize: Int = 10000,
    rowGroupSize: Int = 400000,
    /** table name → optional date column (the reference's
      * `date_collections` work list, main.py:38). */
    dateColumns: Map[String, Option[String]] = Map.empty,
    /** Per-table date-range overrides — the generalization the
      * reference's config.json.example promises but its code never
      * implemented (SURVEY §1.4); falls back to the global range. */
    dateRanges: Map[String, (Option[String], Option[String])] = Map.empty) {

  def rangeFor(table: String): (Option[String], Option[String]) =
    dateRanges.getOrElse(table, (startDate, endDate))

  require(
    includeTables.isEmpty || excludeTables.isEmpty,
    "Cannot specify both include_tables and exclude_tables")
}

object ExportConfig {

  /** Build from a loosely-typed key/value map (as a parsed JSON object
    * would yield). Mirrors AppConfig's key set with the documented
    * renames (mongodb_host/port → input_dir; date_collections →
    * date_columns). */
  def fromMap(m: Map[String, Any]): ExportConfig = {
    def str(k: String, d: => String): String =
      m.get(k).map(_.toString).getOrElse(d)
    def optStr(k: String): Option[String] = m.get(k).map(_.toString)
    def int(k: String, d: Int): Int =
      m.get(k).map(_.toString.toDouble.toInt).getOrElse(d)
    def strSet(k: String): Set[String] = m.get(k) match {
      case Some(xs: Seq[_]) => xs.map(_.toString).toSet
      case _                => Set.empty
    }
    val dateCols: Map[String, Option[String]] = m.get("date_columns") match {
      case Some(mm: Map[_, _]) =>
        mm.map { case (k, v) => k.toString -> Option(v).map(_.toString).filter(_.nonEmpty) }
      case _ => Map.empty
    }
    val ranges: Map[String, (Option[String], Option[String])] = m.get("date_ranges") match {
      case Some(mm: Map[_, _]) =>
        mm.map { case (k, v) =>
          val bounds = v match {
            case xs: Seq[_] => xs.map(x => Option(x).map(_.toString).filter(_.nonEmpty))
            case _          => Seq.empty
          }
          k.toString -> (bounds.headOption.flatten, bounds.lift(1).flatten)
        }
      case _ => Map.empty
    }
    // The reference's config.json.example:4-16 promises a NESTED schema
    // (databases → collections → {date_field, start_date, end_date})
    // its code never reads (SURVEY §1.4 divergence). Accept it here so
    // the reference's own example file works as-is: every collection
    // key joins the include list, date_field feeds dateColumns (absent
    // → None, the no-filter work-list entry), and a per-collection
    // start/end pair lands in dateRanges. Flat keys win on conflict —
    // they are the semantics the reference actually implemented.
    // databases iterate in sorted key order: Scala Map order is an
    // implementation detail above 4 entries, and the winner for a
    // collection name declared under two databases must not be
    // load-order roulette — equal respecs are tolerated, conflicting
    // ones rejected below
    val nested: Seq[(String, Option[String], Option[(Option[String], Option[String])])] =
      m.get("databases") match {
        case Some(dbs: Map[_, _]) =>
          dbs.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).map(_._2).flatMap {
            case db: Map[_, _] =>
              db.asInstanceOf[Map[String, Any]].get("collections") match {
                case Some(cols: Map[_, _]) =>
                  cols.asInstanceOf[Map[String, Any]].toSeq.map {
                    case (name, spec: Map[_, _]) =>
                      val sm = spec.asInstanceOf[Map[String, Any]]
                      def f(k: String) = sm.get(k).map(_.toString).filter(_.nonEmpty)
                      val range = (f("start_date"), f("end_date"))
                      (name, f("date_field"),
                        if (range._1.isEmpty && range._2.isEmpty) None else Some(range))
                    case (name, _) => (name.toString, None, None)
                  }
                case _ => Nil
              }
            case _ => Nil
          }
        case _ => Nil
      }
    val dupes = nested.groupBy(_._1).filter(_._2.distinct.size > 1).keys
    require(dupes.isEmpty,
      s"collection(s) ${dupes.mkString(", ")} declared under multiple " +
        "databases with conflicting date_field/start_date/end_date — " +
        "make the specs identical or use flat keys")
    val nestedCols = nested.map { case (n, df, _) => n -> df }.toMap
    val nestedRanges = nested.collect { case (n, _, Some(r)) => n -> r }.toMap
    // Correctly spelled key wins; reference-compatible typo'd key accepted.
    val batch = m.get("batch_size").orElse(m.get("bacth_size"))
      .map(_.toString.toDouble.toInt).getOrElse(10000)
    val include = strSet("include_tables")
    ExportConfig(
      inputDir = str("input_dir", "."),
      outputDir = str("output_dir", "./output"),
      compression = str("compression", "zstd"),
      startDate = optStr("start_date"),
      endDate = optStr("end_date"),
      includeTables = if (include.nonEmpty) include else nested.map(_._1).toSet,
      excludeTables = strSet("exclude_tables"),
      batchSize = batch,
      rowGroupSize = int("row_group_size", 400000),
      dateColumns = nestedCols ++ dateCols,
      dateRanges = nestedRanges ++ ranges)
  }
}
