package graft

import graft.sources.DocStore
import org.apache.spark.sql.functions._

/** DROP/RENAME COLUMN via stable column IDs: the schema marker binds
  * every name EVER used to a column id (`nameMap`), renames re-bind
  * the CURRENT name while the old binding keeps resolving pre-rename
  * files, drops retire the id, and name REUSE is refused with the
  * files that still carry the old column — the one ambiguity
  * name-mapping over id-less parquet cannot survive. */
class ColumnIdSpec extends SparkSpec {

  private def ensureCat(name: String, root: String): Unit = {
    if (spark.conf.getOption(s"spark.sql.catalog.$name").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.DocStoreCatalog")
      spark.conf.set(s"spark.sql.catalog.$name.root", root)
    }
  }

  test("RENAME: old and new files read under the new name; filters and row-level ops resolve") {
    val root = tmpDir("colid_root")
    ensureCat("colid", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS colid.db")
    spark.sql("""CREATE TABLE colid.db.t (k BIGINT, price DOUBLE, flag INT)
      USING docstore TBLPROPERTIES ('rowlevel'='mor')""")
    spark.sql("""INSERT INTO colid.db.t SELECT /*+ COALESCE(1) */ * FROM VALUES
      (1L, 10.0, 1), (2L, 20.0, 1) AS v(k, price, flag)""")
    spark.sql("ALTER TABLE colid.db.t RENAME COLUMN price TO amount")
    // post-rename schema speaks the new name; inserts write it
    assert(spark.table("colid.db.t").schema.fieldNames.toSeq ==
      Seq("k", "amount", "flag"))
    spark.sql("""INSERT INTO colid.db.t SELECT /*+ COALESCE(1) */ * FROM VALUES
      (3L, 30.0, 2) AS v(k, amount, flag)""")
    // BOTH generations read under the new name
    val rows = spark.table("colid.db.t").orderBy("k")
      .select("k", "amount").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // a filter on the renamed column applies EXACTLY across both
    // physical spellings (old files evaluate row-side)
    import spark.implicits._
    assert(spark.table("colid.db.t").filter(col("amount") > 15.0)
      .select("k").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // row-level ops address the current name and hit pre-rename rows
    spark.sql("UPDATE colid.db.t SET amount = 11.0 WHERE k = 1")
    assert(spark.table("colid.db.t").filter(col("k") === 1)
      .head.getDouble(1) == 11.0)
    // SQL face: SELECT by old name fails (it's gone from the schema)
    val eOld = intercept[Exception](
      spark.sql("SELECT price FROM colid.db.t").collect())
    assert(eOld.getMessage.contains("price"), eOld.getMessage)
  }

  test("DROP: the column vanishes from old and new files; reuse of any historical name is refused with file names") {
    val root = tmpDir("colid2_root")
    ensureCat("colid2", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS colid2.db")
    spark.sql("""CREATE TABLE colid2.db.t (k BIGINT, v STRING, junk INT)
      USING docstore TBLPROPERTIES ('rowlevel'='mor')""")
    spark.sql("""INSERT INTO colid2.db.t SELECT /*+ COALESCE(1) */ * FROM VALUES
      (1L, 'a', 7), (2L, 'b', 8) AS v(k, v, junk)""")
    spark.sql("ALTER TABLE colid2.db.t DROP COLUMN junk")
    assert(spark.table("colid2.db.t").schema.fieldNames.toSeq == Seq("k", "v"))
    spark.sql("""INSERT INTO colid2.db.t SELECT /*+ COALESCE(1) */ * FROM VALUES
      (3L, 'c') AS v(k, v)""")
    val rows = spark.table("colid2.db.t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // old files still physically CARRY junk — re-adding the name would
    // make their columns ambiguous; the refusal names such files
    val eReuse = intercept[Exception](
      spark.sql("ALTER TABLE colid2.db.t ADD COLUMNS (junk STRING)"))
    assert(eReuse.getMessage.contains("junk") &&
      eReuse.getMessage.contains(".parquet"), eReuse.getMessage)
    // renaming onto a historical name is refused the same way
    val eRename = intercept[Exception](
      spark.sql("ALTER TABLE colid2.db.t RENAME COLUMN v TO junk"))
    assert(eRename.getMessage.contains("junk"), eRename.getMessage)
    // partition columns refuse rename and drop outright
    spark.sql("""CREATE TABLE colid2.db.p (k BIGINT, y INT)
      USING docstore PARTITIONED BY (y) TBLPROPERTIES ('rowlevel'='mor')""")
    spark.sql("INSERT INTO colid2.db.p VALUES (1L, 2020)")
    val ep = intercept[Exception](
      spark.sql("ALTER TABLE colid2.db.p RENAME COLUMN y TO yr"))
    assert(ep.getMessage.contains("partition"), ep.getMessage)
    val ep2 = intercept[Exception](
      spark.sql("ALTER TABLE colid2.db.p DROP COLUMN y"))
    assert(ep2.getMessage.contains("partition"), ep2.getMessage)
  }

  test("rename chains survive further evolution: rename → widen → rename, ids stable") {
    val root = tmpDir("colid3_root")
    ensureCat("colid3", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS colid3.db")
    spark.sql("""CREATE TABLE colid3.db.t (k INT, v STRING)
      USING docstore TBLPROPERTIES ('rowlevel'='mor')""")
    spark.sql("""INSERT INTO colid3.db.t SELECT /*+ COALESCE(1) */ * FROM VALUES
      (1, 'a') AS v(k, v)""")
    spark.sql("ALTER TABLE colid3.db.t RENAME COLUMN k TO key0")
    spark.sql("ALTER TABLE colid3.db.t ALTER COLUMN key0 TYPE BIGINT")
    spark.sql("ALTER TABLE colid3.db.t RENAME COLUMN key0 TO key1")
    spark.sql("""INSERT INTO colid3.db.t SELECT /*+ COALESCE(1) */ * FROM VALUES
      (CAST(2 AS BIGINT), 'b') AS v(key1, v)""")
    val df = spark.table("colid3.db.t")
    assert(df.schema("key1").dataType == org.apache.spark.sql.types.LongType)
    // gen-1 file: INT32 pages under the ORIGINAL name, read as bigint
    // under the twice-renamed current name
    import spark.implicits._
    assert(df.select("key1").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
