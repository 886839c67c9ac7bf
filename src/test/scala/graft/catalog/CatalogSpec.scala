package graft.catalog

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  test("parquet catalog discovers all fixture tables") {
    val c = new ParquetCatalog(sf0001)
    assert(c.listTables() == graft.Tables.all.sorted)
  }

  test("exclusion is case-insensitive (reference lowercases everything)") {
    val c = new ParquetCatalog(sf0001)
    assert(!c.listTables(Seq("LINEITEM")).contains("lineitem"))
  }

  test("composite and single PKs resolve; unknown table has none") {
    val c = new ParquetCatalog(sf0001)
    assert(c.primaryKey("lineitem") == Seq("l_orderkey", "l_linenumber"))
    assert(c.primaryKey("region") == Seq("r_regionkey"))
    assert(c.primaryKey("mystery") == Seq.empty)
  }

  test("reads return the fixture schema") {
    val c = new ParquetCatalog(sf0001)
    assert(c.read(spark, "nation").columns.toSeq ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("csv and json catalogs round-trip a synced table") {
    import org.apache.spark.sql.functions.col
    val src = new ParquetCatalog(sf0001).read(spark, "nation")
    val dir = java.nio.file.Files.createTempDirectory("graft_filecat").toString
    src.write.option("header", "true").csv(s"$dir/nation.csv")
    src.write.json(s"$dir/nation.json")
    val csvCat = new FileCatalog(dir, "csv")
    val jsonCat = new FileCatalog(dir, "json")
    assert(csvCat.listTables() == Seq("nation"))
    assert(jsonCat.listTables() == Seq("nation"))
    assert(csvCat.read(spark, "nation").count() == 25)
    // json loses column ORDER (object keys) but not content
    val j = jsonCat.read(spark, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(graft.sync.Compare.contentEqual(src, j))
    // csv re-infers types; keys and names survive exactly
    val c = csvCat.read(spark, "nation").select(col("n_nationkey").cast("long"),
      col("n_name"), col("n_regionkey").cast("long"))
    assert(graft.sync.Compare.contentEqual(src, c))
  }
}
