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
}
