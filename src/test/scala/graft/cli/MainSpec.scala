package graft.cli

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end CLI flows: parquet -> parquet sync + compare, and
  * parquet -> embedded Derby JDBC sync + compare (the reference's
  * actual database-to-database shape). */
class MainSpec extends SparkSpec {

  private def writeCfg(body: String): String = {
    val f = Files.createTempFile("graft_cli", ".yml")
    Files.writeString(f, body)
    f.toString
  }

  test("sync + compare parquet->parquet via CLI") {
    val out = Files.createTempDirectory("graft_cli_out").toString
    val cfg = writeCfg(
      s"""src:
         |  url: parquet:$sf0001
         |dest:
         |  url: parquet:$out
         |maxParallel: 4
         |exclude: lineitem orders events documents embeddings part
         |""".stripMargin)
    // O4: each run arms the shutdown-cancel hook for its duration and
    // disarms on exit — no hook thread accumulates across invocations
    val armedBefore = graft.sync.Jobs.armTotal
    assert(Main.run(Array("sync", "--config", cfg), spark) == 0)
    assert(Main.run(Array("compare", "--config", cfg), spark) == 0)
    assert(graft.sync.Jobs.armTotal == armedBefore + 2,
      "CLI run did not arm the shutdown hook")
    assert(graft.sync.Jobs.armedCount == 0,
      "CLI run leaked an armed shutdown hook")
    assert(new java.io.File(s"$out/nation.parquet").exists())
  }

  test("sync + compare parquet->Derby JDBC via CLI") {
    val url = "jdbc:derby:memory:clidb;create=true"
    val cfg = writeCfg(
      s"""src:
         |  url: parquet:$sf0001
         |dest:
         |  url: $url
         |maxParallel: 2
         |batchRowSize: 500
         |exclude: lineitem orders events documents embeddings part customer supplier
         |""".stripMargin)
    assert(Main.run(Array("sync", "--config", cfg), spark) == 0)
    assert(Main.run(Array("compare", "--config", cfg), spark) == 0)
  }

  test("compare flags missing destination tables") {
    val out = Files.createTempDirectory("graft_cli_out2").toString
    val cfg = writeCfg(
      s"""src:
         |  url: parquet:$sf0001
         |dest:
         |  url: parquet:$out
         |exclude: lineitem orders events documents embeddings part customer supplier
         |""".stripMargin)
    // nothing synced yet -> every table missing -> nonzero failure count
    assert(Main.run(Array("compare", "--config", cfg), spark) > 0)
  }

  test("compare --content catches a same-count content mutation") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_cli_out3").toString
    val cfg = writeCfg(
      s"""src:
         |  url: parquet:$sf0001
         |dest:
         |  url: parquet:$out
         |exclude: lineitem orders events documents embeddings part customer supplier nation
         |""".stripMargin)
    assert(Main.run(Array("sync", "--config", cfg), spark) == 0)
    assert(Main.run(Array("compare", "--config", cfg, "--content"), spark) == 0)
    // mutate one region row, keep the row count — the count compare
    // stays green, the content compare must go red
    val mutated = spark.read.parquet(s"$out/region.parquet")
      .withColumn("r_name",
        when(col("r_regionkey") === 0, lit("MUTATED")).otherwise(col("r_name")))
    val tmp = Files.createTempDirectory("graft_cli_mut").toString
    mutated.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$out/region.parquet")
    assert(Main.run(Array("compare", "--config", cfg), spark) == 0,
      "count compare cannot see the mutation")
    assert(Main.run(Array("compare", "--config", cfg, "--content"), spark) > 0,
      "content compare must see the mutation")
  }

  test("sync --delta repairs a mutated destination and is idempotent") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_cli_delta").toString
    val cfg = writeCfg(
      s"""src:
         |  url: parquet:$sf0001
         |dest:
         |  url: parquet:$out
         |exclude: lineitem orders events documents embeddings part region nation supplier
         |""".stripMargin)
    // first delta run on a missing target = full load
    assert(Main.run(Array("sync", "--delta", "--config", cfg), spark) == 0)
    assert(Main.run(Array("compare", "--config", cfg, "--content"), spark) == 0)
    // corrupt one customer row in place (same count)
    val mutated = spark.read.parquet(s"$out/customer.parquet")
      .withColumn("c_name",
        when(col("c_custkey") === 7, lit("CORRUPT")).otherwise(col("c_name")))
    val tmp = Files.createTempDirectory("graft_cli_delta_mut").toString
    mutated.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$out/customer.parquet")
    assert(Main.run(Array("compare", "--config", cfg, "--content"), spark) > 0)
    // delta sync heals it; content compare goes green again
    assert(Main.run(Array("sync", "--delta", "--config", cfg), spark) == 0)
    assert(Main.run(Array("compare", "--config", cfg, "--content"), spark) == 0)
  }

  test("unknown command exits 2") {
    assert(Main.run(Array("frobnicate"), spark) == 2)
  }

  test("version exits 0 (reference cmd/version.go parity)") {
    assert(Main.run(Array("version"), spark) == 0)
  }
}
