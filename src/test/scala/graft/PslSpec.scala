package graft

import graft.operators.Psl
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** PSL-table registered domain: every rule form (plain, multi-label,
  * wildcard, exception, default), the NULL contract for hosts that are
  * themselves public suffixes, and the shuffle-free plan shape. */
class PslSpec extends SparkSpec {
  import spark.implicits._

  private def domains(hosts: String*): Seq[Option[String]] = {
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
    Psl.registeredDomainByTable(df, "host", Psl.rulesDf(spark))
      .orderBy("id").select("domain").as[Option[String]].collect().toSeq
  }

  test("plain and multi-label rules: suffix plus one label") {
    assert(domains("a.b.example.co.uk", "www.example.com", "example.com",
      "foo.com.br", "cdn.a.co.in") === Seq(
      Some("example.co.uk"), Some("example.com"), Some("example.com"),
      Some("foo.com.br"), Some("a.co.in")))
  }

  test("a public suffix itself has no registered domain") {
    assert(domains("com", "co.uk", "x.ck", "grammar.sch.uk",
      "localhost") === Seq(None, None, None, None, None))
  }

  test("wildcard *.ck: one label under any .ck label registers") {
    assert(domains("shop.x.ck", "a.shop.x.ck") ===
      Seq(Some("shop.x.ck"), Some("shop.x.ck")))
  }

  test("exception !www.ck carves www.ck back out of the wildcard") {
    assert(domains("www.ck", "a.www.ck", "b.a.www.ck") ===
      Seq(Some("www.ck"), Some("www.ck"), Some("www.ck")))
  }

  test("3-label wildcard *.sch.uk") {
    assert(domains("x.grammar.sch.uk", "deep.x.grammar.sch.uk") ===
      Seq(Some("x.grammar.sch.uk"), Some("x.grammar.sch.uk")))
  }

  test("unknown TLD falls to the implicit * default; NULL host stays NULL") {
    val df = Seq((0L, "foo.unknowntld"), (1L, null.asInstanceOf[String]))
      .toDF("id", "host")
    val r = Psl.registeredDomainByTable(df, "host", Psl.rulesDf(spark))
      .orderBy("id").select("domain").as[Option[String]].collect().toSeq
    assert(r === Seq(Some("foo.unknowntld"), None))
  }

  test("plan: broadcast joins only, corpus never exchanged") {
    spark.sharedState.cacheManager.clearCache()
    val hosts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(lit("a.example"), pmod(col("doc_id"), lit(50)).cast("string"),
          lit(".co.uk")).as("host"))
    val plan = Psl.registeredDomainByTable(hosts, "host",
      Psl.rulesDf(spark)).queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"))
    assert(!plan.toString.contains("SortMergeJoin"),
      "the PSL table must broadcast, never sort-merge")
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"corpus was exchanged:\n$plan")
  }
}
