package graft.sync

import scala.concurrent.{Await, Promise}
import scala.concurrent.duration.Duration

import graft.SparkSpec

class JobsSpec extends SparkSpec {

  test("tagSql prefixes the processlist-visible comment tag once") {
    assert(Jobs.tagSql("SELECT 1") == "/* graft */ SELECT 1")
    assert(Jobs.tagSql(Jobs.tagSql("SELECT 1")) == "/* graft */ SELECT 1")
  }

  test("cancelJobGroup aborts a tagged long-running job") {
    val done = Promise[Option[Throwable]]()
    val runner = new Thread(() =>
      try {
        Jobs.tagged(spark, "graft-kill-me") {
          spark.range(0, 4, 1, 4).rdd.foreach { _ =>
            var i = 0
            while (i < 600) { Thread.sleep(100); i += 1 } // ~60s unless killed
          }
        }
        done.success(None)
      } catch { case e: Throwable => done.success(Some(e)) })
    runner.start()
    Thread.sleep(2000) // let tasks get scheduled
    Jobs.cancel(spark, "graft-kill-me")
    val outcome = Await.result(done.future, Duration(30, "s"))
    assert(outcome.isDefined, "job was not cancelled")
    val msg = outcome.get.getMessage
    assert(msg != null && msg.toLowerCase.contains("cancel"), msg)
  }

  test("shutdown hook arms and disarms cleanly") {
    val hook = Jobs.armShutdownCancel(spark)
    Jobs.disarm(hook) // removing proves it was registered
  }
}
