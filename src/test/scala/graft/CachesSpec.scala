package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Caches

/**
 * Contract tests for the persist registry: scoped brackets release their
 * own persists on exit without touching global registrations, releaseAll
 * drains only the global queue, and nesting restores the outer scope.
 */
class CachesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != StorageLevel.NONE

  test("scoped releases bracket-local persists, leaves global ones alone") {
    import spark.implicits._
    val global = Caches.persist(Seq(1, 2, 3).toDF("a"))
    assert(cached(global))
    var inner: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      inner = Caches.persist(Seq(4, 5).toDF("b"))
      inner.count()
      assert(cached(inner))
    }
    assert(!cached(inner), "scoped persist must be released at bracket exit")
    assert(cached(global), "scoped release must not touch the global queue")
    Caches.releaseAll()
    assert(!cached(global))
  }

  test("nested scopes restore the outer scope, and failures still release") {
    import spark.implicits._
    var outer: org.apache.spark.sql.DataFrame = null
    var deep: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      outer = Caches.persist(Seq(1).toDF("a"))
      intercept[RuntimeException] {
        Caches.scoped {
          deep = Caches.persist(Seq(2).toDF("b"))
          throw new RuntimeException("boom")
        }
      }
      assert(!cached(deep), "inner scope must release on exception")
      assert(cached(outer), "outer scope must survive the inner bracket")
    }
    assert(!cached(outer))
  }
}
