package graft

import graft.sources.MessageStore
import org.apache.spark.sql.functions._

/** Reference API parity (server.py): full keyspace lifecycle — DDL, batch
  * inserts, partition read in clustering order, projection scan, PK point
  * lookup with upsert (LWW) semantics, compaction, drop. */
class MessageStoreSpec extends SparkSpec {

  private val ks = s"ks_test_${System.nanoTime()}"
  private lazy val store = new MessageStore(spark, ks)

  test("keyspace lifecycle: create, tables, inserts, reads, drop") {
    store.createKeyspace()
    store.createTables()

    store.insertUsers(Seq(
      ("u1", "alice", "alice@a.io", "pw1"),
      ("u2", "bob", "bob@b.io", "pw2")))
    store.insertMessages(Seq(
      (1L, "u1", "first in channel 1"),
      (1L, "u2", "second in channel 1"),
      (2L, "u1", "only in channel 2")))
    store.insertMessages(Seq((1L, "u2", "third in channel 1")))

    // partition read: only channel 1, newest batch first
    val ch1 = store.messages(1L).collect()
    assert(ch1.length == 3)
    assert(ch1.forall(_.getAs[Long]("channel_id") == 1L))
    assert(ch1.head.getAs[String]("message") == "third in channel 1")
    val seqs = ch1.map(_.getAs[Long]("write_seq"))
    assert(seqs.sameElements(seqs.sortBy(-_)), "clustering order must be newest-first")

    // full scan sees both channels
    assert(store.allMessages().count() == 4)

    // projection scan: 3 columns only, no password
    assert(store.listUsers().columns.toSeq == Seq("user_id", "username", "email"))
    assert(store.listUsers().count() == 2)

    // upsert semantics: re-inserting username alice replaces her row
    store.insertUsers(Seq(("u1", "alice", "alice@new.io", "pw9")))
    val alice = store.user("alice").collect()
    assert(alice.length == 1, "PK read returns exactly one row after upsert")
    assert(alice.head.getAs[String]("email") == "alice@new.io")

    // compaction rewrites to the LWW view without changing read results
    store.compactUsers()
    assert(spark.table(s"$ks.users").count() == 2, "compaction drops shadowed writes")
    assert(store.user("alice").collect().head.getAs[String]("email") == "alice@new.io")

    // channel predicate is pushed to the parquet scan
    val plan = store.messages(1L).queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("channel_id"),
      "partition-key filter must reach the scan:\n" + plan.take(600))

    store.dropKeyspace()
    assert(!spark.catalog.databaseExists(ks))
  }
}
