package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsertLatest: updates, inserts, deletes, and untouched rows") {
    val snap = Seq(
      (1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)
    ).toDF("k", "v", "version")
    val chg = Seq(
      (2L, "B2", 2L, false), // update
      (4L, "d", 2L, false),  // insert
      (3L, "c", 2L, true)    // delete tombstone
    ).toDF("k", "v", "version", "is_deleted")
    val out = Merge.upsertLatest(snap, chg, Seq("k"), "version",
        deleteCol = Some("is_deleted"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a"), (2L, "B2"), (4L, "d")))
  }

  test("upsertLatest: stale change loses; equal version prefers the change") {
    val snap = Seq((1L, "new", 5L), (2L, "same", 3L)).toDF("k", "v", "version")
    val chg = Seq(
      (1L, "old", 2L, false),  // stale: snapshot keeps its newer row
      (2L, "SAME2", 3L, false) // tie: change side wins deterministically
    ).toDF("k", "v", "version", "is_deleted")
    val out = Merge.upsertLatest(snap, chg, Seq("k"), "version",
        deleteCol = Some("is_deleted"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "new"), (2L, "SAME2")))
  }

  test("upsertLatest without a delete column is a plain upsert") {
    val snap = Seq((1L, "a", 1L)).toDF("k", "v", "version")
    val chg = Seq((1L, "A", 2L)).toDF("k", "v", "version")
    val out = Merge.upsertLatest(snap, chg, Seq("k"), "version")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "A")))
  }

  test("upsertLatest is idempotent: re-applying the same changes is a no-op") {
    val snap = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "version")
    val chg = Seq((1L, "A", 2L, false), (2L, "b", 2L, true))
      .toDF("k", "v", "version", "is_deleted")
    val once = Merge.upsertLatest(snap, chg, Seq("k"), "version", Some("is_deleted"))
    val twice = Merge.upsertLatest(once, chg, Seq("k"), "version", Some("is_deleted"))
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("scd2: validity chain with deterministic tie-break and current flag") {
    def ts(s: String) = Timestamp.valueOf(s)
    val log = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "v1"),
      (1L, 11L, ts("2024-01-02 00:00:00"), "v2"),
      (1L, 12L, ts("2024-01-02 00:00:00"), "v3"), // ts tie: id orders it
      (2L, 20L, ts("2024-01-05 00:00:00"), "only")
    ).toDF("k", "id", "ts", "v")
    val out = Merge.scd2(log, Seq("k"), "ts", "id")
      .orderBy("k", "valid_from", "id")
      .select("k", "v", "valid_to", "is_current").collect()
    // k=1: v1 → closed at 01-02; v2 → closed at 01-02 (the tie row); v3 current
    assert(out.map(_.getString(1)).toSeq === Seq("v1", "v2", "v3", "only"))
    assert(out.map(_.getBoolean(3)).toSeq === Seq(false, false, true, true))
    assert(out(0).getTimestamp(2) === ts("2024-01-02 00:00:00"))
    assert(out(1).getTimestamp(2) === ts("2024-01-02 00:00:00"))
    assert(out(2).isNullAt(2) && out(3).isNullAt(2))
  }
}
