package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The 10× ("sf1") soak fixture: 10 shards, each a word-renamed copy of
 * sf0.1's `documents` (tokens prefixed with a shard namespace, ids offset
 * by shard) and a sign-flipped copy of `embeddings` (an orthogonal
 * transform per shard). Within-shard duplicate/near-dup and cosine
 * structure is bit-identical to sf0.1 while shards are mutually
 * unrelated — "same workload, more of it" (a naive 10× copy would square
 * the within-cluster pair counts). Shared by DedupSoakSf1Spec, the sf1
 * hash-pin suite (Sf1HashPinSpec) and the [[Sf1HashPin]] pin generator;
 * cached under target/ across runs.
 */
object SoakFixtures {

  val Sf1Dir = "target/soak_sf1"

  def ensureSf1(spark: SparkSession, sf01: String = "/root/testdata/sf0.1",
      soakDir: String = Sf1Dir): Unit = {
    val marker = new java.io.File(s"$soakDir/documents.parquet/_SUCCESS")
    if (!marker.exists()) {
      val base = spark.read.parquet(s"$sf01/documents.parquet")
      val shards = (0 until 10).map { k =>
        base.select(
          (col("doc_id") + lit(k * 5000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"s${k}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      shards.reduce(_ unionByName _)
        .repartition(8)
        .write.mode("overwrite").parquet(s"$soakDir/documents.parquet")
    }
    val embMarker = new java.io.File(s"$soakDir/embeddings.parquet/_SUCCESS")
    if (!embMarker.exists()) {
      val base = spark.read.parquet(s"$sf01/embeddings.parquet")
      val n = base.count()
      // shard k flips a deterministic sign pattern into every vector: an
      // orthogonal transform, so within-shard cosine structure is exactly
      // sf0.1's. NOTE the (i*31 + 7k) % 5 pattern has period 5 in k —
      // shards k and k+5 carry IDENTICAL signs, so each base vector
      // exists as 2 exact copies across the 10 shards. That overstated
      // decorrelation is harmless HERE (this fixture exists for the sf1
      // correctness pins — both engines see the same rows) and the
      // construction is deliberately frozen: changing it would invalidate
      // every pinned sf1 result hash for zero evidentiary gain. The PERF
      // fixtures (Soak100/Soak1000) use the full-diversity murmur3(k, i)
      // sign instead — do not measure scaling claims on this one.
      val shards = (0 until 10).map { k =>
        base.select(
          (col("vec_id") + lit(k * n)).as("vec_id"),
          zip_with(col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => when((i * 31 + lit(k * 7)) % 5 % 2 === 0, lit(1.0f)).otherwise(lit(-1.0f))),
            (x, s2) => x * s2).as("embedding"),
          col("label"))
      }
      shards.reduce(_ unionByName _)
        .repartition(8)
        .write.mode("overwrite").parquet(s"$soakDir/embeddings.parquet")
    }
  }
}
