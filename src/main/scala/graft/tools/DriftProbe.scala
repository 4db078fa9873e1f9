package graft.tools

import org.apache.spark.sql.functions._

/** DRIFT-TRIGGER PROBE (round-14 verdict task 5's evidence): does the
  * stored ANN index's drift statistic — the delta's mean
  * nearest-frozen-centroid cosine vs the base's
  * ([[graft.operators.Similarity.annIndexDrift]]) — actually SEPARATE
  * an in-distribution append from a drifted one?
  *
  * Fixture: [[PlantedFixture]] (the same corpus the recall gates
  * measure on — 64-dim, md5-seeded clusters, noise 0.05). The base
  * index trains on fresh draws from clusters 0..39; the
  * IN-DISTRIBUTION delta is NEW vector ids from those same clusters
  * (held-out noisy copies of the same means); the DRIFTED delta is
  * new ids from clusters 40..49 — means the training never saw, the
  * honest model of a new-domain ingest.
  *
  * Expected table (what AnnDriftSpec pins): the in-distribution
  * append's drift ≈ 0 (held-out vectors sit as close to the frozen
  * centroids as the training draw — the cluster structure, not the
  * training sample, owns the centroid positions), the drifted
  * append's drift far past [[graft.operators.Similarity
  * .RetrainDriftThreshold]].
  *
  * HONESTY — the unstructured row: on the near-random driver
  * embeddings the statistic reads a large "drift" even for an
  * in-distribution append, because with no real clusters the training
  * mean is pure selection optimism (C=√N cells fit noise). That is
  * the right answer operationally — an index over structureless data
  * has no recall to protect and retraining cannot help it — but it
  * means the trigger presumes the corpus the index was WORTH BUILDING
  * for. The probe prints that row too, labeled.
  *
  * Usage: `runMain graft.tools.DriftProbe [sfDir]`. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local(appName = "graft-drift-probe")
    import spark.implicits._
    println(f"[driftprobe] threshold=" +
      f"${graft.operators.Similarity.RetrainDriftThreshold}%.3f " +
      "(drift = base_mean_csim - delta_mean_csim)")

    def run(label: String, base: org.apache.spark.sql.DataFrame,
            delta: org.apache.spark.sql.DataFrame): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_driftprobe").toString
      graft.operators.Similarity.annIndexBuild(spark, root, base)
      graft.operators.Similarity.annIndexAppend(spark, root, delta)
      graft.operators.Similarity.annIndexDrift(spark, root)
        .foreach { d =>
          println(f"[driftprobe] $label%-20s gen=${d.gen}%-12s " +
            f"n=${d.n}%6d mean=${d.meanCsim}%8.4f " +
            f"base=${d.baseMeanCsim}%8.4f drift=${d.drift}%8.4f " +
            f"retrain=${d.retrain}")
        }
    }

    // planted corpus: 6000 ids over 50 clusters (id % 50); base =
    // first 4000 ids in clusters 0..39, deltas = ids 4000+ split by
    // cluster membership
    val all = PlantedFixture.vectors(spark, n = 6000, k = 50)
      .select($"vec_id", $"e")
    val base = all.filter($"vec_id" < 4000 && $"vec_id" % 50 < 40)
    run("planted/in-dist",
      base, all.filter($"vec_id" >= 4000 && $"vec_id" % 50 < 40))
    run("planted/drifted",
      base, all.filter($"vec_id" >= 4000 && $"vec_id" % 50 >= 40))

    // the labeled negative: unstructured corpus, in-distribution split
    val emb = graft.operators.Similarity.ivfVectors(spark, dir)
    run("unstructured/in-dist",
      emb.filter($"vec_id" % 3 === 0), emb.filter($"vec_id" % 3 === 1))
    spark.stop()
  }
}
