package graft.ml

/** Driver-side average-linkage agglomerative clustering + silhouette over
  * a precomputed distance matrix (reference M3/M4/M5,
  * `eda_workspace/public_eda_pipeline.py:184-229`: 41 targets clustered on
  * 1−|corr| distance; sklearn `AgglomerativeClustering(linkage="average",
  * metric="precomputed")` + `silhouette_score(metric="precomputed")`).
  *
  * Driver-side is the right altitude (SURVEY.md §2.7): the input is a
  * k×k matrix with k ≤ a few hundred — the distributed engine's job is
  * producing the corr matrix, not clustering it. O(k³) worst case here
  * is microseconds at k=41.
  */
object Clustering {

  /** Average-linkage agglomerative clustering on a symmetric distance
    * matrix; cut at `k` clusters. Returns cluster ids (0-based,
    * relabeled by first-member order for determinism). Lance-Williams
    * update: d(A∪B, C) = (|A|·d(A,C) + |B|·d(B,C)) / (|A|+|B|). */
  def averageLinkage(dist: Array[Array[Double]], k: Int): Array[Int] = {
    val n = dist.length
    require(n >= 1 && dist.forall(_.length == n), "square matrix required")
    require(k >= 1 && k <= n)
    // working copy; clusters as mutable member lists
    val d = Array.tabulate(n, n)((i, j) => dist(i)(j))
    val active = scala.collection.mutable.LinkedHashSet(0 until n: _*)
    val size = Array.fill(n)(1)
    val members = Array.tabulate(n)(i => scala.collection.mutable.ArrayBuffer(i))
    var nClusters = n
    while (nClusters > k) {
      // find closest active pair (ties → smallest indices; deterministic)
      var bi = -1; var bj = -1; var best = Double.MaxValue
      val act = active.toArray
      var x = 0
      while (x < act.length) {
        var y = x + 1
        while (y < act.length) {
          val i = act(x); val j = act(y)
          if (d(i)(j) < best) { best = d(i)(j); bi = i; bj = j }
          y += 1
        }
        x += 1
      }
      // merge bj into bi (Lance-Williams average update)
      for (c <- active if c != bi && c != bj) {
        val nd = (size(bi) * d(bi)(c) + size(bj) * d(bj)(c)) / (size(bi) + size(bj))
        d(bi)(c) = nd; d(c)(bi) = nd
      }
      members(bi) ++= members(bj)
      size(bi) += size(bj)
      active -= bj
      nClusters -= 1
    }
    // relabel clusters by smallest member index
    val labels = Array.fill(n)(-1)
    active.toArray.map(c => members(c)).sortBy(_.min)
      .zipWithIndex.foreach { case (ms, lbl) => ms.foreach(m => labels(m) = lbl) }
    labels
  }

  /** Silhouette score with precomputed distances — mean over points of
    * (b−a)/max(a,b); a = mean intra-cluster distance (excluding self),
    * b = min over other clusters of mean distance. Singleton clusters
    * score 0 (sklearn convention). */
  def silhouette(dist: Array[Array[Double]], labels: Array[Int]): Double = {
    val n = dist.length
    val byCluster = labels.indices.groupBy(labels(_))
    val scores = (0 until n).map { i =>
      val own = byCluster(labels(i))
      if (own.size == 1) 0.0
      else {
        val a = own.filter(_ != i).map(j => dist(i)(j)).sum / (own.size - 1)
        val b = byCluster.filter(_._1 != labels(i)).values
          .map(js => js.map(j => dist(i)(j)).sum / js.size).min
        if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      }
    }
    scores.sum / n
  }

  /** M5: per-cluster summaries over a labeled item set: size, mean
    * pairwise intra-cluster distance (upper triangle), and the dominant
    * group share (reference: dominant target family,
    * `public_eda_pipeline.py:211-229`). */
  final case class ClusterSummary(
      cluster: Int, size: Int, avgIntraDist: Double,
      dominantGroup: String, dominantShare: Double)

  def summaries(
      dist: Array[Array[Double]], labels: Array[Int],
      groups: Array[String]): Seq[ClusterSummary] = {
    labels.indices.groupBy(labels(_)).toSeq.sortBy(_._1).map { case (c, idx) =>
      val pairs = for { x <- idx.indices; y <- x + 1 until idx.size }
        yield dist(idx(x))(idx(y))
      val avg = if (pairs.isEmpty) 0.0 else pairs.sum / pairs.size
      val (grp, cnt) = idx.groupBy(groups(_)).view.mapValues(_.size).toSeq
        .sortBy { case (g, m) => (-m, g) }.head
      ClusterSummary(c, idx.size, avg, grp, cnt.toDouble / idx.size)
    }
  }
}
