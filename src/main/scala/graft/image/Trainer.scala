package graft.image

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-parallel model training on Spark primitives — the distributed-
  * training DATA FLOW of the reference's Horovod notebooks (`02.a Train -
  * TensorFlow Distributed.py:292-351`, `02.b … PyTorch …:428-485`) without
  * their DL runtime (none exists in this environment; SURVEY.md §1):
  * full-batch softmax regression where each iteration's gradient is an
  * ALLREDUCE expressed as a single-stage mapPartitions reduction over the
  * partitioned feature table — the shape MLlib's own linear trainers use.
  *
  * Two engine-specific disciplines:
  *
  *  - **Bit-reproducible gradients.** A plain double `treeAggregate` sums
  *    per-row gradients in partition order — last-ulp results change with
  *    partitioning. Every gradient component instead quantizes ONCE per
  *    row (rint(g·2⁴⁰)) and accumulates by EXACT integer addition
  *    (long accumulators folding into BigInteger), so the trained weights
  *    are identical on any cluster layout — the same order-free-exact
  *    rule the relational aggregates use (SURVEY §5).
  *  - **One job per iteration, weights in the closure.** The (C × (D+1))
  *    weight matrix is KBs; it ships with the gradient kernel each
  *    iteration and the aggregation returns C·(D+1) decimal sums — wire
  *    cost per iteration is O(model), never O(data).
  */
object Trainer {

  /** Trained multiclass linear model — [[ScoringModel]] with explicit
    * weights (vs [[LinearScoringModel]]'s seed-derived stand-in), so the
    * whole loop closes: train → save → load → batch/stream inference. */
  final class WeightedLinearModel(
      val classes: Seq[String],
      val weights: Array[Array[Double]]) // C rows × (D+1): last column = bias
      extends ScoringModel {
    require(weights.length == classes.length, "one weight row per class")
    override def scores(features: Array[Float]): Array[Double] =
      weights.map { w =>
        var s = w(w.length - 1)
        var i = 0
        while (i < w.length - 1) { s += w(i) * features(i); i += 1 }
        s
      }
  }

  /** Full-batch softmax-regression fit over (vecCol: Array[Float] of
    * `dim`, labelCol: Int in [0, nClasses)). Zero-initialized, `iters`
    * heavy-ball momentum steps (`beta`) at `lr` on the MEAN cross-entropy
    * gradient. Returns the trained model. Deterministic for a fixed input
    * regardless of partitioning (see the quantized-accumulation note). */
  def trainSoftmax(df: DataFrame, vecCol: String, labelCol: String,
      classes: Seq[String], dim: Int, lr: Double = 10.0, iters: Int = 20,
      beta: Double = 0.9): WeightedLinearModel = {
    val nC = classes.length
    require(nC >= 2, s"need >= 2 classes, got $nC")
    val cols = nC * (dim + 1)
    val data = df.select(col(vecCol).as("x"), col(labelCol).cast("int").as("y"))
      .where(col("x").isNotNull && size(col("x")) === dim && col("y").between(0, nC - 1))
    // One setup job total: project to primitive (features, label) pairs and
    // cache THOSE — each of the `iters` jobs then starts from deserialized
    // primitive arrays instead of re-decoding Rows (and re-boxing the float
    // Seq) every iteration. The count below materializes the cache in the
    // same pass; it is the ONLY count (r7 ran it twice, plus two eager
    // localCheckpoint materializations — four setup jobs where one does).
    val all = data.select(col("x"), col("y")).rdd
      .map(r => (r.getSeq[Float](0).toArray, r.getInt(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nL = all.count()
    require(nL > 0, "no training rows")
    val n = nL.toDouble
    // every iteration is a full job over this data — per-task scheduler
    // cost × iters dominates when rows-per-task is tiny. Right-size the
    // iteration parallelism to the data (≥64k rows per task before more
    // tasks help; a 100 TB corpus still fans out fully). coalesce stays
    // LAZY over the cached parent: iteration tasks read the cached blocks
    // in-process, no second materialization job, no second copy — and the
    // exact-decimal gradients make the layout bit-irrelevant anyway.
    val nParts = math.max(1, math.min(all.getNumPartitions, (nL / 65536L).toInt + 1))
    val rows = if (nParts < all.getNumPartitions) all.coalesce(nParts) else all
    var w = Array.fill(nC, dim + 1)(0.0)
    val v = Array.fill(nC, dim + 1)(0.0)
    // Single-stage allreduce per iteration: mapPartitions folds each
    // partition into ONE exact gradient array, the driver merges the
    // per-partition arrays. No SQL aggregate, no shuffle stage: a 2-stage
    // SQL agg paid ~0.6 s/iteration of pure job machinery (measured)
    // against ~ms of gradient math.
    //
    // Quantized-accumulation determinism: each per-row gradient component
    // quantizes ONCE (deterministically, rint(g·2⁴⁰)) to a long; the sums
    // are then EXACT INTEGER addition — associative and commutative, so
    // any partitioning, task order, or merge order yields the same bits.
    // (The r7 BigDecimal.valueOf(double) formulation had the same
    // guarantee but paid a full-precision Double.toString per component
    // per row — ~0.25 s/iteration of pure formatting at sf0.1, measured;
    // the quantized path is ~30× cheaper per row and the 2⁻⁴⁰ relative
    // quantization step is ~10⁻¹² — far below any gradient signal.)
    // Long accumulators fold into BigInteger every FoldEvery rows
    // (count-based, value-independent), so a 100 TB partition cannot
    // overflow: |q| ≤ maxAbs·2⁴⁰ and FoldEvery·maxAbs·2⁴⁰ < 2⁶³ is
    // enforced per batch fold; exactness makes WHEN the folds happen
    // irrelevant to the result.
    val Scale     = 1L << 40
    val FoldEvery = 1 << 18
    var it = 0
    while (it < iters) {
      val wb = w
      val parts: Array[Array[java.math.BigInteger]] = rows.mapPartitions { rs =>
        val big  = Array.fill(cols)(java.math.BigInteger.ZERO)
        val acc  = new Array[Long](cols)
        val s    = new Array[Double](nC)
        val g    = new Array[Double](cols)
        var inAcc = 0
        def fold(): Unit = {
          var i = 0
          while (i < cols) {
            if (acc(i) != 0L) { big(i) = big(i).add(java.math.BigInteger.valueOf(acc(i))); acc(i) = 0L }
            i += 1
          }
          inAcc = 0
        }
        rs.foreach { case (x, y) =>
          var c = 0
          while (c < nC) {
            var a = wb(c)(dim)
            var i = 0
            while (i < dim) { a += wb(c)(i) * x(i); i += 1 }
            s(c) = a
            c += 1
          }
          val mx = s.max
          var z = 0.0
          c = 0
          while (c < nC) { s(c) = math.exp(s(c) - mx); z += s(c); c += 1 }
          c = 0
          while (c < nC) {
            val d = s(c) / z - (if (c == y) 1.0 else 0.0)
            var i = 0
            while (i < dim) { g(c * (dim + 1) + i) = d * x(i); i += 1 }
            g(c * (dim + 1) + dim) = d
            c += 1
          }
          var i = 0
          while (i < cols) {
            // per-row quantization: |softmax d| ≤ 1 so |g| ≤ max(1, |x|ᵢ);
            // addExact backstops the FoldEvery bound against wild features
            acc(i) = Math.addExact(acc(i), Math.rint(g(i) * Scale).toLong)
            i += 1
          }
          inAcc += 1
          if (inAcc >= FoldEvery) fold()
        }
        fold()
        Iterator.single(big)
      }.collect()
      val g = Array.fill(cols)(java.math.BigInteger.ZERO)
      parts.foreach { pa =>
        var i = 0
        while (i < cols) { g(i) = g(i).add(pa(i)); i += 1 }
      }
      w = Array.tabulate(nC, dim + 1) { (c, i) =>
        // BigInteger→double rounds once, deterministically; /Scale and /n
        // are exact-operand double divisions — same bits on any layout
        val vi = beta * v(c)(i) + g(c * (dim + 1) + i).doubleValue() / Scale.toDouble / n
        v(c)(i) = vi
        w(c)(i) - lr * vi
      }
      it += 1
    }
    all.unpersist(blocking = false)
    new WeightedLinearModel(classes, w)
  }

  /** Deterministic "hidden teacher" vectors for learnability tests: labels
    * produced as `argmax_c teacher_c · x` are linearly separable BY
    * CONSTRUCTION, so a correct trainer must recover them — the standard
    * sanity eval when no labeled corpus ships with the environment. */
  def teacherVectors(nClasses: Int, dim: Int, seed: Long = 7L): Array[Array[Float]] = {
    def splitmix64(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d4a2ca9ab4c19bL
      z ^ (z >>> 31)
    }
    Array.tabulate(nClasses, dim) { (c, i) =>
      (splitmix64(seed + c * 8191L + i).toDouble / Long.MaxValue.toDouble).toFloat
    }
  }

  /** Registry persistence for trained weights (the v2 artifact beside
    * [[ScoringModel]]'s seed-derived v1): format tag, URL-encoded classes,
    * one exact-`toString` double row per class. */
  private val WeightedTag = "graft-weighted-v1"

  def save(model: WeightedLinearModel, path: String): Unit = {
    val enc = model.classes.map(c =>
      java.net.URLEncoder.encode(c, java.nio.charset.StandardCharsets.UTF_8))
    val rows = model.weights.map(_.mkString(",")).mkString("\n")
    graft.tables.FsIO.writeText(path,
      s"$WeightedTag\nclasses=${enc.mkString(",")}\n$rows\n")
  }

  def load(path: String): WeightedLinearModel = {
    val body = graft.tables.FsIO.readText(path)
      .getOrElse(throw new IllegalArgumentException(s"no model artifact at $path"))
    val lines = body.split("\n").filter(_.nonEmpty)
    require(lines.headOption.contains(WeightedTag), s"not a $WeightedTag artifact: $path")
    val classes = lines(1).stripPrefix("classes=").split(",").toSeq.map(c =>
      java.net.URLDecoder.decode(c, java.nio.charset.StandardCharsets.UTF_8))
    val w = lines.drop(2).map(_.split(",").map(_.toDouble))
    new WeightedLinearModel(classes, w)
  }

  /** Train-set accuracy of a model over the same frame shape. */
  def accuracy(model: ScoringModel, df: DataFrame, vecCol: String, labelCol: String): Double = {
    val predUdf = udf((x: Seq[Float]) => {
      val s = model.scores(x.toArray)
      var best = 0
      var i = 1
      while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
      best
    })
    val r = df.where(col(vecCol).isNotNull)
      .select((predUdf(col(vecCol)) === col(labelCol).cast("int")).cast("long").as("ok"))
      .agg(sum("ok").cast("long").as("k"), count(lit(1)).as("n")).head()
    r.getLong(0).toDouble / math.max(1L, r.getLong(1))
  }
}
