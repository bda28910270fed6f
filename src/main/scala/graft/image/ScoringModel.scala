package graft.image

/** Pluggable model-as-UDF surface (SURVEY.md §2g I6): the reference wraps an
  * MLflow pyfunc model in a Spark UDF returning `[prediction,
  * probabilities-json]` (`03. Inference.py:28-34,86-90`,
  * `02.a Train - TensorFlow Distributed.py:192-233`). Our engine keeps the
  * pipeline shape — a model loaded once per executor, applied as a UDF —
  * with the DL runtime behind this trait.
  *
  * Implementations must be deterministic and serializable (shipped in the
  * task closure; heavyweight state should live in a `lazy val` so it
  * initializes once per executor JVM, mirroring the reference's per-worker
  * model load `02.b …:311-318`).
  */
trait ScoringModel extends Serializable {
  def classes: Seq[String]

  /** Raw class scores for a feature vector (higher = more likely). */
  def scores(features: Array[Float]): Array[Double]

  /** Softmax probabilities. */
  final def probabilities(features: Array[Float]): Array[Double] = {
    val s   = scores(features)
    val mx  = s.max
    val exp = s.map(v => math.exp(v - mx))
    val sum = exp.sum
    exp.map(_ / sum)
  }

  /** The reference's result contract: `[prediction, probabilities-json]`
    * (`02.a …:227-233`: class name + `json.dumps` of class→rounded prob). */
  final def predict(features: Array[Float]): Array[String] = {
    val probs = probabilities(features)
    val best  = probs.indices.maxBy(probs)
    // class names are implementation-supplied — escape them, or a quote or
    // backslash in a name emits malformed JSON that breaks any downstream
    // from_json over the probabilities column
    def esc(s: String): String = s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }
    val json = classes.zip(probs)
      .map { case (c, p) => s""""${esc(c)}": ${math.rint(p * 1000) / 1000.0}""" }
      .mkString("{", ", ", "}")
    Array(classes(best), json)
  }
}

/** Model registry surface (the reference's MLflow load-by-URI shape,
  * `03. Inference.py:24-28`, `02.a …:241-253`): persist a model under a
  * path, load it back eagerly on the driver, or hand executors a lazy
  * reference that materializes once per JVM ([[ScoringModel.lazyRef]] —
  * the per-worker load of `02.b …:311-318`).
  *
  * Storage is a 3-line text artifact via Hadoop FS (works on file://, HDFS,
  * S3): format tag, seed, URL-encoded class names. A [[LinearScoringModel]]
  * is fully determined by (classes, seed) — weights re-derive on load. */
object ScoringModel {

  private val FormatTag = "graft-linear-v1"

  /** FS access goes through [[graft.tables.FsIO]]: one copy of the text-IO
    * plumbing, and a Hadoop configuration that carries the session's
    * `spark.hadoop.*` settings on executors too (a bare `Configuration`
    * would lack S3/HDFS credentials inside a task). */
  def save(model: LinearScoringModel, path: String): Unit = {
    val enc = model.classes.map(c =>
      java.net.URLEncoder.encode(c, java.nio.charset.StandardCharsets.UTF_8))
    graft.tables.FsIO.writeText(path,
      s"$FormatTag\nseed=${model.seed}\nclasses=${enc.mkString(",")}\n")
  }

  def load(path: String): LinearScoringModel = {
    val body = graft.tables.FsIO.readText(path)
      .getOrElse(throw new IllegalArgumentException(s"no model artifact at $path"))
    val lines = body.split("\n")
    require(lines.headOption.contains(FormatTag), s"not a $FormatTag artifact: $path")
    val fields = lines.tail.map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    val classes = fields("classes").split(",").toSeq.map(c =>
      java.net.URLDecoder.decode(c, java.nio.charset.StandardCharsets.UTF_8))
    new LinearScoringModel(classes, fields("seed").toLong)
  }

  /** Per-JVM artifact cache: a `@transient lazy val` inside the UDF closure
    * would re-load once per TASK (each task deserializes a fresh closure
    * instance) — the object-level map is the actual once-per-executor-JVM
    * registry read the reference's per-worker model load does
    * (`02.b …:311-318`). The cache is path-keyed for the JVM lifetime:
    * registry artifacts are immutable-at-a-version by contract (a new model
    * gets a new path), so in-place mutation of an artifact file is only
    * observed across JVM restarts — not detected mid-process. */
  private val loaded = scala.collection.concurrent.TrieMap[String, LinearScoringModel]()

  private[image] def cachedLoad(path: String): LinearScoringModel =
    loaded.getOrElseUpdate(path, load(path))

  /** Executor-side lazy reference: ships only the path; the artifact loads
    * once per executor JVM on first use (via [[cachedLoad]]), so a scoring
    * UDF over 100 TB does one registry read per executor, not per row or
    * per task. */
  def lazyRef(path: String): ScoringModel = new ScoringModel {
    @transient private lazy val inner: LinearScoringModel = cachedLoad(path)
    override def classes: Seq[String] = inner.classes
    override def scores(features: Array[Float]): Array[Double] = inner.scores(features)
  }
}

/** Deterministic stand-in model: linear layer over channel statistics with
  * splitmix64-derived fixed weights. No DL runtime exists in this
  * environment (SURVEY.md §1) — this preserves the I6 pipeline shape
  * (decode → featurize → score → [prediction, json]) with reproducible
  * outputs that tests can assert on. */
final class LinearScoringModel(val classes: Seq[String], val seed: Long = 42L) extends ScoringModel {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a2ca9ab4c19bL
    z ^ (z >>> 31)
  }

  /** 6 summary features: per-channel mean + per-channel mean|x|. */
  private def featurize(features: Array[Float]): Array[Double] = {
    val sums = new Array[Double](6)
    var i    = 0
    while (i < features.length) {
      val c = i % 3
      sums(c) += features(i)
      sums(3 + c) += math.abs(features(i))
      i += 1
    }
    val n = math.max(1, features.length / 3)
    sums.map(_ / n)
  }

  private val weights: Array[Array[Double]] = Array.tabulate(classes.length, 6) { (c, f) =>
    (splitmix64(seed + c * 131L + f).toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  override def scores(features: Array[Float]): Array[Double] = {
    val x = featurize(features)
    weights.map(w => w.zip(x).map { case (a, b) => a * b }.sum)
  }
}
