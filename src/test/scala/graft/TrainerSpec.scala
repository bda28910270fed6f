package graft

import graft.image.Trainer
import org.apache.spark.sql.functions._

class TrainerSpec extends SparkSpec {

  private lazy val teacher = Trainer.teacherVectors(3, 8)

  private def labeled(n: Int, parts: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until n).map { _ =>
      val x = Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)
      val y = teacher.indices.maxBy(c => teacher(c).zip(x).map { case (a, b) => a * b }.sum)
      (x, y)
    }.toDF("x", "y").repartition(parts)
  }

  test("trainSoftmax recovers a separable teacher; weights bit-identical across partitionings") {
    val m3  = Trainer.trainSoftmax(labeled(400, 3), "x", "y",
      Seq("a", "b", "c"), dim = 8)
    val acc = Trainer.accuracy(m3, labeled(400, 3), "x", "y")
    assert(acc >= 0.9, f"accuracy $acc%.3f")
    // the decimal-gradient contract: partition layout must not move a bit
    val m13 = Trainer.trainSoftmax(labeled(400, 13), "x", "y",
      Seq("a", "b", "c"), dim = 8)
    m3.weights.zip(m13.weights).foreach { case (r3, r13) =>
      assert(r3.sameElements(r13), "weights differ across partitionings")
    }
  }

  test("weighted-model registry round-trips exact weights and serves predictions") {
    val m = Trainer.trainSoftmax(labeled(200, 4), "x", "y",
      Seq("a", "b", "c"), dim = 8, iters = 10)
    val path = java.nio.file.Files.createTempDirectory("graft_trn").toString + "/m.txt"
    Trainer.save(m, path)
    val back = Trainer.load(path)
    assert(back.classes == m.classes)
    m.weights.zip(back.weights).foreach { case (a, b) =>
      assert(a.sameElements(b), "weights did not round-trip bit-exact")
    }
    // the ScoringModel contract end-to-end: predict emits [class, json]
    val pred = back.predict(Array.fill(8)(0.1f))
    assert(Seq("a", "b", "c").contains(pred(0)) && pred(1).startsWith("{"))
  }

  test("degenerate inputs fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Array[Float], Int)].toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Trainer.trainSoftmax(empty, "x", "y", Seq("a", "b"), dim = 8)
    }
    assert(e.getMessage.contains("no training rows"))
  }
}
