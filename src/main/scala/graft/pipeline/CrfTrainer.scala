package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed linear-chain CRF training for the wapiti template
  * family — the in-repo TRAINING half of the D1 labeler. The reference
  * retrains its models by shelling out to `wapiti train` over
  * GROBID-style data lines (the `training/cli` tools, the p14/p15
  * artifacts);
  * this trainer learns the same model class from the same lines and
  * emits wapiti's native model format ([[CrfModel.toWapitiNative]]),
  * so the result loads both in [[CrfLabeler]] and in wapiti itself.
  *
  * Algorithm: averaged structured perceptron with ITERATIVE PARAMETER
  * MIXING (McDonald, Hall & Mann, NAACL 2010, "Distributed Training
  * Strategies for the Structured Perceptron"): each epoch broadcasts
  * the current weights, every partition runs a sequential perceptron
  * pass over its own documents (Viterbi-decode, and on a mistake add
  * the gold sequence's features and subtract the predicted one's),
  * and the driver uniformly averages the per-partition results into
  * the next epoch's weights. Parameter mixing is the published
  * distributed form with convergence guarantees for separable data —
  * mapped onto Spark as one `mapPartitions` pass per epoch over a
  * persisted, pre-featurized sequence RDD plus a driver-side average
  * whose size is the (sparse) feature count, never the corpus.
  *
  * Scale shape: sequences shuffle ONCE (repartition by doc, sort
  * within partitions); observation strings are expanded once and
  * cached, so an epoch is an embarrassingly parallel scan; the driver
  * holds only the weight vector (bounded by distinct observed
  * features × labels). Determinism: fixed hash partitioning, sorted
  * per-partition visit order, partition-ordered averaging — the same
  * input always trains the same model.
  */
object CrfTrainer {

  /** Trained model plus the per-epoch count of mis-decoded sequences
    * (a monotone-ish error trace; 0 means the training set is fit). */
  final case class TrainResult(model: CrfModel, seqErrors: Seq[Long])

  /** Pre-featurized training sequence: per-position unigram /
    * transition observation strings plus gold label ids. */
  private final case class Seqn(docId: Long, uni: Array[Array[String]],
      big: Array[Array[String]], gold: Array[Int]) extends Serializable

  /** Train from labeled data lines — `labeled` carries one row per
    * token with the `(doc_id, page_idx, block_idx, line_idx,
    * token_idx)` ordering key, a `featuresCol` data line and a
    * `labelCol` gold label (the p14/p15 training-artifact shape).
    * `templates` are wapiti template source lines (`u…`, `b…`, `*…`);
    * see [[CrfModel.compileTemplate]].
    */
  def train(labeled: DataFrame, templates: Seq[String], epochs: Int = 5,
      numPartitions: Int = 8, featuresCol: String = "features",
      labelCol: String = "label"): TrainResult = {
    require(epochs >= 1, "epochs must be >= 1")
    val spark = labeled.sparkSession
    import spark.implicits._
    val compiled = templates.map(t => CrfModel.compileTemplate(t.trim))
      .toIndexedSeq
    require(compiled.nonEmpty, "at least one template required")

    val labels = labeled.select(col(labelCol).cast("string"))
      .distinct().as[String].collect().sorted.toIndexedSeq
    val labIdx = labels.zipWithIndex.toMap
    val Y = labels.size
    require(Y >= 2, s"training data carries ${Y} distinct label(s)")

    val bcT = spark.sparkContext.broadcast(compiled)
    val bcL = spark.sparkContext.broadcast(labIdx)
    // one shuffle: doc-contiguous, deterministically ordered sequences
    val seqs = labeled.select(col("doc_id").cast("long"),
        col("page_idx").cast("int"), col("block_idx").cast("int"),
        col("line_idx").cast("int"), col("token_idx").cast("int"),
        col(featuresCol).cast("string"), col(labelCol).cast("string"))
      .as[(Long, Int, Int, Int, Int, String, String)]
      .repartition(numPartitions, col("doc_id"))
      .sortWithinPartitions("doc_id", "page_idx", "block_idx",
        "line_idx", "token_idx")
      .rdd.mapPartitions { it =>
        val tms = bcT.value
        val li = bcL.value
        val src = it.buffered
        new Iterator[Seqn] {
          override def hasNext: Boolean = src.hasNext
          override def next(): Seqn = {
            val d = src.head._1
            val buf = Vector.newBuilder[(String, String)]
            while (src.hasNext && src.head._1 == d)
              { val r = src.next(); buf += ((r._6, r._7)) }
            val rows = buf.result()
            val cols0: IndexedSeq[Array[String]] =
              rows.map(_._1.split("\\s+")).toIndexedSeq
            val n = rows.size
            val uni = Array.ofDim[Array[String]](n)
            val big = Array.ofDim[Array[String]](n)
            var t = 0
            while (t < n) {
              val ub = Array.newBuilder[String]
              val bb = Array.newBuilder[String]
              tms.foreach { tm =>
                lazy val obs = CrfModel.expandTemplate(tm, cols0, t)
                if ((tm.kind & 1) != 0) ub += obs
                if ((tm.kind & 2) != 0 && t > 0) bb += obs
              }
              uni(t) = ub.result(); big(t) = bb.result()
              t += 1
            }
            Seqn(d, uni, big, rows.map(r => li(r._2)).toArray)
          }
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)

    var uni = Map.empty[String, Array[Double]]
    var big = Map.empty[String, Array[Double]]
    val errs = mutable.ArrayBuffer.empty[Long]
    var epoch = 0
    while (epoch < epochs) {
      val bcU = spark.sparkContext.broadcast(uni)
      val bcB = spark.sparkContext.broadcast(big)
      val parts = seqs.mapPartitions { it =>
        val baseU = bcU.value; val baseB = bcB.value
        val lu = mutable.HashMap.empty[String, Array[Double]]
        val lb = mutable.HashMap.empty[String, Array[Double]]
        def wU(k: String): Array[Double] = lu.getOrElseUpdate(k,
          baseU.get(k).map(_.clone()).getOrElse(new Array[Double](Y)))
        def wB(k: String): Array[Double] = lb.getOrElseUpdate(k,
          baseB.get(k).map(_.clone()).getOrElse(new Array[Double](Y * Y)))
        def look(m: mutable.HashMap[String, Array[Double]],
            base: Map[String, Array[Double]], k: String): Array[Double] =
          m.getOrElse(k, base.getOrElse(k, null))
        var nSeq = 0L; var nErr = 0L
        it.foreach { s =>
          val n = s.gold.length
          if (n > 0) {
            nSeq += 1
            // Viterbi under the current local weights
            val delta = Array.ofDim[Double](n, Y)
            val back = Array.ofDim[Int](n, Y)
            var t = 0
            while (t < n) {
              val emit = new Array[Double](Y)
              s.uni(t).foreach { k =>
                val w = look(lu, baseU, k)
                if (w != null) { var y = 0; while (y < Y) { emit(y) += w(y); y += 1 } }
              }
              if (t == 0) {
                var y = 0; while (y < Y) { delta(0)(y) = emit(y); y += 1 }
              } else {
                val tr = new Array[Double](Y * Y)
                s.big(t).foreach { k =>
                  val w = look(lb, baseB, k)
                  if (w != null) { var i = 0; while (i < w.length) { tr(i) += w(i); i += 1 } }
                }
                var y = 0
                while (y < Y) {
                  var best = Double.NegativeInfinity; var bp = 0; var p = 0
                  while (p < Y) {
                    val sc = delta(t - 1)(p) + tr(p * Y + y)
                    if (sc > best) { best = sc; bp = p }
                    p += 1
                  }
                  delta(t)(y) = best + emit(y); back(t)(y) = bp
                  y += 1
                }
              }
              t += 1
            }
            var bestY = 0
            var y = 1
            while (y < Y) { if (delta(n - 1)(y) > delta(n - 1)(bestY)) bestY = y; y += 1 }
            val pred = new Array[Int](n)
            t = n - 1
            while (t >= 0) {
              pred(t) = bestY
              if (t > 0) bestY = back(t)(bestY)
              t -= 1
            }
            if (!java.util.Arrays.equals(pred, s.gold)) {
              nErr += 1
              t = 0
              while (t < n) {
                if (pred(t) != s.gold(t)) s.uni(t).foreach { k =>
                  val w = wU(k); w(s.gold(t)) += 1.0; w(pred(t)) -= 1.0
                }
                if (t > 0 && (pred(t) != s.gold(t) || pred(t - 1) != s.gold(t - 1)))
                  s.big(t).foreach { k =>
                    val w = wB(k)
                    w(s.gold(t - 1) * Y + s.gold(t)) += 1.0
                    w(pred(t - 1) * Y + pred(t)) -= 1.0
                  }
                t += 1
              }
            }
          }
        }
        Iterator.single((lu.toMap, lb.toMap, nSeq, nErr))
      }.collect()
      // iterative parameter mixing: uniform average over the shards
      // that hold data (collect preserves partition order → the float
      // sums are deterministic)
      val active = parts.filter(_._3 > 0L)
      val s = math.max(1, active.length)
      def avg(locals: Seq[Map[String, Array[Double]]],
          base: Map[String, Array[Double]], width: Int): Map[String, Array[Double]] = {
        val keys = (locals.iterator.flatMap(_.keysIterator) ++
          base.keysIterator).toSet.toSeq.sorted
        keys.iterator.map { k =>
          val acc = new Array[Double](width)
          locals.foreach { m =>
            val w = m.getOrElse(k, base.getOrElse(k, null))
            if (w != null) { var i = 0; while (i < width) { acc(i) += w(i); i += 1 } }
          }
          var i = 0
          while (i < width) { acc(i) /= s; i += 1 }
          k -> acc
        }.filter(_._2.exists(_ != 0.0)).toMap
      }
      uni = avg(active.map(_._1).toSeq, uni, Y)
      big = avg(active.map(_._2).toSeq, big, Y * Y)
      errs += active.map(_._4).sum
      bcU.destroy(); bcB.destroy()
      epoch += 1
      // training error hit zero: further epochs cannot change anything
      // (every shard decodes every sequence correctly and averages the
      // unchanged weights) — stop early, the trace records the zero
      if (errs.last == 0L) epoch = epochs
    }
    seqs.unpersist(blocking = false)
    bcT.destroy(); bcL.destroy()

    // fold constant-bigram observations (the plain `b` template —
    // identical expansion at every position) into the static
    // transition matrix, exactly as [[CrfModel.parseWapitiNative]]
    // does on load
    val constObs: Set[String] = compiled
      .filter(tm => (tm.kind & 2) != 0 && tm.chunks.forall(_.isInstanceOf[CrfModel.Lit]))
      .map(_.chunks.collect { case CrfModel.Lit(x) => x }.mkString)
      .toSet
    val trans = Array.ofDim[Double](Y, Y)
    big.foreach { case (k, w) =>
      if (constObs.contains(k)) {
        var p = 0
        while (p < Y) {
          var y = 0
          while (y < Y) { trans(p)(y) += w(p * Y + y); y += 1 }
          p += 1
        }
      }
    }
    TrainResult(CrfModel(labels, compiled, uni, trans,
      big.filterNot { case (k, _) => constObs.contains(k) }), errs.toSeq)
  }
}
