package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label): brute-force cosine top-k as the exact baseline and
  * a random-hyperplane LSH bucketing as the 10^12-scale path.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in double
    * with sequential order (matches DuckDB's list_cosine_similarity).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Brute-force top-k neighbors for the query vectors (vec_id < nQueries).
    * Broadcast the tiny query side; rank by rounded cosine then vec_id so
    * ordering is reproducible across engines.
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(cosine(col("embedding"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("sim"))
  }

  def bruteForceTopKSql(embRel: String, nQueries: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM $embRel WHERE vec_id < $nQueries),
       |scored AS (SELECT q.qid, e.vec_id,
       |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS sim
       |  FROM $embRel e CROSS JOIN q WHERE e.vec_id <> q.qid),
       |ranked AS (SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT qid, rank, vec_id, sim FROM ranked WHERE rank <= $k""".stripMargin.replace("\n", " ")

  /** Embedding near-duplicate pairs: cosine >= threshold within a candidate
    * set. Exact O(n^2) within LSH buckets; see [[lshSignature]].
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("e_a"), col("e_b")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  def cosineNearDupPairsSql(embRel: String, threshold: Double): String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
       |FROM $embRel a JOIN $embRel b ON a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= $threshold""".stripMargin.replace("\n", " ")

  /** Random-hyperplane LSH signature (`nBits` sign bits). Hyperplane h_j[d]
    * is a deterministic +/-1 from a bit-mix of (j, d) — no stored model, so
    * executors recompute it for free and the signature is reproducible.
    * Near vectors collide in at least one band with high probability.
    */
  def lshSignature(v: Column, nBits: Int = 16): Column = {
    def hyper(j: Int, d: Column): Column = {
      val mixed = (lit(j.toLong * 1315423911L) + d.cast("long") * lit(2654435761L)) % 2
      when(pmod(mixed, lit(2L)) === 0, lit(1.0)).otherwise(lit(-1.0))
    }
    (0 until nBits).map { j =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x.cast("double") * hyper(j, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second scale path beside LSH.
  // Index build: one k-means (Lloyd) iteration over a deterministic sample
  // seeds C centroids; every vector is then assigned to its nearest centroid
  // by a pure map expression (centroids inlined as literals — the "model" is
  // a dim-table-sized artifact, exactly like a broadcast dimension). At
  // query time only the nProbe nearest cells are scanned, so per-query cost
  // is |probed cells|, not |table|; the big side never cross-joins.
  // ------------------------------------------------------------------

  /** Nearest-centroid cell id for a vector column: argmax cosine over the
    * inlined centroid literals (ties -> lowest cid). Pure projection — the
    * 10^12-row assignment pass is map-only, no shuffle.
    */
  def ivfCell(v: Column, centroids: Array[Array[Float]]): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(v, typedLit(c.toSeq)).as("s"), lit(-i).as("ni"))
    }: _*)
    (array_max(scored)("ni") * -1).cast("int")
  }

  /** Top-`nProbe` cells for a query vector, nearest-first. */
  def ivfProbes(v: Column, centroids: Array[Array[Float]], nProbe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(v, typedLit(c.toSeq)).as("s"), lit(-i).as("ni"))
    }: _*)
    transform(slice(reverse(array_sort(scored)), 1, nProbe),
      e => (e("ni") * -1).cast("int"))
  }

  /** Coarse quantizer: C centroids = one Lloyd iteration over a deterministic
    * sample (`vec_id % sampleMod == 0`), seeded by the C lowest vec_ids.
    * Cells that lose all sample members keep their seed. Driver-side result
    * is C x dim floats (tiny); at 100 TB the sample keeps this one cheap
    * aggregation pass bounded.
    */
  def ivfCentroids(emb: DataFrame, nCells: Int, sampleMod: Int = 1): Array[Array[Float]] = {
    val sample =
      if (sampleMod > 1) emb.filter(pmod(col("vec_id"), lit(sampleMod)) === 0) else emb
    val seeds: Array[Array[Float]] = sample.orderBy("vec_id").limit(nCells)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    // one Lloyd step: assign sample to seed cells (map-only), then per-cell
    // per-dim mean — a (cell, dim)-keyed partial-agg shuffle of tiny width
    val means = sample.withColumn("cell", ivfCell(col("embedding"), seeds))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("cell", "d").agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
      }
    seeds.indices.map(i => means.getOrElse(i, seeds(i))).toArray
  }

  /** IVF top-k: exact cosine rank within the nProbe probed cells per query.
    * The probe fan-out (queries x nProbe) stays on the tiny broadcast side;
    * the indexed table joins on its map-derived `cell` key.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
      nCells: Int = 16, nProbe: Int = 4, sampleMod: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = ivfCentroids(emb, nCells, sampleMod)
    val indexed = emb.withColumn("cell", ivfCell(col("embedding"), cents))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("cell", explode(ivfProbes(col("qv"), cents, nProbe)))
    val scored = indexed.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(cosine(col("embedding"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("sim"))
  }

  /** ANN via LSH: exact cosine only within same-signature-band buckets.
    * Scale path: shuffle cost is rows x bands, never a cross join.
    */
  def lshNearDupPairs(emb: DataFrame, threshold: Double,
      nBits: Int = 16, bands: Int = 4): DataFrame = {
    val rows = nBits / bands
    val sigs = emb.select(col("vec_id"), col("embedding"),
      lshSignature(col("embedding"), nBits).as("sig"))
    val banded = sigs.select(col("vec_id"), col("embedding"),
      explode(array((0 until bands).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * rows).bitwiseAND(lit((1L << rows) - 1)).as("bs"))): _*)).as("x"))
      .select(col("vec_id"), col("embedding"), col("x.band"), col("x.bs"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bs") === col("r.bs") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
        col("l.embedding").as("e_a"), col("r.embedding").as("e_b"))
      .distinct()
      .withColumn("sim", round(cosine(col("e_a"), col("e_b")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
