package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Cosine similarity is computed in expression space (zip_with + aggregate,
  * codegen'd — no UDF) with every element cast to DOUBLE and summed in
  * ascending index order, which is bit-identical to the DuckDB oracle's
  * double-cast `list_cosine_similarity`.
  *
  * Two paths:
  *  - [[knnBruteForce]]: broadcast the (small) query set against every
  *    vector — the exact baseline. Per-partition the ranking is a window
  *    top-k per query; only (queries × k) rows survive to the final sort.
  *  - [[knnIvf]]: IVF-style coarse quantization — vectors are bucketed by
  *    their nearest centroid, queries probe only the closest `nprobe`
  *    buckets. At 100 TB the probe join prunes the scan to
  *    nprobe/nlist of the corpus; recall vs. brute force is property-tested
  *    (approximate ⇒ no SQL oracle, rows-only check).
  */
object Knn {

  private val NumQueries = 8
  private val K = 10

  /** dot(a, b) with double accumulation in index order — the codegen'd
    * native expression ([[graft.functions.FloatVecDot]]); bit-identical to
    * the composable `aggregate(zip_with(...))` form it replaced, ~10×
    * faster (tight primitive loop vs interpreted lambdas).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.vecDot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** (vec_id, embedding, nrm): norm computed once per vector, so pairwise
    * cosine needs one dot per pair instead of three. `sqrt(dot(v,v))` here
    * is the same expression the pairwise form evaluates, so cached-norm
    * cosine is bit-identical to [[cosine]] (and to the DuckDB oracle).
    */
  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))

  /** Exact top-k cosine neighbors for queries vec_id < [[NumQueries]].
    * Output: (query_id, rank, neighbor_id, cos_sim).
    */
  def knnBruteForce(embeddings: DataFrame): DataFrame = {
    val e = withNorm(embeddings)
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("nrm").as("q_nrm"))
    val joined = e
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cos_sim"))
    joined
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val knnBruteForceSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < $NumQueries
       |), scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_cosine_similarity(q.qe, e.emb) AS cos_sim
       |  FROM q JOIN e ON e.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cos_sim
       |FROM ranked WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  /** IVF-bucketed approximate top-k: a coarse quantizer of `nlist`
    * deterministic seed vectors (vec_id 0..nlist-1 — a k-means iteration
    * would slot in the same place) buckets every vector by nearest seed;
    * each query probes only its `nprobe` closest buckets, pruning the scan
    * to ~nprobe/nlist of the corpus. On clustered corpora recall is high;
    * on isotropic data it degrades gracefully to the coverage fraction
    * (property-tested).
    */
  def knnIvf(embeddings: DataFrame, nlist: Int = 4, nprobe: Int = 2): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val centroids = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("c_label"), col("embedding").as("centroid"))

    // assign every vector to its nearest centroid (exact arg-max over few centroids)
    val assigned = e.join(broadcast(centroids), expr("true"))
      .select(col("vec_id"), col("embedding"), col("c_label"),
        cosine(col("embedding"), col("centroid")).as("c_sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("c_sim").desc, col("c_label"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_label").as("bucket"))
      .persist() // consumed twice: query extraction + probe scan

    // queries probe their nprobe nearest buckets
    val queries = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val probes = queries.join(broadcast(centroids), expr("true"))
      .select(col("query_id"), col("q"), col("c_label"),
        cosine(col("q"), col("centroid")).as("c_sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("c_sim").desc, col("c_label"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q"), col("c_label").as("bucket"))

    probes
      .join(assigned, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q"), col("embedding")).as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * Brute-force at verify scale; the LSH/IVF bucketing above is the
    * pruning path at corpus scale.
    */
  def dedupEmbedding(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val e = withNorm(embeddings)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  val dedupEmbeddingSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings
       |)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       list_cosine_similarity(a.emb, b.emb) AS cos_sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.45
       |ORDER BY id_a, id_b""".stripMargin
}
