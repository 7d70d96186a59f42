package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-device identity stitching — the identity-resolution step every
  * event-analytics deployment needs before user-level metrics are honest:
  * the same person shows up under several context ids (devices, browsers,
  * pre/post-login), and any identity KEY observed on two contexts (a device
  * id, a hashed email, a payment token) proves they are one entity. Events
  * then re-key onto the stitched identity, and entity-grain metrics (DAU,
  * retention, funnels) stop double-counting.
  *
  * The reference has no identity surface (its `context_id` IS the entity,
  * `reference/src/engine/core/read/query_plan.rs` keys replay/sequence on
  * it directly); this is the standard warehouse ID-graph layered on the
  * same event model.
  *
  * Scale shape — the part that matters at 100 TB:
  *   - Edges are STAR edges per key value, never pairwise: each (key, ctx)
  *     observation links ctx to the key's MIN context, so a hot key shared
  *     by a million contexts (a corporate proxy device, an empty-string
  *     email that slipped validation) costs one groupBy-min plus a
  *     co-partitioned join-back — O(observations) edges, never the
  *     O(cohabitants²) pair explosion. Star edges are CC-equivalent to the
  *     full pairwise clique (every member connects to the same hub).
  *   - Components come from [[Clustering.connectedComponents]] — the
  *     published alternating-star algorithm, O(log n) shuffle-only rounds,
  *     no driver graph state.
  *   - Per-identity stats are one bounded aggregation on the identity key;
  *     the per-context output joins two identity-keyed frames (both
  *     already hash-partitioned on the join key).
  */
object Identity {

  /** Build the undirected identity-edge set from co-observed keys: for each
    * key column, every distinct (key, ctx) observation yields the star edge
    * ctx ↔ min-ctx-of-key. Null/empty keys are dropped (an absent device id
    * proves nothing). Output: `(id_1, id_2)` with id_1 != id_2. */
  def identityEdges(events: DataFrame, ctxCol: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "identityEdges needs at least one key column")
    keyCols.map { k =>
      val kc = events
        .filter(col(k).isNotNull && col(k).cast("string") =!= "")
        .select(col(k).cast("string").as("_k"),
          col(ctxCol).cast("long").as("_c"))
        .distinct()
      val hubs = kc.groupBy("_k").agg(min(col("_c")).as("_hub"))
      kc.join(hubs, "_k")
        .filter(col("_c") =!= col("_hub"))
        .select(col("_c").as("id_1"), col("_hub").as("id_2"))
    }.reduce(_ union _)
  }

  /** Stitch contexts into identities and report, per context: its stitched
    * `identity_id` (the component's min context id), the identity's member
    * count, and the identity's total event count.
    *
    * @param events  event rows carrying the context and the key columns
    * @param ctxCol  long-castable context id column
    * @param keyCols identity-key columns (device id, email hash, ...)
    * @param checkpointDir reliable scratch dir for the CC rounds (see
    *                      [[Clustering.connectedComponents]])
    * Output: `(context_id, n_events, identity_id, n_members,
    * identity_events)` — one row per distinct context. */
  def stitch(events: DataFrame, ctxCol: String, keyCols: Seq[String],
      checkpointDir: Option[String] = None): DataFrame = {
    val perCtx = events.groupBy(col(ctxCol).cast("long").as("_ctx"))
      .agg(count(lit(1)).as("n_events"))
    val labels = Clustering.connectedComponents(
      identityEdges(events, ctxCol, keyCols),
      checkpointDir = checkpointDir)
    val labeled = perCtx
      .join(labels.withColumnRenamed("id", "_ctx"), Seq("_ctx"), "left")
      .select(col("_ctx"), col("n_events"),
        coalesce(col("cluster_id"), col("_ctx")).as("identity_id"))
    val perIdentity = labeled.groupBy("identity_id")
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_events")).as("identity_events"))
    labeled.join(perIdentity, "identity_id")
      .select(col("_ctx").cast("string").as("context_id"), col("n_events"),
        col("identity_id"), col("n_members"), col("identity_events"))
  }

  /** Re-key events onto their stitched identity: the input frame plus an
    * `identity_id` column (contexts never seen in an edge keep themselves).
    * One hash(ctx) join against the (distinct-context-sized) label table —
    * downstream entity-grain operators group on `identity_id` instead of
    * the raw context. */
  def rekey(events: DataFrame, ctxCol: String, keyCols: Seq[String],
      checkpointDir: Option[String] = None): DataFrame = {
    val labels = Clustering.connectedComponents(
      identityEdges(events, ctxCol, keyCols),
      checkpointDir = checkpointDir)
      .select(col("id").as("_lid"), col("cluster_id"))
    events
      .join(labels, col(ctxCol).cast("long") === col("_lid"), "left")
      .withColumn("identity_id",
        coalesce(col("cluster_id"), col(ctxCol).cast("long")))
      .drop("_lid", "cluster_id")
  }
}
