package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-salting for shuffle joins — the remedy
  * [[Profile.keySkew]]'s audit prescribes when one join key carries a
  * disproportionate share of the fact side and the dimension side is too
  * big to broadcast: AQE's skew-join split only rebalances SORT-MERGE
  * partitions after the fact; salting fixes the partitioning itself, and
  * works for any join the optimizer picks.
  *
  * Mechanics: every fact row gets a salt in [0, salts) derived from a
  * deterministic hash of the whole row (same input → same plan → same
  * result; a hot key's rows spread across `salts` partitions), and the
  * dimension side is exploded to one copy per salt value. The join key
  * becomes (key, salt), so the shuffle distributes a hot key `salts` ways
  * at the price of a `salts`× dimension replication — the standard trade;
  * keep the dimension narrow.
  *
  * The result is EXACTLY the plain inner join's multiset (salting touches
  * partitioning only), which is what the oracle checks.
  */
object SaltedJoin {

  /** Inner-join `fact` with `dim` on `key`, salted `salts` ways. Output
    * columns: the join key, then fact columns, then dim columns (minus the
    * key), exactly as `fact.join(dim, key)` would produce. */
  def join(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 2, s"salting needs >= 2 partitions per key, got $salts")
    val factCols = fact.columns.toSeq
    val salted = fact.withColumn("_salt",
      pmod(hash(factCols.map(col): _*), lit(salts)))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
