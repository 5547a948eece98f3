package graft.core

/** Temp-column hygiene for operators that need intermediate columns.
  *
  * The reference's transformers write into fresh dict keys, so they can
  * never collide with user data; DataFrame operators share one flat
  * namespace, so an operator that hardcodes an intermediate name (`tok`,
  * `__norm`, …) would clobber or ambiguate a user column of the same
  * name. Every graft operator routes its intermediates through
  * [[Cols.fresh]] instead.
  */
object Cols {

  /** A name based on `base` that does not occur in `existing`: `base`
    * itself when free, else `base__2`, `base__3`, … (deterministic, no
    * randomness — plans stay stable across runs).
    */
  def fresh(base: String, existing: Iterable[String]): String = {
    val taken = existing.toSet
    if (!taken(base)) base
    else Iterator.from(2).map(i => s"${base}__$i").find(!taken(_)).get
  }
}
